package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Paged HTTP JSON API source — SURVEY.md §2.1 S4/S5, the reference's
  * arXiv / Semantic Scholar scrapers (`arxiv_scraper.py:6-38`,
  * `semantic_scholar_scraper.py:7-24`): fetch page → extract the record
  * array → advance an offset until the API runs dry, pacing between
  * calls and retrying transient failures.
  *
  * Design notes:
  *  - API ingestion is DRIVER-BOUND by nature (rate-limited endpoints,
  *    sequential pagination), exactly like the reference's
  *    single-threaded scrapers — so pages fetch on the driver and land
  *    in a normal DataFrame via `spark.createDataset` +
  *    `spark.read.schema(...).json`. The distributed part of the
  *    pipeline starts at the returned DataFrame; record shape then
  *    flows through P1 alignment like any other source.
  *  - Schema is ALWAYS explicit (the Jsonl contract — no inference).
  *  - Fetching goes through [[Fetcher]], so specs run hermetically
  *    against a local HTTP stub and a production caller can inject
  *    auth/headers. [[HttpFetcher]] is the JDK-only default; retry and
  *    pacing reuse the Enrich wrappers' policy shape (bounded attempts,
  *    multiplicative backoff through an injectable sleep).
  */
object HttpJson {

  /** URL → body. Implementations must throw on non-2xx. */
  trait Fetcher extends Serializable {
    def fetch(url: String): String
  }

  /** JDK `java.net.http` GET with timeouts; non-2xx → IOException. */
  final class HttpFetcher(timeoutMs: Long = 30000,
                          headers: Map[String, String] = Map.empty)
    extends Fetcher {
    @transient private lazy val http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      .build()
    def fetch(url: String): String = {
      val builder = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .GET()
      headers.foreach { case (k, v) => builder.header(k, v) }
      val resp = http.send(builder.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"HTTP ${resp.statusCode()} for $url: ${resp.body().take(200)}")
      resp.body()
    }
  }

  /** Fetch one URL with bounded retries and multiplicative backoff
    * (the reference's retry loop, enhance_fields_of_study.py:120-152).
    * `sleep` is injectable so specs observe pacing without waiting.
    */
  def fetchWithRetry(fetcher: Fetcher, url: String, maxRetries: Int = 3,
                     backoffMs: Long = 100,
                     sleep: Long => Unit = Thread.sleep): String = {
    var attempt = 0
    while (true) {
      try return fetcher.fetch(url)
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt > maxRetries) throw e
          sleep(backoffMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Page through `urlFor(offset)` starting at 0, extracting the record
    * array at JSON Pointer `recordsPtr` from each page body, until a
    * page yields no records or `maxPages` is hit; each record lands as
    * one canonical JSON string, parsed into a DataFrame with the
    * EXPLICIT `schema`. `pauseMs` sleeps between page fetches (API
    * politeness — arxiv_scraper.py:33 sleeps 3 s); retries per page via
    * [[fetchWithRetry]].
    *
    * The offset passed to `urlFor` is the number of records already
    * consumed, so both page-number APIs (`offset / pageSize`) and
    * record-offset APIs (S2's `&offset=`) express naturally.
    */
  def readPaged(spark: SparkSession, urlFor: Long => String,
                schema: StructType, recordsPtr: String = "/data",
                maxPages: Int = 100, maxRetries: Int = 3,
                pauseMs: Long = 0, fetcher: Fetcher = new HttpFetcher(),
                sleep: Long => Unit = Thread.sleep): DataFrame = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val records = scala.collection.mutable.ArrayBuffer.empty[String]
    var page = 0
    var offset = 0L
    var dry = false
    while (!dry && page < maxPages) {
      if (page > 0 && pauseMs > 0) sleep(pauseMs)
      val body = fetchWithRetry(fetcher, urlFor(offset),
        maxRetries, sleep = sleep)
      val arr = mapper.readTree(body).at(recordsPtr)
      if (!arr.isArray || arr.isEmpty) dry = true
      else {
        val it = arr.elements()
        while (it.hasNext) records += mapper.writeValueAsString(it.next())
        offset += arr.size()
        page += 1
      }
    }
    import spark.implicits._
    spark.read.schema(schema).json(spark.createDataset(records.toSeq))
  }
}
