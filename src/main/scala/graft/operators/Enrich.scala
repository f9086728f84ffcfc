package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, MapType, StringType, StructType}
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/** LLM-enrichment harness — SURVEY.md §2.6 L1–L6. The reference's four
  * enrichment operators share one shape (enhance_fields_of_study.py,
  * enhance_keywords.py, enhance_scoring.py, enhance_optional_summary.py):
  * prompt-build → rate-limited external call with retry/backoff →
  * parse/validate/clamp → append column, with checkpoint/resume.
  *
  * Spark-first mapping (SURVEY.md §4.2): the external call runs inside
  * `mapPartitions` behind an injectable [[LlmClient]] — batched per
  * partition, throttled per executor, NEVER a row-at-a-time driver loop.
  * Parse/validate/clamp stay pure column expressions (codegen'd), so only
  * the opaque network step lives outside Catalyst. Resume is the P5
  * checkpoint anti-join (enhance_fields_of_study.py:347-356).
  *
  * At 100 TB: partitions bound the concurrency fan-out (reference used
  * 5–12 worker threads; here it's #partitions × per-partition batching),
  * checkpoints are idempotent partition-level sinks, and a re-run only
  * pays for rows the checkpoint doesn't cover.
  */
object Enrich {

  /** Minimal completion-client contract (reference API core:
    * enhance_fields_of_study.py:67-152). Implementations must be
    * serializable — they ship to executors.
    */
  trait LlmClient extends Serializable {
    def complete(prompt: String): String
  }

  /** Deterministic fake "LLM" for hermetic tests and oracles: echoes the
    * first `maxTokens` whitespace tokens of the prompt tail (after the
    * last ": ") that are longer than 3 chars, comma-joined — a stand-in
    * for keyword extraction (enhance_keywords.py:165-280).
    */
  final class MockKeywordClient(maxTokens: Int = 12) extends LlmClient {
    def complete(prompt: String): String = {
      val payload = prompt.split(": ", 2).last
      payload.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        .filter(_.length > 3)
        .take(maxTokens).mkString(",")
    }
  }

  /** Deterministic fake scoring "LLM": md5 hex of the prompt — callers
    * derive pseudo-scores from hex digits (enhance_scoring.py's shape
    * with an engine-independent source of randomness).
    */
  final class MockScoreClient extends LlmClient {
    def complete(prompt: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(prompt.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
  }

  /** Deterministic fake fields-of-study "LLM": answers in one of three
    * shapes keyed by md5 of the payload — a strict JSON array, a chatty
    * reply with quoted fields, and bare comma-separated text — so every
    * branch of [[validateFields]] (strict parse, quoted-string rescue,
    * word-run rescue) is exercised.
    * Response shapes mirror enhance_fields_of_study.py:188-221.
    */
  final class MockFieldsClient extends LlmClient {
    def complete(prompt: String): String = {
      val payload = prompt.split(": ", 2).last
      val toks = payload.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        .filter(_.length > 3)
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(payload.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 1), 16) % 3 match {
        case 0 => toks.take(8).map(t => "\"" + t + "\"")
          .mkString("[", ", ", "]")
        case 1 => "Sure! The fields are: " +
          toks.take(5).map(t => "\"" + t + "\"").mkString(", ") +
          ". Hope this helps."
        case _ => toks.take(5).mkString(", ") + "."
      }
    }
  }

  /** Deterministic fake judge "LLM" for L5: six 0-5 dimension scores
    * from md5 hex digits of the payload, answered as clean JSON, JSON
    * buried in chatter with keys missing, or no JSON at all — the three
    * response classes deepseek_scoring.py:222-259 handles.
    */
  final class MockJudgeClient extends LlmClient {
    def complete(prompt: String): String = {
      val payload = prompt.split(": ", 2).last
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(payload.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      def d(i: Int) = Integer.parseInt(hex.substring(i, i + 1), 16) % 6
      val vals = (0 until 6).map(d)
      Integer.parseInt(hex.substring(6, 7), 16) % 3 match {
        case 0 => judgeDimensions.zip(vals)
          .map { case (k, v) => s""""$k": $v""" }
          .mkString("{", ", ", s""", "overall_score": ${vals.sum}}""")
        case 1 => "Sure, here are the scores: " +
          s"""{"metadata_completeness": ${vals(0)}, """ +
          s""""semantic_clarity": ${vals(4)}, """ +
          s""""overall_score": ${vals(0) + vals(4)}} hope that helps"""
        case _ => "I cannot score this paper."
      }
    }
  }

  /** Wraps a client with retry/backoff (reference: retry loops at
    * enhance_fields_of_study.py:120-152) and a fixed inter-call delay
    * (the reference's rate_limited_request global pacing, simplified to
    * per-partition pacing — executors don't share a lock at scale).
    */
  final class ThrottledClient(inner: LlmClient, delayMs: Long = 0,
                              maxRetries: Int = 3) extends LlmClient {
    def complete(prompt: String): String = {
      var attempt = 0
      while (true) {
        try {
          if (delayMs > 0) Thread.sleep(delayMs)
          return inner.complete(prompt)
        } catch {
          case e: Exception =>
            attempt += 1
            if (attempt > maxRetries) throw e
            Thread.sleep(delayMs * attempt)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Thin JDK-only HTTP implementation of [[LlmClient]] — the live path
    * the reference runs (enhance_fields_of_study.py:67-152 POSTs a chat
    * request and reads `choices[0].message.content`). POSTs an
    * OpenAI-style JSON body to `endpoint` (bearer-authed when `apiKey`
    * is non-empty), bounded by per-request connect+response timeouts;
    * non-2xx status or a missing content field throws IOException, so
    * the existing [[ThrottledClient]]/[[AdaptiveThrottledClient]]
    * wrappers own retry/backoff policy — compose as
    * `new AdaptiveThrottledClient(new HttpLlmClient(...), limiter)`.
    *
    * `contentPath` is a JSON Pointer to the reply text, so non-OpenAI
    * response shapes need no code change. The HTTP client and JSON
    * mapper are transient-lazy: instances serialize to executors as
    * config only and each executor builds its own connections.
    */
  final class HttpLlmClient(
      endpoint: String,
      apiKey: String = "",
      model: String = "default",
      timeoutMs: Long = 30000,
      contentPath: String = "/choices/0/message/content") extends LlmClient {

    @transient private lazy val http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      .build()
    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()

    private def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    def complete(prompt: String): String = {
      val body = s"""{"model":"${esc(model)}","messages":[""" +
        s"""{"role":"user","content":"${esc(prompt)}"}]}"""
      val builder = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers
          .ofString(body, java.nio.charset.StandardCharsets.UTF_8))
      if (apiKey.nonEmpty) builder.header("Authorization", s"Bearer $apiKey")
      val resp = http.send(builder.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      val node = mapper.readTree(resp.body()).at(contentPath)
      if (node.isMissingNode || node.isNull)
        throw new java.io.IOException(s"no $contentPath in response body")
      node.asText()
    }
  }

  /** Core harness: evaluate `prompt` per row, call the client inside
    * mapPartitions in batches of `batchSize`, append the raw response as
    * `outCol` (string). Downstream validation/parsing stays declarative.
    */
  def enrichColumn(df: DataFrame, prompt: Column, outCol: String,
                   client: LlmClient, batchSize: Int = 16): DataFrame = {
    val withPrompt = df.withColumn("__prompt", prompt)
    val outSchema = StructType(withPrompt.schema.fields :+
      org.apache.spark.sql.types.StructField(outCol, StringType))
    val enriched = withPrompt.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch boundary = the unit an async/bulk client would send.
        batch.map { r =>
          val resp = client.complete(r.getAs[String]("__prompt"))
          Row.fromSeq(r.toSeq :+ resp)
        }
      }
    }(Encoders.row(outSchema))
    enriched.drop("__prompt")
  }

  /** L1 — fields-of-study validation with JSON-rescue fallback. A
    * response that parses as a JSON array keeps trimmed non-empty string
    * items shorter than 100 chars; a non-JSON response falls back to
    * quoted-string extraction, then to word-run extraction
    * (`([\w\s]+)(?:,|\.|$)` — the reference's lookahead rewritten
    * RE2-compatibly so the oracle can share it), items trimmed and kept
    * at 3 < len < 50, first-occurrence deduped. Both paths cap at 6.
    * The reference dedups via Python set() (nondeterministic order);
    * first-occurrence order is pinned here.
    * Ref: enhance_fields_of_study.py:188-221, enhance_scoring.py:296-340.
    */
  def validateFields(raw: Column): Column = {
    val parsed = from_json(raw, ArrayType(StringType))
    val happy = slice(
      filter(transform(parsed, x => trim(x)),
        x => x.isNotNull && x =!= "" && length(x) < 100), 1, 6)
    val quoted = regexp_extract_all(raw, lit("\"([^\"]+)\""), lit(1))
    val runs = regexp_extract_all(raw, lit("([\\w\\s]+)(?:,|\\.|$)"), lit(1))
    val cand = when(size(quoted) > 0, quoted).otherwise(runs)
    val rescued = slice(
      array_distinct(filter(transform(cand, x => trim(x)),
        x => length(x) > 3 && length(x) < 50)), 1, 6)
    when(parsed.isNotNull, happy).otherwise(rescued)
  }

  /** L2 keyword post-validation as pure columns: split, trim, drop
    * stop-list words and out-of-range lengths, order-preserving dedup,
    * cap at 8. Ref: enhance_keywords.py:227-233.
    */
  val keywordStopList: Seq[String] =
    Seq("model", "method", "framework", "approach", "system", "algorithm")

  def validateKeywords(raw: Column): Column = {
    val stop = array(keywordStopList.map(lit): _*)
    slice(
      array_distinct(filter(
        transform(split(raw, ","), x => trim(x)),
        x => x =!= "" && length(x) >= 3 && length(x) <= 50 &&
          !array_contains(stop, x))),
      1, 8)
  }

  /** L3 score validation: clamp ints to [0,10]; derived overall =
    * half-up(mean of the 4 dims, 1 decimal) when absent; confidence
    * defaults 0.5. Ref: enhance_scoring.py:74-117.
    */
  def validatedScores(novelty: Column, depth: Column, clarity: Column,
                      impact: Column): Column = {
    def cl(c: Column) = least(greatest(c, lit(0)), lit(10))
    val n = cl(novelty); val d = cl(depth); val c = cl(clarity); val i = cl(impact)
    val overall = floor((n + d + c + i).cast("double") / 4.0 * 10.0 + 0.5) / 10.0
    struct(n.as("novelty"), d.as("technical_depth"), c.as("clarity"),
      i.as("impact_potential"), overall.as("overall_score"),
      lit(0.5).as("confidence"))
  }

  /** L4 — contribution-summary validation, parameterized over the two
    * reference profiles:
    *  - optional-summary validator: strings trimmed + truncated at 500
    *    chars WITH ellipsis, items trimmed/compacted (no item cap),
    *    list capped at 10 (enhance_optional_summary.py:174-346);
    *  - fast validator: strings trimmed + hard-truncated at 300 (no
    *    ellipsis), items hard-truncated at 200, list capped at 8
    *    (enhance_summary.py:209-242).
    */
  def validatedSummaryWith(problem: Column, method: Column,
                           contributions: Column, scenarios: Column,
                           strCap: Int, ellipsis: Boolean,
                           itemCap: Option[Int], listCap: Int): Column = {
    def s(c: Column) =
      if (ellipsis) graft.functions.TextFunctions.truncateEllipsis(trim(c), strCap)
      else substring(trim(c), 1, strCap)
    // item emptiness is checked on the TRIMMED value; truncation of a
    // non-empty trimmed string can't make it empty, so filtering after
    // the cap matches the reference's pre-cap check.
    def l(c: Column) = slice(
      filter(transform(c,
        x => itemCap.fold(trim(x))(k => substring(trim(x), 1, k))),
        x => x =!= ""), 1, listCap)
    struct(
      s(problem).as("problem"),
      s(method).as("method"),
      l(contributions).as("key_contributions"),
      l(scenarios).as("application_scenarios"))
  }

  /** Optional-summary L4 profile (500/ellipsis/no item cap/10). */
  def validatedSummary(problem: Column, method: Column,
                       contributions: Column, scenarios: Column): Column =
    validatedSummaryWith(problem, method, contributions, scenarios,
      strCap = 500, ellipsis = true, itemCap = None, listCap = 10)

  /** Fast L4 profile (300 plain/200-char items/8). */
  def validatedSummaryFast(problem: Column, method: Column,
                           contributions: Column, scenarios: Column): Column =
    validatedSummaryWith(problem, method, contributions, scenarios,
      strCap = 300, ellipsis = false, itemCap = Some(200), listCap = 8)

  /** P5 — checkpoint/resume anti-join: rows of `df` whose `idCol` is not
    * in `done`. Ref: enhance_fields_of_study.py:347-356.
    */
  def resumeFilter(df: DataFrame, done: DataFrame, idCol: String): DataFrame =
    df.join(done.select(idCol).distinct(), Seq(idCol), "left_anti")

  /** The judge's six 0-5 scoring dimensions (deepseek_scoring.py:239-247). */
  val judgeDimensions: Seq[String] = Seq(
    "metadata_completeness", "text_cleanliness", "technical_specificity",
    "domain_relevance", "semantic_clarity", "downstream_usability")

  /** L5 — judge-score normalization: extract the first `{...}` span from
    * a possibly-noisy response (the reference's DOTALL rescue), parse,
    * default every missing key to 0, and derive
    * `overall_score_normalized = round(overall/30*10, 2)` — half-up on
    * the exact double (repo rounding convention; the reference uses
    * Python banker's round). No JSON at all ⇒ the all-zero error scores
    * of deepseek_scoring.py:318-325.
    * Ref: deepseek_scoring.py:222-259.
    */
  def normalizedJudgeScores(raw: Column): Column = {
    val json = regexp_extract(raw, "(?s)\\{.*\\}", 0)
    val m = from_json(json, MapType(StringType, DoubleType))
    def k(name: String) = coalesce(element_at(m, lit(name)), lit(0.0))
    val overall = k("overall_score")
    val norm = floor(overall / 30.0 * 10.0 * 100.0 + 0.5) / 100.0
    struct(
      judgeDimensions.map(n => k(n).as(n)) ++ Seq(
        overall.as("overall_score"),
        norm.as("overall_score_normalized")): _*)
  }

  /** L6 — adaptive rate limiter (enhance_summary.py:50-111): delay
    * shrinks ×0.9 when ≥10 calls are recorded and the last 10 were
    * >90% successful, grows ×1.5 (capped at `maxDelayMs`) on failure;
    * `delayMs` adds jitter of `jitter() × currentDelay` floored at
    * `minDelayMs`. The jitter source is injected (reference:
    * `random.uniform(-0.05, 0.05)`) so specs pin the trajectory.
    */
  final class AdaptiveRateLimiter(
      val minDelayMs: Double, val maxDelayMs: Double,
      jitter: () => Double = () =>
        (scala.util.Random.nextDouble() - 0.5) * 0.1) extends Serializable {
    private var currentDelay = minDelayMs
    private val window = scala.collection.mutable.Queue.empty[Boolean]
    def success(): Unit = synchronized {
      window.enqueue(true)
      if (window.size > 50) window.dequeue()
      val last10 = window.takeRight(10)
      if (window.size >= 10 && last10.count(identity) / 10.0 > 0.9 &&
        currentDelay > minDelayMs)
        currentDelay = math.max(minDelayMs, currentDelay * 0.9)
    }
    def failure(): Unit = synchronized {
      window.enqueue(false)
      if (window.size > 50) window.dequeue()
      currentDelay = math.min(maxDelayMs, currentDelay * 1.5)
    }
    def delayMs: Double = synchronized {
      math.max(minDelayMs, currentDelay + jitter() * currentDelay)
    }
  }

  /** [[ThrottledClient]] variant driven by an [[AdaptiveRateLimiter]];
    * the sleep is injectable so specs observe pacing without waiting.
    */
  final class AdaptiveThrottledClient(
      inner: LlmClient, limiter: AdaptiveRateLimiter, maxRetries: Int = 3,
      sleep: Long => Unit = Thread.sleep) extends LlmClient {
    def complete(prompt: String): String = {
      var attempt = 0
      while (true) {
        sleep(limiter.delayMs.toLong)
        try {
          val r = inner.complete(prompt)
          limiter.success()
          return r
        } catch {
          case e: Exception =>
            limiter.failure()
            attempt += 1
            if (attempt > maxRetries) throw e
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }
}
