package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/** Embedding-inference harness — the vector twin of [[Enrich]]'s LLM
  * text path (reference: rag.ipynb:359-374 encodes passages through a
  * sentence-transformer in batches of 32). The model call is external
  * orchestration behind an injectable [[Embed.EmbeddingClient]]; the
  * engine owns the distribution shape: batched `mapPartitions`, one
  * client call per batch (NOT per row — remote embedding endpoints are
  * priced and latency-bound per request), null passthrough, and an
  * `array<float>` column that drops straight into the existing
  * store-build / top-k / IVF paths (v9/v1/v7).
  *
  * At 100 TB: partitions bound the inference fan-out exactly as in
  * [[Enrich.enrichColumn]]; each partition issues ⌈rows/batchSize⌉
  * requests. Resume-on-failure composes with the P5 checkpoint
  * anti-join upstream, and the output feeds [[Similarity]] without a
  * further shuffle.
  */
object Embed {

  /** Batch embedding contract. Implementations must be serializable —
    * they ship to executors. Must return exactly one vector per input
    * text, in input order.
    */
  trait EmbeddingClient extends Serializable {
    def embed(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Deterministic fake encoder for hermetic tests and oracles:
    * component i of dim `dim` is the 28-bit md5 hash of "i:text" scaled
    * to [0, 1) — the [[Sampling.keyHash]] construction per dimension, so
    * the DuckDB oracle replays every component bit-for-bit (double
    * divide, then one float rounding; see the v12 oracle twin).
    */
  final class MockHashEmbeddingClient(dim: Int) extends EmbeddingClient {
    def embed(texts: Seq[String]): Seq[Array[Float]] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      texts.map { t =>
        Array.tabulate(dim) { i =>
          md.reset()
          val d = md.digest(s"$i:$t".getBytes("UTF-8"))
          val h28 = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
            ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
          (h28 / (1L << 28).toDouble).toFloat
        }
      }
    }
  }

  /** Retry/backoff wrapper, the [[Enrich.ThrottledClient]] shape at
    * batch granularity: a failed batch retries whole (embedding
    * endpoints are stateless), with linear backoff and an optional
    * fixed inter-batch delay for rate-limited providers.
    */
  final class ThrottledEmbeddingClient(inner: EmbeddingClient,
                                       delayMs: Long = 0,
                                       maxRetries: Int = 3)
    extends EmbeddingClient {
    def embed(texts: Seq[String]): Seq[Array[Float]] = {
      var attempt = 0
      while (true) {
        try {
          if (delayMs > 0) Thread.sleep(delayMs)
          return inner.embed(texts)
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

  /** JDK-only HTTP implementation — the live path, OpenAI-embeddings
    * wire shape: POST `{"model": …, "input": [texts…]}`, read
    * `/data/<i>/embedding` float arrays (the JSON Pointer prefix is
    * configurable for other providers). One request per BATCH — the
    * entire point of the batch contract. Non-2xx, a missing vector, or
    * a count mismatch throw IOException; compose retry policy with
    * [[ThrottledEmbeddingClient]]. HTTP client and mapper are
    * transient-lazy so instances serialize as config only.
    */
  final class HttpEmbeddingClient(
      endpoint: String,
      apiKey: String = "",
      model: String = "default",
      timeoutMs: Long = 30000,
      itemPath: String = "/data") extends EmbeddingClient {

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

    def embed(texts: Seq[String]): Seq[Array[Float]] = {
      val body = texts.map(t => "\"" + esc(t) + "\"")
        .mkString(s"""{"model":"${esc(model)}","input":[""", ",", "]}")
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
      val root = mapper.readTree(resp.body())
      texts.indices.map { i =>
        val node = root.at(s"$itemPath/$i/embedding")
        if (!node.isArray)
          throw new java.io.IOException(s"no $itemPath/$i/embedding in response")
        val out = new Array[Float](node.size())
        var j = 0
        while (j < out.length) { out(j) = node.get(j).floatValue(); j += 1 }
        out
      }
    }
  }

  /** Core harness: evaluate `text` per row, embed inside mapPartitions
    * with ONE client call per `batchSize` rows, append the vector as
    * `outCol` (`array<float>`). Null texts pass through with a null
    * vector and never reach the client — a batch's request carries only
    * its real texts.
    */
  def embedColumn(df: DataFrame, text: Column, outCol: String,
                  client: EmbeddingClient, batchSize: Int = 32): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val withText = df.withColumn("__embed_text", text)
    val outSchema = StructType(withText.schema.fields :+
      StructField(outCol, ArrayType(FloatType)))
    val embedded = withText.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val texts = batch.collect {
          case r if !r.isNullAt(r.fieldIndex("__embed_text")) =>
            r.getAs[String]("__embed_text")
        }
        val vecs = if (texts.isEmpty) Seq.empty else client.embed(texts)
        require(vecs.length == texts.length,
          s"client returned ${vecs.length} vectors for ${texts.length} texts")
        val it = vecs.iterator
        batch.map { r =>
          val v = if (r.isNullAt(r.fieldIndex("__embed_text"))) null
                  else it.next().toSeq
          Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(Encoders.row(outSchema))
    embedded.drop("__embed_text")
  }
}
