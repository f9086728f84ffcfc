package graft

import graft.operators.Embed
import org.apache.spark.sql.functions._

/** Batch recorder shared across the JVM: tasks serialize their client,
  * so per-instance state would stay on the executor-side copy — a
  * static sink is what the driver can observe in local mode.
  */
object EmbedSpecState {
  val batches = new java.util.concurrent.CopyOnWriteArrayList[Int]()
}

/** Counting client: records every batch it receives (top-level — an
  * inner class would drag the non-serializable suite into the task).
  */
class CountingEmbedClient(dim: Int) extends Embed.EmbeddingClient {
  private val inner = new Embed.MockHashEmbeddingClient(dim)
  def embed(texts: Seq[String]): Seq[Array[Float]] = {
    EmbedSpecState.batches.add(texts.length)
    inner.embed(texts)
  }
}

class EmbedSpec extends SparkSpec {
  import spark.implicits._

  test("embedColumn appends array<float>, deterministic, schema intact") {
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")).toDF("id", "text")
    val out = Embed.embedColumn(docs, $"text", "emb",
      new Embed.MockHashEmbeddingClient(4))
    assert(out.schema.fieldNames.toSeq == Seq("id", "text", "emb"))
    assert(out.schema("emb").dataType.simpleString == "array<float>")
    val got = rows(out.orderBy($"id")).map(_.getSeq[Float](2))
    assert(got(0) == got(2)) // same text → same vector
    assert(got(0) != got(1))
    assert(got.forall(v => v.length == 4 && v.forall(x => x >= 0f && x < 1f)))
  }

  test("one client call per batch; batch sizes honor the boundary") {
    val docs = spark.range(10).select($"id",
      concat(lit("doc "), $"id").as("text")).coalesce(1)
    EmbedSpecState.batches.clear()
    Embed.embedColumn(docs, $"text", "emb",
      new CountingEmbedClient(4), batchSize = 4).count()
    // 10 rows in one partition at batch 4 → calls of 4, 4, 2
    assert(EmbedSpecState.batches.toArray.toSeq == Seq(4, 4, 2))
  }

  test("null texts pass through with null vectors and never reach the client") {
    val docs = Seq((1L, "alpha"), (2L, null: String), (3L, "beta"))
      .toDF("id", "text").coalesce(1)
    EmbedSpecState.batches.clear()
    val got = rows(Embed.embedColumn(docs, $"text", "emb",
      new CountingEmbedClient(4), batchSize = 8).orderBy($"id"))
    assert(!got(0).isNullAt(2) && got(1).isNullAt(2) && !got(2).isNullAt(2))
    assert(EmbedSpecState.batches.toArray.toSeq == Seq(2)) // only real texts
  }

  test("a client returning the wrong count fails loudly") {
    val bad = new Embed.EmbeddingClient {
      def embed(texts: Seq[String]): Seq[Array[Float]] =
        texts.drop(1).map(_ => Array(0f))
    }
    val docs = Seq((1L, "a"), (2L, "b")).toDF("id", "text").coalesce(1)
    val e = intercept[org.apache.spark.SparkException](
      Embed.embedColumn(docs, $"text", "emb", bad).count())
    assert(e.getMessage.contains("vectors") ||
      Option(e.getCause).exists(_.getMessage.contains("vectors")))
  }

  test("ThrottledEmbeddingClient retries transient failures, then succeeds") {
    val flaky = new Embed.EmbeddingClient {
      val calls = new java.util.concurrent.atomic.AtomicInteger(0)
      def embed(texts: Seq[String]): Seq[Array[Float]] =
        if (calls.incrementAndGet() < 3) throw new java.io.IOException("429")
        else texts.map(_ => Array(1f, 2f))
    }
    val c = new Embed.ThrottledEmbeddingClient(flaky, delayMs = 1, maxRetries = 3)
    assert(c.embed(Seq("x")).head.toSeq == Seq(1f, 2f))
  }

  test("mock embedding feeds the existing cosine top-k path (v12 shape)") {
    val docs = Seq((0L, "query text"), (5L, "query text"), (6L, "other"))
      .toDF("doc_id", "text")
    val emb = Embed.embedColumn(docs, $"text", "emb",
      new Embed.MockHashEmbeddingClient(8))
    val q = emb.filter($"doc_id" < 5).select($"doc_id".as("qid"), $"emb".as("qv"))
    val top = rows(graft.operators.Similarity.topKPerQuery(
      emb.filter($"doc_id" >= 5), $"doc_id", $"emb", q, $"qid", $"qv", k = 2))
    // identical text must rank first with cosine exactly 1
    assert(top.head.getLong(1) == 5L)
    assert(math.abs(top.head.getDouble(2) - 1.0) < 1e-9)
  }

  // ---- HttpEmbeddingClient against a hermetic in-process HTTP stub ----

  private def withHttpStub(
      handler: com.sun.net.httpserver.HttpExchange => Unit)(
      f: String => Unit): Unit = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/v1/embeddings", ex => try handler(ex) finally ex.close())
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}/v1/embeddings")
    finally srv.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
                      status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  test("HttpEmbeddingClient sends ONE request per batch and parses vectors") {
    @volatile var seenBody = ""
    @volatile var seenAuth = ""
    @volatile var calls = 0
    withHttpStub { ex =>
      calls += 1
      seenBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      seenAuth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      respond(ex, 200,
        """{"data":[{"embedding":[1.0,2.0]},{"embedding":[3.0,4.0]}]}""")
    } { url =>
      val c = new Embed.HttpEmbeddingClient(url, apiKey = "sk-e", model = "emb0")
      val vs = c.embed(Seq("first \"quoted\"", "second\nline"))
      assert(calls == 1)
      assert(vs.map(_.toSeq) == Seq(Seq(1f, 2f), Seq(3f, 4f)))
      assert(seenAuth == "Bearer sk-e")
      assert(seenBody.contains(""""model":"emb0""""))
      assert(seenBody.contains("""first \"quoted\""""))
      assert(seenBody.contains("""second\nline"""))
    }
  }

  test("HttpEmbeddingClient throws on non-2xx and on missing vectors") {
    withHttpStub { ex => respond(ex, 503, """{"error":"overloaded"}""") } { url =>
      val e = intercept[java.io.IOException](
        new Embed.HttpEmbeddingClient(url).embed(Seq("x")))
      assert(e.getMessage.contains("503"))
    }
    // one vector for two inputs: the second lookup must fail loudly
    withHttpStub { ex =>
      respond(ex, 200, """{"data":[{"embedding":[1.0]}]}""")
    } { url =>
      val e = intercept[java.io.IOException](
        new Embed.HttpEmbeddingClient(url).embed(Seq("a", "b")))
      assert(e.getMessage.contains("/data/1/embedding"))
    }
  }
}
