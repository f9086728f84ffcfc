package graft

import graft.operators.Enrich
import org.apache.spark.sql.functions._

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark streaming engine with stateful aggregation"),
    (2L, "tiny doc"),
    (3L, "a model method framework and durable quality pipelines")
  ).toDF("id", "text")

  test("enrichColumn appends the client response per row") {
    val out = Enrich.enrichColumn(docs,
      concat(lit("Extract keywords: "), $"text"), "kw",
      new Enrich.MockKeywordClient(12))
    val got = rows(out.orderBy($"id").select($"kw")).map(_.getString(0))
    assert(got.head == "spark,streaming,engine,with,stateful,aggregation")
    assert(got(1) == "tiny")
  }

  test("batch size does not change results") {
    val p = concat(lit("Extract keywords: "), $"text")
    val a = Enrich.enrichColumn(docs, p, "kw", new Enrich.MockKeywordClient(12), batchSize = 1)
    val b = Enrich.enrichColumn(docs, p, "kw", new Enrich.MockKeywordClient(12), batchSize = 100)
    assert(rows(a.orderBy($"id")) == rows(b.orderBy($"id")))
  }

  test("ThrottledClient retries a flaky client") {
    val flaky = new Enrich.LlmClient {
      @volatile private var calls = 0
      def complete(p: String): String = {
        calls += 1
        if (calls % 2 == 1) throw new RuntimeException("transient")
        s"ok:$p"
      }
    }
    val c = new Enrich.ThrottledClient(flaky, delayMs = 0, maxRetries = 3)
    assert(c.complete("x") == "ok:x")
  }

  test("validateKeywords trims, filters stop-list and lengths, dedups, caps at 8") {
    val raw = Seq("alpha, beta ,alpha,model,ab,gamma,delta,epsilon,zeta,eta,theta,iota,kappa")
      .toDF("r")
    val out = col0[String](raw.select(
      array_join(Enrich.validateKeywords($"r"), ",")))
    // alpha dedup'd, model stop-listed, ab too short, capped at 8
    assert(out.head == "alpha,beta,gamma,delta,epsilon,zeta,eta,theta")
  }

  test("validatedScores clamps to [0,10] and derives half-up overall") {
    val df = Seq((12, -3, 7, 8)).toDF("n", "d", "c", "i")
    val r = rows(df.select(Enrich.validatedScores($"n", $"d", $"c", $"i").as("s"))
      .select($"s.novelty", $"s.technical_depth", $"s.overall_score", $"s.confidence")).head
    assert(r.getInt(0) == 10 && r.getInt(1) == 0)
    assert(r.getDouble(2) == 6.3) // (10+0+7+8)/4 = 6.25 -> half-up 6.3
    assert(r.getDouble(3) == 0.5)
  }

  test("validatedSummary trims, truncates at 500 with ellipsis, caps lists at 10") {
    val df = Seq((
      "  " + "p" * 600, "a method",
      (1 to 15).map(i => s" c$i ") :+ "", Seq("  s1  "))
    ).toDF("p", "m", "c", "s")
    val r = rows(df.select(Enrich.validatedSummary($"p", $"m", $"c", $"s").as("v"))
      .select($"v.problem", $"v.method", $"v.key_contributions",
        $"v.application_scenarios")).head
    assert(r.getString(0).length == 503 && r.getString(0).endsWith("..."))
    assert(r.getString(1) == "a method")
    assert(r.getSeq[String](2) == (1 to 10).map(i => s"c$i"))
    assert(r.getSeq[String](3) == Seq("s1"))
  }

  test("AdaptiveRateLimiter: x1.5 capped on failure, x0.9 floored after hot streak") {
    val rl = new Enrich.AdaptiveRateLimiter(100.0, 1000.0, jitter = () => 0.0)
    assert(rl.delayMs == 100.0)
    rl.failure()                       // 100 * 1.5
    assert(rl.delayMs == 150.0)
    (1 to 10).foreach(_ => rl.failure())
    assert(rl.delayMs == 1000.0)       // capped at max
    // last-10 window must be >90% successful before the delay shrinks:
    // 9 successes after a failure leave the rate at 0.9 — no change.
    (1 to 9).foreach(_ => rl.success())
    assert(rl.delayMs == 1000.0)
    rl.success()                       // 10/10 -> * 0.9
    assert(rl.delayMs == 900.0)
    (1 to 200).foreach(_ => rl.success())
    assert(rl.delayMs == 100.0)        // floored at min
    // jitter scales with the current delay but never goes below min
    val jittery = new Enrich.AdaptiveRateLimiter(100.0, 1000.0, jitter = () => -0.05)
    jittery.failure()
    assert(jittery.delayMs == 150.0 - 0.05 * 150.0)
  }

  test("AdaptiveThrottledClient paces calls through the limiter and retries") {
    val rl = new Enrich.AdaptiveRateLimiter(10.0, 1000.0, jitter = () => 0.0)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val flaky = new Enrich.LlmClient {
      def complete(p: String): String = {
        calls += 1
        if (calls <= 2) throw new RuntimeException("boom")
        s"ok:$p"
      }
    }
    val c = new Enrich.AdaptiveThrottledClient(flaky, rl, maxRetries = 3,
      sleep = sleeps += _)
    assert(c.complete("x") == "ok:x")
    // two failures grow the delay x1.5 each: sleeps observed 10, 15, 22
    assert(sleeps.toSeq == Seq(10L, 15L, 22L))
    assert(rl.delayMs == 22.5)
  }

  test("validateFields: strict array parse, quoted rescue, word-run rescue") {
    val df = Seq(
      // strict JSON array: trim, drop empty/overlong, no dedup, cap 6
      ("""["  Machine Learning ", "", "NLP", "a", "NLP", "x", "y", "z", "w"]"""),
      // overlong item dropped on the happy path
      ("[\"" + "q" * 120 + "\", \"Vision\"]"),
      // quoted rescue: dedup + 3<len<50 filter
      ("""Sure! Fields: "Robotics", "ab", "Robotics", "Vision Systems"."""),
      // word-run rescue (no quotes anywhere)
      ("databases, systems theory, ml.")
    ).toDF("raw")
    val out = rows(df.select(Enrich.validateFields($"raw").as("f")))
      .map(_.getSeq[String](0))
    assert(out(0) == Seq("Machine Learning", "NLP", "a", "NLP", "x", "y"))
    assert(out(1) == Seq("Vision"))
    assert(out(2) == Seq("Robotics", "Vision Systems"))
    assert(out(3) == Seq("databases", "systems theory"))
  }

  test("resumeFilter processes only rows absent from the checkpoint") {
    val done = Seq(1L, 3L).toDF("id")
    val out = col0[Long](Enrich.resumeFilter(docs, done, "id").select($"id"))
    assert(out == Seq(2L))
  }

  // ---- HttpLlmClient against a hermetic in-process HTTP stub ----------

  /** Starts a localhost HttpServer answering `handler`, runs `f` against
    * its URL, always shuts the server down.
    */
  private def withHttpStub(
      handler: com.sun.net.httpserver.HttpExchange => Unit)(
      f: String => Unit): Unit = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/v1/chat", ex => try handler(ex) finally ex.close())
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}/v1/chat")
    finally srv.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
                      status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  test("HttpLlmClient posts the prompt, auths, and parses the content path") {
    @volatile var seenBody = ""
    @volatile var seenAuth = ""
    withHttpStub { ex =>
      seenBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      seenAuth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      respond(ex, 200,
        """{"choices":[{"message":{"content":"graph, attention"}}]}""")
    } { url =>
      val c = new Enrich.HttpLlmClient(url, apiKey = "sk-test", model = "m0")
      assert(c.complete("Extract: \"quoted\"\nline2") == "graph, attention")
      assert(seenAuth == "Bearer sk-test")
      // prompt JSON-escaped into the OpenAI-style body
      assert(seenBody.contains(""""model":"m0""""))
      assert(seenBody.contains("""Extract: \"quoted\"\nline2"""))
    }
  }

  test("HttpLlmClient throws on non-2xx and on a missing content field") {
    withHttpStub { ex => respond(ex, 500, """{"error":"overloaded"}""") } { url =>
      val c = new Enrich.HttpLlmClient(url)
      val e = intercept[java.io.IOException](c.complete("x"))
      assert(e.getMessage.contains("500"))
    }
    withHttpStub { ex => respond(ex, 200, """{"unexpected":"shape"}""") } { url =>
      val c = new Enrich.HttpLlmClient(url)
      val e = intercept[java.io.IOException](c.complete("x"))
      assert(e.getMessage.contains("/choices/0/message/content"))
    }
  }

  test("HttpLlmClient times out on a stalled server (bounded, not hung)") {
    withHttpStub { ex =>
      Thread.sleep(2000)
      respond(ex, 200, """{"choices":[{"message":{"content":"late"}}]}""")
    } { url =>
      val c = new Enrich.HttpLlmClient(url, timeoutMs = 200)
      intercept[java.io.IOException](c.complete("x"))
    }
  }

  test("HttpLlmClient retries through AdaptiveThrottledClient and recovers") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withHttpStub { ex =>
      if (calls.incrementAndGet() == 1) respond(ex, 503, "busy")
      else respond(ex, 200, """{"choices":[{"message":{"content":"ok"}}]}""")
    } { url =>
      val limiter = new Enrich.AdaptiveRateLimiter(10, 1000, jitter = () => 0.0)
      val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
      val c = new Enrich.AdaptiveThrottledClient(
        new Enrich.HttpLlmClient(url), limiter, maxRetries = 3,
        sleep = ms => slept += ms)
      assert(c.complete("x") == "ok")
      assert(calls.get() == 2)
      // failure grew the limiter delay x1.5 before the retry
      assert(slept.toSeq == Seq(10L, 15L))
    }
  }

  test("HttpLlmClient serializes into enrichColumn's executor path") {
    withHttpStub { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      // echo the last word of the prompt back as the content
      val word = body.split("\\s+").last.takeWhile(_.isLetter)
      respond(ex, 200,
        s"""{"choices":[{"message":{"content":"$word"}}]}""")
    } { url =>
      val out = Enrich.enrichColumn(docs,
        concat(lit("Summarize: "), $"text"), "resp",
        new Enrich.HttpLlmClient(url))
      val got = rows(out.orderBy($"id").select($"resp")).map(_.getString(0))
      assert(got == Seq("aggregation", "doc", "pipelines"))
    }
  }
}
