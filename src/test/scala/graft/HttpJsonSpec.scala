package graft

import graft.sources.HttpJson
import org.apache.spark.sql.types._

class HttpJsonSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("paper_id", StringType),
    StructField("title", StringType),
    StructField("citations", LongType)))

  /** In-memory fetcher serving `pages` keyed by the offset query param. */
  private final class PagedStub(pages: Map[Long, String])
    extends HttpJson.Fetcher {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def fetch(url: String): String = {
      seen += url
      val off = url.split("offset=").last.toLong
      pages.getOrElse(off, """{"data": []}""")
    }
  }

  private def page(ids: Seq[Int]): String =
    ids.map(i => s"""{"paper_id":"p$i","title":"T$i","citations":${i * 10}}""")
      .mkString("""{"data": [""", ",", "]}")

  test("readPaged walks offsets until the API runs dry") {
    val stub = new PagedStub(Map(0L -> page(Seq(1, 2)), 2L -> page(Seq(3))))
    val df = HttpJson.readPaged(spark, off => s"http://x/?offset=$off",
      schema, fetcher = stub)
    val got = rows(df.orderBy("paper_id"))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got == Seq(("p1", "T1", 10L), ("p2", "T2", 20L), ("p3", "T3", 30L)))
    // three fetches: two full pages + the dry probe at offset 3
    assert(stub.seen.toSeq == Seq("http://x/?offset=0",
      "http://x/?offset=2", "http://x/?offset=3"))
  }

  test("empty API yields an empty DataFrame with the explicit schema") {
    val df = HttpJson.readPaged(spark, off => s"http://x/?offset=$off",
      schema, fetcher = new PagedStub(Map.empty))
    assert(df.count() == 0)
    assert(df.schema == schema)
  }

  test("maxPages caps pagination even when the API never runs dry") {
    val endless = new HttpJson.Fetcher {
      def fetch(url: String): String = page(Seq(1))
    }
    val df = HttpJson.readPaged(spark, off => s"http://x/?offset=$off",
      schema, fetcher = endless, maxPages = 4)
    assert(df.count() == 4)
  }

  test("records nested at a custom JSON pointer are extracted") {
    val stub = new PagedStub(Map(
      0L -> """{"result": {"items": [{"paper_id":"a","title":"A","citations":1}]}}"""))
    val df = HttpJson.readPaged(spark, off => s"http://x/?offset=$off",
      schema, recordsPtr = "/result/items", fetcher = stub)
    assert(rows(df).map(_.getString(0)) == Seq("a"))
  }

  test("missing fields land as NULL under the explicit schema") {
    val stub = new PagedStub(Map(0L -> """{"data": [{"paper_id":"a"}]}"""))
    val r = rows(HttpJson.readPaged(spark, off => s"http://x/?offset=$off",
      schema, fetcher = stub)).head
    assert(r.getString(0) == "a" && r.isNullAt(1) && r.isNullAt(2))
  }

  test("fetchWithRetry backs off multiplicatively and then succeeds") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val flaky = new HttpJson.Fetcher {
      def fetch(url: String): String = {
        calls += 1
        if (calls < 3) throw new java.io.IOException("HTTP 503")
        "ok"
      }
    }
    val out = HttpJson.fetchWithRetry(flaky, "http://x/", maxRetries = 3,
      backoffMs = 100, sleep = sleeps += _)
    assert(out == "ok" && sleeps.toSeq == Seq(100L, 200L))
  }

  test("fetchWithRetry rethrows once attempts are exhausted") {
    val dead = new HttpJson.Fetcher {
      def fetch(url: String): String = throw new java.io.IOException("HTTP 500")
    }
    intercept[java.io.IOException] {
      HttpJson.fetchWithRetry(dead, "http://x/", maxRetries = 2, sleep = _ => ())
    }
  }

  test("pauseMs sleeps between page fetches but not before the first") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stub = new PagedStub(Map(0L -> page(Seq(1)), 1L -> page(Seq(2))))
    HttpJson.readPaged(spark, off => s"http://x/?offset=$off", schema,
      fetcher = stub, pauseMs = 250, sleep = sleeps += _).count()
    // pages at offset 0, 1 and the dry probe at 2 -> two pauses
    assert(sleeps.toSeq == Seq(250L, 250L))
  }

  test("HttpFetcher GETs with headers and throws on non-2xx") {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seenHeader = ""
    srv.createContext("/api", ex => try {
      seenHeader = ex.getRequestHeaders.getFirst("X-Api-Key")
      val body =
        if (ex.getRequestURI.getQuery == "offset=0") page(Seq(7))
        else """{"data": []}"""
      val bytes = body.getBytes("UTF-8")
      val status = if (seenHeader == "k") 200 else 403
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
    } finally ex.close())
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}/api"
      val ok = new HttpJson.HttpFetcher(headers = Map("X-Api-Key" -> "k"))
      val df = HttpJson.readPaged(spark, off => s"$base?offset=$off",
        schema, fetcher = ok)
      assert(rows(df).map(_.getString(0)) == Seq("p7"))
      assert(seenHeader == "k")
      intercept[java.io.IOException] {
        new HttpJson.HttpFetcher().fetch(s"$base?offset=0")
      }
    } finally srv.stop(0)
  }
}
