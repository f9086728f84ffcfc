package graft

import graft.operators.{Scored, Similarity, TopKAggregator}
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("keeps the k best per group with deterministic tie-break") {
    val data = Seq(
      (1L, Scored(10L, 0.5)), (1L, Scored(11L, 0.9)), (1L, Scored(12L, 0.9)),
      (1L, Scored(13L, 0.1)), (2L, Scored(20L, 0.3)))
    val agg = new TopKAggregator(2).toColumn
    val got = data.toDS().groupByKey(_._1).mapValues(_._2).agg(agg)
      .collect().toMap
    assert(got(1L) == Seq(Scored(11L, 0.9), Scored(12L, 0.9)))
    assert(got(2L) == Seq(Scored(20L, 0.3)))
  }

  test("bounded buffer: reduce never exceeds k and matches full sort") {
    val xs = (1L to 100L).map(i => Scored(i, (i * 37 % 100) / 100.0))
    val agg = new TopKAggregator(5)
    val reduced = xs.foldLeft(agg.zero)(agg.reduce)
    assert(reduced.size == 5)
    val expected = xs.sortBy(s => (-s.score, s.id)).take(5)
    assert(reduced == expected)
    // merge of split halves agrees with whole
    val (l, r) = xs.splitAt(50)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == expected)
  }

  test("agrees with the window-based topKPerQuery on embeddings-like data") {
    val docs = (1L to 50L).map(i =>
      (i, Seq((i % 7 + 1).toFloat, ((i * 3) % 5).toFloat))).toDF("id", "v")
    val queries = Seq((100L, Seq(1.0f, 0.5f))).toDF("qid", "qv")
    val viaWindow = rows(Similarity.topKPerQuery(
      docs, $"id", $"v", queries, $"qid", $"qv", k = 5))
      .map(r => r.getLong(1))
    val scored = Similarity.topKPerQuery(docs, $"id", $"v", queries, $"qid", $"qv", k = 50)
      .select($"doc_id", $"cosine").as[(Long, Double)]
      .map { case (id, c) => Scored(id, c) }
    val viaAgg = scored.groupByKey(_ => 1).agg(new TopKAggregator(5).toColumn)
      .collect().head._2.map(_.id)
    assert(viaAgg == viaWindow)
  }
}
