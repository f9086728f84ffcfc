package graft

import graft.expressions.SortedIntersectCount
import org.apache.spark.sql.functions._

class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("matches size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Seq(1, 3, 5, 7), Seq(3, 4, 5, 6, 7)),
      (Seq(1, 2), Seq(3, 4)),
      (Seq.empty[Int], Seq(1)),
      (Seq(2, 4, 6), Seq(2, 4, 6))).toDF("a", "b")
    val got = rows(df.select(
      SortedIntersectCount($"a", $"b"),
      size(array_intersect($"a", $"b")).cast("long")))
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(got.map(_.getLong(0)) == Seq(3L, 0L, 0L, 3L))
  }

  test("null propagates") {
    val df = Seq((Some(Seq(1)), Option.empty[Seq[Int]])).toDF("a", "b")
    assert(rows(df.select(SortedIntersectCount($"a", $"b"))).head.isNullAt(0))
  }
}
