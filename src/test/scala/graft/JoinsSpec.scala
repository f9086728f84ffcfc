package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // one hot key (90% of rows) + a tail
    val big = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("key", "row_id")
    val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, v) => (k, v) }.toDF("key", "v")
    val plain = big.join(small, "key")
    val salted = Joins.saltedJoin(big, small, "key", salts = 8, $"row_id")
    assert(salted.count() == plain.count())
    val a = plain.select($"key", $"row_id", $"v").collect().map(_.toString).sorted
    val b = salted.select($"key", $"row_id", $"v").collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("bucketed tables join without an exchange on the join key") {
    val left = (1L to 500L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 500L).map(i => (i, s"r$i")).toDF("k", "rv")
    Joins.writeBucketed(left, "bk_left", "k", 4)
    Joins.writeBucketed(right, "bk_right", "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ so the shuffle (or its absence) is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
      assert(joined.count() == 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not reshuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
