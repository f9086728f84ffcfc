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

  test("asofJoin: backward inclusive match, same-instant tie, no-match NULLs") {
    val left = Seq((1L, 5L, "l0"), (1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 7L, "l3"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 6L, "r6"), (1L, 10L, "r10"), (1L, 15L, "r15"), (3L, 1L, "rx"))
      .toDF("k", "rt", "rv")
    val got = Joins.asofJoin(left, right, "k", "t", "rt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) "NULL" else r.getString(4)))
      .toSet
    assert(got == Set(
      (1L, 5L, "l0", -1L, "NULL"),   // no right row at-or-before t=5
      (1L, 10L, "l1", 10L, "r10"),   // same-instant right row wins over r6
      (1L, 20L, "l2", 15L, "r15"),   // latest of {6, 10, 15}
      (2L, 7L, "l3", -1L, "NULL"))) // key absent on the right
  }

  test("asofJoin equals the brute-force theta-join argmax on random data") {
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = Seq.fill(120)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .distinct // unique per (k, rt): the asofJoin contract
      .map { case (k, rt) => (k, rt, s"p$k-$rt") }
      .toDF("k", "rt", "rv")
    val got = Joins.asofJoin(left, right, "k", "t", "rt")
      .select($"lid", $"rt", $"rv").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "NULL" else r.getString(2))).sorted
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy($"lid").orderBy($"rt".desc)
    val want = left.join(right, left("k") === right("k") && $"rt" <= $"t", "left")
      .withColumn("rn", row_number().over(best))
      .filter($"rn" === 1)
      .select($"lid", $"rt", $"rv").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "NULL" else r.getString(2))).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("asofJoinBucketed equals asofJoin across bucket widths on hot-key data") {
    val rnd = new scala.util.Random(11)
    // one hot key (most rows) + a tail; negative and positive times
    val left = Seq.tabulate(400)(i =>
      (if (i % 5 == 0) rnd.nextInt(4).toLong + 1 else 0L,
        (rnd.nextInt(2001) - 1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = Seq.fill(150)((rnd.nextInt(5).toLong, (rnd.nextInt(2001) - 1000).toLong))
      .distinct
      .map { case (k, rt) => (k, rt, s"p$k-$rt") }
      .toDF("k", "rt", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"lid", $"rt", $"rv").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -9999L else r.getLong(1),
          if (r.isNullAt(2)) "NULL" else r.getString(2))).sorted.toSeq
    val want = canon(Joins.asofJoin(left, right, "k", "t", "rt"))
    // widths straddling: sub-span, near-span, and larger-than-span
    for (w <- Seq(7L, 100L, 1000L, 5000L)) {
      assert(canon(Joins.asofJoinBucketed(left, right, "k", "t", "rt", w)) == want,
        s"bucketed asof diverged at bucketWidth=$w")
    }
  }

  test("rangeJoin: inclusive bounds, multi-cell spans, negative-time cells") {
    val points = Seq((1L, 0L, 100L), (1L, 10L, 101L), (1L, 50L, 102L),
      (2L, -25L, 103L)).toDF("k", "pt", "pid")
    val ranges = Seq((1L, 0L, 10L, 200L), (1L, -100L, 120L, 201L),
      (2L, -30L, -25L, 202L), (1L, 60L, 70L, 203L)).toDF("k", "rs", "re", "rid")
    val got = Joins.rangeJoin(points, "pt", ranges, "rs", "re", "k", cellWidth = 7L)
      .select($"pid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // the -100..120 range spans ~32 cells; each containment appears ONCE
    assert(got.length == got.distinct.length, "duplicate pairs from multi-cell ranges")
    assert(got.toSet == Set(
      (100L, 200L), (100L, 201L), // start-inclusive; wide span
      (101L, 200L), (101L, 201L), // end-inclusive at 10
      (102L, 201L),               // inside the wide range only
      (103L, 202L)))              // negative times, end-inclusive at -25
  }

  test("rangeJoin equals the brute-force theta-join on random signed data") {
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(400)(i =>
      (rnd.nextInt(5).toLong, (rnd.nextInt(1001) - 500).toLong, i.toLong))
      .toDF("k", "pt", "pid")
    val ranges = Seq.tabulate(150) { i =>
      val a = rnd.nextInt(1001) - 500; val b = rnd.nextInt(1001) - 500
      (rnd.nextInt(5).toLong, math.min(a, b).toLong, math.max(a, b).toLong, i.toLong)
    }.toDF("k", "rs", "re", "rid")
    val got = Joins.rangeJoin(points, "pt", ranges, "rs", "re", "k", cellWidth = 64L)
      .select($"pid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = points.join(ranges,
        points("k") === ranges("k") && $"pt" >= $"rs" && $"pt" <= $"re")
      .select($"pid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(want.nonEmpty && got.toSeq == want.toSeq)
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
