package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Join strategies for 100 TB operation (SURVEY.md §7.4 risk 6). Catalyst
  * already picks broadcast vs sort-merge and AQE splits detected skew;
  * these helpers cover the two cases that still need explicit structure:
  * hot-key salting (when one side is too big to broadcast AND a handful
  * of keys dominate) and bucketed co-located joins (when the same key
  * joins repeatedly across jobs and the shuffle should be paid once at
  * write time).
  */
object Joins {

  /** Salted inner equi-join: the big (skewed) side gets a deterministic
    * salt from a disambiguator column (any roughly-unique column — row
    * id, line number); the small side replicates `salts` times so every
    * (key, salt) bucket still finds its match. The hot key's rows spread
    * over `salts` tasks instead of one straggler.
    *
    * Result equals `big.join(small, key)` exactly — each big row matches
    * precisely the replica carrying its salt.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, disambig: Column): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("__salt", pmod(hash(disambig), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Bucketed co-located write: pre-shuffles once at write time so later
    * equi-joins on `key` between tables bucketed the same way need NO
    * exchange (Catalyst sees the bucketing output partitioning).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)

  /** Backward as-of left join: every left row picks the LATEST right row
    * of the same `key` with `right(rightTime) <= left(leftTime)`
    * (inclusive — a right row at exactly the left timestamp matches, the
    * DuckDB/pandas `merge_asof` convention). Left rows with no earlier
    * right row keep NULLs.
    *
    * Spark has no native as-of join; the naive formulations are a
    * point-in-time theta-join (row blowup, then argmax per left row) or
    * a per-left-row subquery. This is the scalable shape instead: tag
    * and union both sides, ONE hash shuffle on `key`, then a running
    * `last(payload, ignoreNulls)` window ordered by (time, side) carries
    * each right payload forward to the left rows that follow it. Cost is
    * a single sort per key partition — no pair blowup, no second
    * shuffle. A key whose whole timeline is hot still lands in one task;
    * if that bites, pre-split by coarse time bucket and stitch boundary
    * carry-forwards (two-pass) — not needed at current skew.
    *
    * Contracts: `right` rows are unique per (key, rightTime) — the match
    * would otherwise be ambiguous; left/right column names must not
    * collide (pre-alias the right side). Result columns: all of left's,
    * then right's payload columns (everything except `key`), NULL when
    * unmatched.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(_ == key)
    val lStructType = left.select(struct(lCols.map(col): _*)).schema.head.dataType
    val rStructType = right.select(struct(rPayload.map(col): _*)).schema.head.dataType
    val rSide = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"),
      struct(rPayload.map(col): _*).as("__p"),
      lit(null).cast(lStructType).as("__l"))
    val lSide = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(rStructType).as("__p"),
      struct(lCols.map(col): _*).as("__l"))
    // right sorts before left at equal timestamps, so the running last()
    // sees a same-instant right row before the left row that matches it.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rSide.unionByName(lSide)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(c => col("__l").getField(c).as(c)) ++
        rPayload.map(c => col("__match").getField(c).as(c)): _*)
  }

  /** As-of join for HOT keys — same semantics as [[asofJoin]] (backward,
    * inclusive, NULLs when unmatched), but no task ever sorts a whole
    * key's history: the timeline splits into `bucketWidth` time buckets
    * and the carry across buckets happens on per-bucket SUMMARIES.
    *
    * Pass 1: running `last` within (key, bucket) — the sort unit is one
    * bucket, so a hot key spreads over #buckets tasks. Pass 2: each
    * bucket's closing right payload (one aggregate row per non-empty
    * (key, bucket)) carries forward along the bucket spine with a
    * window over #buckets-sized partitions; left rows that found no
    * right row inside their own bucket take the carry of the latest
    * earlier bucket. The final stitch joins on (key, bucket), reusing
    * pass 1's partitioning for the big side — the only corpus-scale
    * sort is per-bucket.
    *
    * Contracts as [[asofJoin]], plus: both time columns are integral
    * (castable to long). Pick bucketWidth so a bucket's rows fit a
    * task comfortably; correctness holds for any positive width.
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String,
                       bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(_ == key)
    val lStructType = left.select(struct(lCols.map(col): _*)).schema.head.dataType
    val rStructType = right.select(struct(rPayload.map(col): _*)).schema.head.dataType
    val rSide = right.select(col(key).as("__k"),
      col(rightTime).cast("long").as("__t"),
      lit(0).as("__side"),
      struct(rPayload.map(col): _*).as("__p"),
      lit(null).cast(lStructType).as("__l"))
    val lSide = left.select(col(key).as("__k"),
      col(leftTime).cast("long").as("__t"),
      lit(1).as("__side"),
      lit(null).cast(rStructType).as("__p"),
      struct(lCols.map(col): _*).as("__l"))
    // trunc-division bucketing is monotone in __t, which is all pass 2
    // needs; both sides use the same function so same-instant semantics
    // are preserved by the (__t, __side) in-bucket ordering.
    val u = rSide.unionByName(lSide)
      .withColumn("__b", expr(s"__t div $bucketWidth"))
    val wIn = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = u.withColumn("__match",
      last(col("__p"), ignoreNulls = true).over(wIn))
    // pass 2 inputs are per-bucket summaries: one closing payload per
    // non-empty (key, bucket) — tiny relative to the data.
    val closes = rSide.withColumn("__b", expr(s"__t div $bucketWidth"))
      .groupBy(col("__k"), col("__b"))
      .agg(max_by(col("__p"), col("__t")).as("__close"))
    val spine = u.select(col("__k"), col("__b")).distinct()
      .join(closes, Seq("__k", "__b"), "left")
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = spine.withColumn("__carry",
      last(col("__close"), ignoreNulls = true).over(wCarry))
      .select(col("__k"), col("__b"), col("__carry"))
    inBucket.filter(col("__side") === 1)
      .join(carries, Seq("__k", "__b"))
      .withColumn("__m", coalesce(col("__match"), col("__carry")))
      .select(lCols.map(c => col("__l").getField(c).as(c)) ++
        rPayload.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Interval-containment (range) join: pairs every point row with every
    * range row of the same `key` whose `[rangeStart, rangeEnd]` contains
    * the point's `pointTime` (both bounds inclusive). Times are LONG
    * (e.g. epoch microseconds via `unix_micros`).
    *
    * The naive plan is a theta-join (broadcast nested loop or worse).
    * Instead the time axis buckets into fixed `cellWidth` cells: a point
    * belongs to exactly one cell, a range explodes into every cell it
    * overlaps, and the pair meets in the point's cell via a plain EQUI
    * join on (key, cell) — shuffle-hash machinery, AQE, and skew
    * handling all apply. The exact bounds re-check inside the join
    * condition keeps the result identical to the theta-join, and the
    * one-cell-per-point invariant means no post-join dedup. Work scales
    * with |points| + Σ(span/cellWidth + 1), so pick cellWidth near the
    * typical range span.
    *
    * Contract: point/range column names are disjoint apart from `key`;
    * rangeStart <= rangeEnd. Result: all point columns + all range
    * payload columns (inner join).
    */
  def rangeJoin(points: DataFrame, pointTime: String,
                ranges: DataFrame, rangeStart: String, rangeEnd: String,
                key: String, cellWidth: Long): DataFrame = {
    require(cellWidth > 0, "cellWidth must be positive")
    val p = points.withColumn("__cell",
      expr(s"$pointTime div $cellWidth"))
    val r = ranges.withColumn("__cell",
      explode(sequence(expr(s"$rangeStart div $cellWidth"),
        expr(s"$rangeEnd div $cellWidth"))))
    p.join(r, Seq(key, "__cell"))
      .filter(col(pointTime) >= col(rangeStart) &&
        col(pointTime) <= col(rangeEnd))
      .drop("__cell")
  }
}
