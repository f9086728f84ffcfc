package graft

import graft.operators.Classify
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val B = 1024

  // Two token-disjoint dialects: "positive" docs speak apple/banana,
  // "negative" docs speak rock/sand. Separable by construction.
  private val corpus = Seq(
    (1L, true, "apple banana apple cherry"),
    (2L, true, "banana apple banana mango"),
    (3L, true, "cherry apple mango banana"),
    (4L, false, "rock sand rock gravel"),
    (5L, false, "sand rock sand basalt"),
    (6L, false, "gravel rock basalt sand")
  ).toDF("id", "pos", "text")

  test("NB separates token-disjoint classes on held-out docs") {
    val model = Classify.trainModel(corpus, $"pos", $"text", B)
    val held = Seq(
      (10L, "apple banana mango"),   // pure positive dialect
      (11L, "rock sand gravel"),     // pure negative dialect
      (12L, "apple rock apple")      // majority positive
    ).toDF("id", "text")
    val out = Classify.score(model, held, $"id", $"text", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(10L) > 0, s"positive-dialect doc scored ${out(10L)}")
    assert(out(11L) < 0, s"negative-dialect doc scored ${out(11L)}")
    assert(out(12L) > 0, s"majority-positive doc scored ${out(12L)}")
  }

  test("unseen features score exactly the prior when class totals balance") {
    // Both classes have 12 training tokens, so the smoothed weight of a
    // slot unseen in training is ln(1/(12+B)) − ln(1/(12+B)) = 0 and a
    // doc of only-unseen tokens scores exactly the prior ln(dpos/dneg)
    // = ln(3/3) = 0. Feature hashing makes this exact, not approximate,
    // as long as the probe tokens collide with no training slot.
    val model = Classify.trainModel(corpus, $"pos", $"text", B)
    val trained = model.feat.select("f").as[Long].collect().toSet
    // pick tokens whose slots are provably untrained
    val probes = (1 to 50).map(i => s"zz$i").filter { tok =>
      val f = spark.range(1)
        .select(Classify.featHash(lit(tok), B)).as[Long].head()
      !trained.contains(f)
    }.take(3)
    assert(probes.nonEmpty)
    val doc = Seq((20L, probes.mkString(" "))).toDF("id", "text")
    val lo = Classify.score(model, doc, $"id", $"text", "id")
      .select($"log_odds").as[Double].head()
    assert(math.abs(lo) < 1e-12, s"expected prior-only 0.0, got $lo")
  }

  test("model stays bucket-bounded and scoring is deterministic") {
    val model = Classify.trainModel(corpus, $"pos", $"text", B)
    assert(model.feat.count() <= B)
    val held = Seq((10L, "apple rock sand banana")).toDF("id", "text")
    val a = Classify.score(model, held, $"id", $"text", "id")
      .select($"log_odds").as[Double].head()
    val b = Classify.score(model, held, $"id", $"text", "id")
      .select($"log_odds").as[Double].head()
    assert(a == b)
  }

  test("dsirWeights: target-exclusive docs weigh positive, " +
    "off-target negative, and target mean exceeds the rest") {
    val out = Classify.dsirWeights(corpus, $"id", $"text", $"pos", B, "id")
      .join(corpus.select($"id", $"pos"), "id")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    val (tgt, rest) = out.partition(_._3)
    assert(tgt.forall(_._2 > 0),
      s"target docs should lean target: ${tgt.mkString(",")}")
    assert(rest.forall(_._2 < 0),
      s"off-target docs should lean away: ${rest.mkString(",")}")
    val mt = tgt.map(_._2).sum / tgt.size
    val mr = rest.map(_._2).sum / rest.size
    assert(mt > mr)
  }

  test("scoreColumn serving path agrees with the join-based score") {
    val model = Classify.trainModel(corpus, $"pos", $"text", B)
    val w = Classify.collectWeights(model)
    val held = Seq((10L, "apple banana mango"), (11L, "rock sand gravel"),
      (12L, "apple rock apple zz1")).toDF("id", "text")
    val serving = held.select($"id",
      Classify.scoreColumn($"text", w, B).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val joined = Classify.score(model, held, $"id", $"text", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    joined.foreach { case (id, s) =>
      assert(math.abs(serving(id) - s) < 1e-9,
        s"doc $id: serving ${serving(id)} vs join $s")
    }
  }

  test("scoreColumn scores an empty doc at exactly the prior") {
    val model = Classify.trainModel(corpus, $"pos", $"text", B)
    val w = Classify.collectWeights(model)
    val s = Seq((1L, "")).toDF("id", "text")
      .select(Classify.scoreColumn($"text", w, B)).as[Double].head()
    assert(s == w.prior)
  }

  test("qualityGate is stateless: streaming filter == batch filter") {
    val model = Classify.trainModel(corpus, $"pos", $"text", B)
    val w = Classify.collectWeights(model)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val rowsIn = Seq((1L, "apple banana apple"), (2L, "rock sand basalt"),
      (3L, "apple rock banana mango"))
    val q = Classify.qualityGate(
        src.toDF().toDF("id", "text"), $"text", w, B)
      .writeStream.format("memory").queryName("nb_gate")
      .outputMode("append").start()
    try {
      src.addData(rowsIn: _*)
      q.processAllAvailable()
      val streamed = col0[Long](
        spark.table("nb_gate").select($"id").orderBy($"id"))
      val batch = col0[Long](Classify.qualityGate(
          rowsIn.toDF("id", "text"), $"text", w, B)
        .select($"id").orderBy($"id"))
      assert(streamed == batch && batch.nonEmpty && batch.size < rowsIn.size)
    } finally q.stop()
  }

  test("scoreColumn serving path agrees BITWISE with the model-path score") {
    // same 2^-20 grid discipline as DSIR: integer-grid weights + a
    // dyadic prior make the serving fold and the join path exact twins
    val model = Classify.trainModel(corpus, $"pos", $"text", B)
    val w = Classify.collectWeights(model)
    assert(w.weights.forall(v => v == math.floor(v)))
    val serving = corpus.select($"id",
        Classify.scoreColumn($"text", w, B).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val joined = Classify.score(model, corpus, $"id", $"text", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    joined.foreach { case (id, s) =>
      assert(java.lang.Double.doubleToRawLongBits(serving(id)) ==
        java.lang.Double.doubleToRawLongBits(s),
        s"doc $id: serving ${serving(id)} vs model-path $s")
    }
    // and the model path is invariant under adversarial repartitioning
    val again = Classify.score(model,
        corpus.repartition(13, expr("id * -7")), $"id", $"text", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again.forall { case (id, s) =>
      java.lang.Double.doubleToRawLongBits(joined(id)) ==
        java.lang.Double.doubleToRawLongBits(s) })
  }

  test("dsirColumn serving path agrees BITWISE with the join-based dsirWeights") {
    // the 2^-20 grid quantization makes both sides exact-integer
    // arithmetic up to the same final two divides — agreement is
    // bit-for-bit, not epsilon
    val w = Classify.collectDsirWeights(corpus, $"text", $"pos", B)
    assert(w.prior == 0.0)
    assert(w.weights.forall(v => v == math.floor(v)),
      "serving weights must be integer-valued grid points")
    val serving = corpus.select($"id",
        Classify.dsirColumn($"text", w, B).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val joined = Classify.dsirWeights(corpus, $"id", $"text", $"pos", B, "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    joined.foreach { case (id, s) =>
      assert(java.lang.Double.doubleToRawLongBits(serving(id)) ==
        java.lang.Double.doubleToRawLongBits(s),
        s"doc $id: serving ${serving(id)} vs join $s")
    }
    // empty doc: NULL where the join path drops the row
    val empty = Seq((9L, "")).toDF("id", "text")
      .select(Classify.dsirColumn($"text", w, B)).collect().head
    assert(empty.isNullAt(0))
  }

  test("detLn: bitwise vs declarative twin, ~1e-12 of math.log, exact at powers of two") {
    import org.apache.spark.sql.types.LongType
    // declarative twin replaying sqlDetLnCols' op sequence in Columns
    val ns = spark.range(1, 4000).toDF("n")
      .union(Seq(1L << 40, (1L << 40) + 12345L, (1L << 52) + 7L)
        .toDF("n"))
    val e = (length(bin($"n")) - 1).cast("int")
    val twin = ns.withColumn("e", e)
      .withColumn("m", $"n".cast("double") /
        expr("shiftleft(1L, e)").cast("double"))
      .withColumn("z", ($"m" - 1.0) / ($"m" + 1.0))
      .withColumn("z2", $"z" * $"z")
      .withColumn("want", $"e".cast("double") * lit(expressions.DetLn.Ln2) +
        (lit(2.0) * $"z") * expressions.DetLn.HornerK.tail.foldLeft(
          lit(1.0 / expressions.DetLn.HornerK.head): Column)(
          (acc, k) => acc * $"z2" + lit(1.0 / k)))
      .withColumn("got", expressions.DetLn($"n"))
      .select($"n", $"want", $"got").collect()
    twin.foreach { r =>
      val n = r.getLong(0)
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), s"n=$n twin")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(expressions.DetLn.compute(n)),
        s"n=$n interpreted-vs-reference")
      assert(math.abs(r.getDouble(2) - math.log(n.toDouble)) <= 1e-11,
        s"n=$n drifts from ln")
    }
    assert(expressions.DetLn.compute(1L) == 0.0 &&
      (1.0 / expressions.DetLn.compute(1L)) > 0.0, "detln(1) must be +0.0")
    assert(expressions.DetLn.compute(1024L) == 10.0 * expressions.DetLn.Ln2)
    assert(expressions.DetLn.compute(0L).isNaN &&
      expressions.DetLn.compute(-5L).isNaN)
  }

  test("dsirWeights is invariant under adversarial repartitioning") {
    // the round-9/10 x5 failure mode: summation-order noise in the
    // per-doc aggregate. The grid-quantized chain is exact-integer up
    // to the final divides, so ANY partitioning must give identical
    // bits — pin it by comparing a 1-partition run against a run
    // scattered across 13 partitions in reversed-hash order.
    val base = Classify.dsirWeights(corpus, $"id", $"text", $"pos", B, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).sortBy(_._1)
    for (df <- Seq(corpus.coalesce(1),
        corpus.repartition(13, expr("id * -7")))) {
      val got = Classify.dsirWeights(df, $"id", $"text", $"pos", B, "id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).sortBy(_._1)
      assert(got.toSeq == base.toSeq)
    }
  }

  test("evalBinary: exact AUC on separable, reversed, and tied scores") {
    def auc(rows: Seq[(Double, Boolean)]): (Double, Double) = {
      val r = Classify.evalBinary(rows.toDF("s", "y"), $"s", $"y")
        .select($"auc", $"accuracy").head()
      (r.getDouble(0), r.getDouble(1))
    }
    // perfect separation: every pos outranks every neg
    assert(auc(Seq((-2.0, false), (-1.0, false), (1.0, true), (2.0, true)))
      == ((1.0, 1.0)))
    // reversed scores: AUC 0
    assert(auc(Seq((2.0, false), (1.0, false), (-1.0, true), (-2.0, true)))
      ._1 == 0.0)
    // one tie counts half: pairs (tie 0.5) + (win 1.0) over 2 → 0.75
    assert(auc(Seq((1.0, true), (1.0, false), (2.0, true)))._1 == 0.75)
  }

  test("evalBinary confusion counts at the threshold") {
    val r = Classify.evalBinary(
      Seq((0.5, true), (1.5, true), (-0.5, false), (0.25, false))
        .toDF("s", "y"), $"s", $"y").head()
    // (n_pos, n_neg, tp, fp, tn, fn)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((2L, 2L, 2L, 1L, 1L, 0L)))
  }

  test("thresholdForKeepRate: most inclusive threshold within the cap") {
    val scores = Seq(1.0, 1.0, 2.0, 3.0).toDF("s")
    // cap = 4·50 div 100 = 2: kept(3)=1 ok, kept(2)=2 ok, kept(1)=4 no
    val r = Classify.thresholdForKeepRate(scores, $"s", 50).head()
    assert((r.getDouble(0), r.getLong(1)) == ((2.0, 2L)))
    // cap 0: even the top group exceeds it → NULL threshold
    val none = Classify.thresholdForKeepRate(scores, $"s", 10).head()
    assert(none.isNullAt(0) && none.isNullAt(1))
    // cap 100%: everything kept at the minimum score
    val all = Classify.thresholdForKeepRate(scores, $"s", 100).head()
    assert((all.getDouble(0), all.getLong(1)) == ((1.0, 4L)))
  }

  test("dsirWeights of the whole corpus as target is exactly zero") {
    // target LM == raw LM ⇒ every log ratio cancels term-by-term.
    val out = Classify.dsirWeights(corpus, $"id", $"text", lit(true), B, "id")
      .select($"avg_logratio").as[Double].collect()
    assert(out.forall(w => math.abs(w) < 1e-12))
  }

  test("plattFit: monotone calibration, partition-invariant, singular guard") {
    // score-correlated labels with deterministic noise: high s mostly
    // positive, low s mostly negative, every 7th flipped
    val data = Seq.tabulate(400) { i =>
      val s = (i % 100) / 100.0
      (s, ((i % 100) > 50) ^ (i % 7 == 0))
    }
    val df = data.toDF("s", "y")
    val (a, b) = Classify.plattFit(df, $"s", $"y", iters = 8)
    assert(a > 0, s"calibration slope should be positive, got a=$a b=$b")
    // 6dp-rounded sums make the fit summation-order invariant
    val (a2, b2) = Classify.plattFit(df.repartition(7), $"s", $"y", iters = 8)
    assert((a, b) == ((a2, b2)))
    val r = spark.range(1).select(
      Classify.plattProb(lit(0.9), a, b).as("hi"),
      Classify.plattProb(lit(0.1), a, b).as("lo")).head()
    val (hi, lo) = (r.getDouble(0), r.getDouble(1))
    assert(hi > lo && hi < 1.0 && lo > 0.0, s"hi=$hi lo=$lo")
    // calibrated mean ~ base rate at the fitted params (proper scoring)
    val meanP = df.select(Classify.plattProb($"s", a, b).as("p"))
      .agg(org.apache.spark.sql.functions.avg($"p")).head().getDouble(0)
    val baseRate = data.count(_._2).toDouble / data.length
    assert(math.abs(meanP - baseRate) < 0.05, s"meanP=$meanP base=$baseRate")
    // constant score ⇒ singular Hessian: the guard stops at the origin
    val flat = Seq((1.0, true), (1.0, false), (1.0, true)).toDF("s", "y")
    assert(Classify.plattFit(flat, $"s", $"y", iters = 4) == ((0.0, 0.0)))
  }

  private def lrFeat(df: org.apache.spark.sql.DataFrame) =
    Classify.docFeaturesLabeled(df, $"id", $"pos", $"text", B, "id")

  test("logreg separates token-disjoint classes on held-out docs after 2 ticks") {
    val w = Classify.trainLogReg(lrFeat(corpus), ticks = 2, etaDen = 1L,
      idName = "id")
    assert(w.nonEmpty && w.forall { case (f, _) => f >= 0 && f < B })
    val held = Seq(
      (10L, true, "apple banana mango"),
      (11L, false, "rock sand gravel"),
      (12L, true, "apple rock apple")) // majority positive
      .toDF("id", "pos", "text")
    val z = Classify.logRegZ(lrFeat(held), w, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(z(10L) > 0, s"positive-dialect doc z=${z(10L)}")
    assert(z(11L) < 0, s"negative-dialect doc z=${z(11L)}")
    assert(z(12L) > 0, s"majority-positive doc z=${z(12L)}")
  }

  test("logreg tick 1 from w0=0: residuals are exactly ±2^19 and the fit is deterministic") {
    // at w = 0 every logit is 0, σ = 1/(1+detexp(0)) = 0.5 EXACTLY, so
    // the tick-1 gradient is the pure class-count signal: g_f =
    // 2^19·(pos occurrences − neg occurrences); with η=1/N the tick-1
    // weight is that signal div N — checked here against hand counts
    val feat = lrFeat(corpus)
    val w1 = Classify.trainLogReg(feat, ticks = 1, etaDen = 1L,
      idName = "id").toMap
    val half = (Classify.LrGrid / 2).toDouble
    val counts = corpus
      .select($"pos", explode(split($"text", " ")).as("tok"))
      .select($"pos", Classify.featHash($"tok", B).as("f"))
      .groupBy($"f")
      .agg(sum(when($"pos", 1L).otherwise(-1L)).as("net"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach { case (f, net) =>
      val expected = (net * half).toLong / 6L // N = 6 docs, trunc toward 0
      assert(w1(f) == expected, s"slot $f: got ${w1(f)}, want $expected")
    }
    // order-exact: a re-run (fresh plan, fresh partitioning) is bit-equal
    val w1b = Classify.trainLogReg(feat, ticks = 1, etaDen = 1L,
      idName = "id").toMap
    assert(w1 == w1b)
    val w2 = Classify.trainLogReg(feat, ticks = 2, etaDen = 1L, idName = "id")
    val w2b = Classify.trainLogReg(feat, ticks = 2, etaDen = 1L, idName = "id")
    assert(w2 == w2b, "2-tick fit not deterministic")
  }

  test("logreg warm-start composition law: from(from(0, a), b) == from(0, a+b)") {
    // the lifecycle contract: a warm refresh tick over the same corpus
    // IS the tail of the cold descent, bit for bit — so a daily model
    // tick never needs a cold re-fit to stay exactly reproducible
    val feat = lrFeat(corpus)
    val w1 = Classify.trainLogReg(feat, ticks = 1, etaDen = 1L, idName = "id")
    val warm = Classify.trainLogRegFrom(feat, w1, ticks = 1, etaDen = 1L,
      idName = "id")
    val cold = Classify.trainLogReg(feat, ticks = 2, etaDen = 1L, idName = "id")
    assert(warm.toMap == cold.toMap,
      s"warm-start tick diverged from the cold descent:\n$warm\nvs\n$cold")
  }

  test("lrSink lifecycle: streamed warm ticks == manual chain; poisoned replay and empty batch no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("lrlog").toString
    val rows = corpus.collect().map(r =>
      (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    val (b0, b1, b2) = (rows.take(2), rows.slice(2, 4), rows.drop(4))
    def df(b: Seq[(Long, Boolean, String)]) = b.toDF("id", "pos", "text")
    Classify.initLrLog(
      Classify.docFeaturesLabeled(df(b0), $"id", $"pos", $"text", B, "id"),
      dir, ticks = 1, etaDen = 1L, idName = "id")
    val src = MemoryStream[(Long, Boolean, String)]
    val q = Classify.lrSink(src.toDF().toDF("id", "pos", "text"),
      $"id", $"pos", $"text", B, ticks = 1, etaDen = 1L, dir,
      idName = "id").start()
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = Classify.loadLrWeights(spark, dir)
    // the manual chain over the same growing corpus
    def feats(b: Seq[(Long, Boolean, String)]) =
      Classify.docFeaturesLabeled(df(b), $"id", $"pos", $"text", B, "id")
    val w0 = Classify.trainLogReg(feats(b0), 1, 1L, "id")
    val w1 = Classify.trainLogRegFrom(feats(b0 ++ b1), w0, 1, 1L, "id")
    val w2 = Classify.trainLogRegFrom(feats(b0 ++ b1 ++ b2), w1, 1, 1L, "id")
    assert(streamed == w2.sortBy(_._1),
      s"streamed weights diverged:\n$streamed\nvs\n${w2.sortBy(_._1)}")
    // poisoned replay of committed batch 0 (wrong docs, flipped labels)
    Classify.appendLrBatch(df(b2.map(t => (t._1, !t._2, t._3))),
      $"id", $"pos", $"text", B, 1, 1L, dir, Some(0L), "id")
    assert(Classify.loadLrWeights(spark, dir) == streamed,
      "poisoned replay moved the served model")
    // an empty batch marks its id done without a tick
    Classify.appendLrBatch(df(Seq.empty), $"id", $"pos", $"text",
      B, 1, 1L, dir, Some(9L), "id")
    assert(Classify.loadLrWeights(spark, dir) == streamed,
      "empty batch moved the served model")
  }

  test("logreg tick 2 moves weights toward the margin (training loss direction)") {
    // after tick 1 the separable fixture's positive-dialect slots hold
    // positive weights; tick 2's residuals shrink (|y − σ| < 0.5) but
    // keep sign, so every tick-1-positive slot stays positive and no
    // weight flips sign — the descent is monotone on separable data
    val feat = lrFeat(corpus)
    val w1 = Classify.trainLogReg(feat, ticks = 1, etaDen = 1L,
      idName = "id").toMap
    val w2 = Classify.trainLogReg(feat, ticks = 2, etaDen = 1L,
      idName = "id").toMap
    w1.foreach { case (f, v1) =>
      val v2 = w2(f)
      assert(v1 == 0 || v1.sign == v2.sign || v2 == 0,
        s"slot $f flipped sign: tick1=$v1 tick2=$v2")
      assert(math.abs(v2) >= math.abs(v1) - 1,
        s"slot $f moved away from the margin: tick1=$v1 tick2=$v2")
    }
  }
}
