package graft

import graft.operators.Classify
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

  test("dsirWeights of the whole corpus as target is exactly zero") {
    // target LM == raw LM ⇒ every log ratio cancels term-by-term.
    val out = Classify.dsirWeights(corpus, $"id", $"text", lit(true), B, "id")
      .select($"avg_logratio").as[Double].collect()
    assert(out.forall(w => math.abs(w) < 1e-12))
  }
}
