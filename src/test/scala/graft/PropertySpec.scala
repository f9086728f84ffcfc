package graft

import graft.functions.{TextAnalysis => TA, TextFunctions => TF, VectorFunctions => VF}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5.2): invariants that must hold for ANY
  * input. Uses raw scalacheck generators with fixed seeds (scalatestplus
  * is not on the offline classpath) — deterministic, but over generated
  * rather than handcrafted inputs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministically sample n values from a generator. */
  private def sample[T](g: Gen[T], n: Int, seed: Long = 42L): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('.', ',', '!', '?', ';')))
      .map(_.mkString.take(200))

  private val vec8: Gen[List[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f))

  test("dedup is idempotent for arbitrary keys") {
    val keys = sample(Gen.chooseNum(0, 5), 60)
    val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k.toString) }
      .toDF("ord", "k")
    val once = Dedup.dedupFirstWins(df, $"k", $"ord")
    val twice = Dedup.dedupFirstWins(once, $"k", $"ord")
    assert(once.collect().map(_.getLong(0)).sorted.toSeq ==
      twice.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("quality score lands in [0,1] for arbitrary ASCII text") {
    val texts = sample(asciiText, 60)
    val qs = texts.toDF("t").select(TA.qualityScore($"t"))
      .collect().toSeq.map(_.getDouble(0))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("cleanText output is ASCII with collapsed, trimmed whitespace") {
    val texts = sample(Gen.asciiPrintableStr, 60)
    val cleaned = texts.toDF("t").select(TF.cleanText($"t"))
      .collect().toSeq.map(_.getString(0))
    assert(cleaned.forall(s => !s.contains("  ") && s == s.trim))
    assert(cleaned.forall(_.forall(_ < 128)))
  }

  test("cosine similarity is bounded and symmetric") {
    val pairs = sample(Gen.zip(vec8, vec8), 40)
      .filter { case (a, b) =>
        a.exists(_ != 0.0f) && b.exists(_ != 0.0f) }
    val sims = pairs.toDF("a", "b")
      .select(VF.cosine($"a", $"b"), VF.cosine($"b", $"a"))
      .collect().toSeq
    sims.foreach { r =>
      val (ab, ba) = (r.getDouble(0), r.getDouble(1))
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      assert(math.abs(ab - ba) < 1e-9)
    }
  }

  test("normalize yields unit vectors for nonzero input") {
    val vs = sample(vec8, 40).filter(_.map(x => x * x).sum > 1e-3f)
    val norms = vs.toDF("a").select(VF.l2Norm(VF.normalize($"a")))
      .collect().toSeq.map(_.getDouble(0))
    assert(norms.nonEmpty)
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-6))
  }

  test("fingerprint and simhash are pure functions of the token stream") {
    val texts = sample(asciiText, 30)
    val df = (texts ++ texts).toDF("t") // every text twice
    val fps = df.select(TA.fingerprint($"t"), Dedup.simhash16($"t"))
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1)))
    val (first, second) = fps.splitAt(texts.size)
    assert(first == second)
  }

  test("media header parsers never throw on arbitrary bytes (ANSI safety)") {
    import graft.operators.Multimodal
    // raw fuzz + adversarial prefixes: valid magics followed by garbage,
    // so the walkers get past their signature guards into length fields
    val rawBytes = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.take(64).toArray)
    val magic = Gen.oneOf("89504E470D0A1A0A", "FFD8", "52494646", "474946383961")
    val prefixed = Gen.zip(magic, rawBytes).map { case (m, b) =>
      m.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray ++ b
    }
    val payloads = sample(rawBytes, 40) ++ sample(prefixed, 40)
    val df = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
    // collect() would throw if ANY length/conv/division were unguarded
    val got = df.select(
      Multimodal.pngDims($"media").as("p"),
      Multimodal.jpegDims($"media").as("j"),
      Multimodal.wavInfo($"media").as("w"),
      Multimodal.gifDims($"media").as("g")).collect().toSeq
    assert(got.size == payloads.size)
    // any dims that DID parse are sane (u16/u32 reads can't go negative)
    got.flatMap(r => Seq(0, 1, 3).filterNot(r.isNullAt).map(r.getStruct))
      .foreach { s =>
        assert(s.getLong(0) >= 0 && s.getLong(1) >= 0)
      }
  }

  test("alignment is total: output schema is fixed for any input projection") {
    import graft.operators.Align
    val spec = Seq("a" -> lit(0L), "b" -> lit(""), "c" -> lit(false))
    val shapes = Seq(
      Seq((1L, "x")).toDF("a", "b"),
      Seq(("y", true)).toDF("b", "c"),
      Seq(1L).toDF("z"))
    shapes.foreach { df =>
      val out = Align.alignTo(df, spec)
      assert(out.columns.toSeq == Seq("a", "b", "c"))
      assert(out.count() == df.count())
    }
  }

  test("BPE segmentation concatenates back to the word for any merge list") {
    import graft.operators.Bpe
    val words = sample(Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString), 40) ++
      Seq("", "a", "你好世界")
    val merges = sample(for {
      a <- Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString)
      b <- Gen.listOfN(1, Gen.alphaLowerChar).map(_.mkString)
    } yield (a, b), 10) ++ Seq(("a", "a"), ("aa", "a"))
    words.foreach { w =>
      assert(Bpe.jvmSegment(w, merges).mkString == w, s"round-trip broke on '$w'")
    }
    // and the native kernel preserves the full token stream of a doc
    val doc = words.filter(_.nonEmpty).mkString(" ")
    val pieces = graft.expressions.BpeEncode.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(doc),
      merges.map(_._1).toArray, merges.map(_._2).toArray,
      merges.map(p => p._1 + p._2).toArray)
    assert(pieces.map(_.toString).mkString ==
      TA.jvmTokens(doc).mkString)
  }

  test("detLn tracks math.log within 1e-11 and is monotone for arbitrary positive longs") {
    import graft.expressions.DetLn
    val ns = sample(Gen.chooseNum(1L, 1L << 50), 400) :+ 1L :+ 2L :+
      ((1L << 50) - 1L) :+ (1L << 50)
    ns.foreach { n =>
      val got = DetLn.compute(n)
      assert(math.abs(got - math.log(n.toDouble)) <= 1e-11 *
        math.max(1.0, math.abs(math.log(n.toDouble))), s"n=$n")
    }
    // monotone over arbitrary pairs (strictly, when ln separates them
    // beyond the series error — adjacent longs can tie at huge n)
    val pairs = ns.sorted.sliding(2).toSeq
    pairs.foreach {
      case Seq(a, b) if a < b =>
        assert(DetLn.compute(a) <= DetLn.compute(b), s"$a vs $b")
      case _ =>
    }
    // the DSIR weight grid: quantized log ratios are exact integers
    sample(Gen.chooseNum(1L, 1L << 30), 100).foreach { n =>
      val wi = math.floor((DetLn.compute(n) - DetLn.compute(n + 7)) *
        1048576.0 + 0.5)
      assert(wi == wi.toLong.toDouble && math.abs(wi) < (1L << 53).toDouble)
    }
  }

  test("connectedComponents equals brute union-find on arbitrary random graphs") {
    // the riskiest algorithm in the dedup suite: pin it against an
    // obviously-correct union-find over many random edge lists of
    // varied density (sparse forests → dense near-cliques)
    def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val es = edges.filter(e => e._1 != e._2)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      es.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
    }
    val edgeGen = for {
      nNodes <- Gen.chooseNum(2, 24)
      nEdges <- Gen.chooseNum(1, 40)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.chooseNum(0L, nNodes.toLong)
        b <- Gen.chooseNum(0L, nNodes.toLong)
      } yield (a, b))
    } yield edges
    sample(edgeGen, 12, seed = 7L).foreach { edges =>
      val got = Dedup.connectedComponents(edges.toDF("a", "b"), $"a", $"b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == brute(edges), s"edges=$edges")
    }
  }

  test("epochShuffle is a permutation with dense shard positions for arbitrary sizes") {
    val cases = sample(for {
      n <- Gen.chooseNum(1, 300)
      shards <- Gen.chooseNum(1, 7)
      epoch <- Gen.chooseNum(1, 5)
    } yield (n, shards, epoch), 6, seed = 11L)
    cases.foreach { case (n, shards, epoch) =>
      import graft.operators.Sampling
      val out = Sampling.epochShuffle(
          (0L until n.toLong).toDF("id"), $"id", epoch, shards)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.map(_._1).sorted.toSeq == (0L until n.toLong),
        s"n=$n shards=$shards epoch=$epoch")
      out.groupBy(_._2).foreach { case (_, rs) =>
        assert(rs.map(_._3).sorted.toSeq == (0L until rs.length.toLong))
      }
      assert(out.forall(t => t._2 >= 0 && t._2 < shards))
    }
  }

  test("token n-gram count law: distinct grams ≤ max(0, n_tok − n + 1)") {
    import graft.operators.Decontam
    val texts = sample(asciiText, 60)
    val rows = texts.toDF("t")
      .select(TA.tokens($"t").as("toks"))
      .select(size($"toks").as("nt"),
        size(Decontam.tokenNgramsFromTokens($"toks", 3)).as("ng"),
        size(Decontam.tokenNgramHashesFromTokens($"toks", 3)).as("nh"))
      .collect().toSeq
    rows.foreach { r =>
      val (nt, ng, nh) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert(ng <= math.max(0, nt - 2))
      assert(nh == ng, "hash-gram cardinality must equal string-gram")
      if (nt < 3) assert(ng == 0, "short texts must have no grams")
    }
  }

  test("StrideResizer laws: bounded length, subsequence bytes, deterministic") {
    import graft.operators.Multimodal
    val r = new Multimodal.StrideResizer
    val bytesGen = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.toArray)
    val targets = Gen.chooseNum(1, 50)
    for ((bs, tgt) <- sample(bytesGen, 60).zip(sample(targets, 60, 7L))) {
      val out = r.resize(bs, tgt)
      // identity under target, exactly target above it
      assert(out.length == math.min(bs.length, tgt),
        s"len=${bs.length} tgt=$tgt out=${out.length}")
      // every output byte is an input byte at a stride position
      if (bs.length > tgt) {
        val k = bs.length / tgt
        assert(out.toSeq == (0 until tgt).map(i => bs(i * k)))
      } else assert(out eq bs)
      assert(r.resize(bs, tgt).toSeq == out.toSeq)
    }
  }

  test("plattProb is a bounded monotone link for any finite inputs") {
    import graft.operators.Classify
    val params = sample(Gen.zip(Gen.chooseNum(0.01, 10.0),
      Gen.chooseNum(-5.0, 5.0)), 20)
    val scores = sample(Gen.chooseNum(-20.0, 20.0), 30).sorted
    for ((a, b) <- params) {
      val ps = spark.createDataFrame(scores.map(Tuple1(_))).toDF("s")
        .select(Classify.plattProb($"s", a, b).as("p"))
        .orderBy($"p").collect().map(_.getDouble(0)).toSeq
      // probabilities: bounded and (for a > 0, sorted scores) monotone
      assert(ps.forall(p => p >= 0.0 && p <= 1.0), s"a=$a b=$b ps=$ps")
      val direct = scores.map(s => 1.0 /
        (1.0 + graft.expressions.DetExp.compute(-(a * s + b))))
      assert(direct.sorted == ps, "engine and JVM sigmoid must agree")
    }
  }

  test("domainReweight invariants: weights in (0,1), sum ~ 1, uniform fixed point") {
    import graft.operators.Sampling
    // symmetric domains (identical text distribution) must STAY uniform
    val sym = (Seq.fill(12)(("a", "x y z")) ++ Seq.fill(12)(("b", "x y z")) ++
      Seq.fill(12)(("c", "x y z"))).toDF("d", "text")
    val out = rows(Sampling.domainReweight(sym, $"d", $"text",
        buckets = 32, eta = 4.0, iters = 4).orderBy($"d"))
      .map(r => (r.getString(0), r.getDouble(3)))
    assert(out.map(_._2).forall(a => a > 0.0 && a < 1.0))
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-5)
    // identical distributions ⇒ identical TV ⇒ the uniform point holds
    assert(out.map(_._2).distinct.size == 1, out.toString)
  }

  test("floorDiv identity equals Math.floorDiv for any dividend sign") {
    // the cross-engine division contract (CLAUDE.md): Spark `div`
    // truncates, DuckDB `//` floors; (a - pmod(a,b)) div b is exact and
    // floor-consistent on both — pinned here against the JVM's floorDiv
    // over adversarial values (both signs, extremes, small divisors)
    val as = sample(Gen.oneOf(
      Gen.chooseNum(Long.MinValue / 4, Long.MaxValue / 4),
      Gen.chooseNum(-100L, 100L)), 80)
    val bs = sample(Gen.oneOf(Gen.chooseNum(1L, 1000L),
      Gen.const(1L), Gen.const(20L)), 80, seed = 7L)
    val rows = as.zip(bs).toDF("a", "b")
      .select($"a", $"b", expr("((a - pmod(a, b)) div b)").as("fd"))
      .collect()
    rows.foreach { r =>
      val (a, b, fd) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(fd == Math.floorDiv(a, b), s"floorDiv($a, $b): got $fd")
    }
  }

  test("testdata id columns are non-negative (the pmod-vs-% oracle precondition)") {
    // Dozens of oracle twins mirror Spark `pmod(id, k)` as DuckDB's
    // bare `id % k` — equal ONLY for non-negative ids (DuckDB % takes
    // the dividend's sign). The generator HAS changed contracts between
    // rounds; if ids ever go negative, this spec names the hazard CLASS
    // in one line instead of ~30 cryptic hash mismatches at the gate.
    // Fix pattern when it fires: mirror pmod as ((id % k) + k) % k in
    // the affected oracle SQL (see tq14's day split / CLAUDE.md).
    val dir = "/root/testdata/sf0.001"
    val idCols = Seq(
      ("documents", "doc_id"), ("events", "event_id"),
      ("events", "user_id"), ("embeddings", "vec_id"),
      ("orders", "o_orderkey"), ("orders", "o_custkey"),
      ("lineitem", "l_orderkey"), ("lineitem", "l_suppkey"),
      ("lineitem", "l_partkey"), ("customer", "c_custkey"),
      ("supplier", "s_suppkey"), ("part", "p_partkey"))
    idCols.foreach { case (table, c) =>
      val neg = Tables.load(spark, dir, table)
        .filter(col(c).cast("long") < 0L).limit(1).count()
      assert(neg == 0L,
        s"$table.$c went NEGATIVE — every oracle mirroring pmod as bare" +
          " % on this column silently diverges; see this test's comment")
    }
  }

  test("logreg residual is grid-bounded for arbitrary logits") {
    // |r| = |⌊(y − σ)·2²⁰ + ½⌋| ≤ 2²⁰ because y − σ ∈ (−1, 1) — σ
    // saturates toward 0/1 at extreme logits (detexp overflows to a
    // huge positive, never NaN/negative), so the residual tops out at
    // the FULL grid, not the half-grid of the w₀ = 0 tick. This is the
    // bound the gradient-headroom claim (|c·r| ≤ n_tok·2²⁰) rests on;
    // checked across extreme logit magnitudes where detexp saturates.
    val zns = sample(Gen.oneOf(
      Gen.chooseNum(-1L << 40, 1L << 40),
      Gen.oneOf(0L, 1L, -1L, 1L << 50, -(1L << 50))), 60)
    val nts = sample(Gen.chooseNum(1L, 2000L), 60, seed = 11L)
    val ys = sample(Gen.oneOf(true, false), 60, seed = 13L)
    val grid = graft.operators.Classify.LrGrid
    val out = ys.zip(zns.zip(nts)).map { case (y, (zn, nt)) => (y, zn, nt) }
      .toDF("y", "zn", "nt")
      .select(graft.operators.Classify.residual($"y", $"zn", $"nt").as("r"))
      .collect().map(_.getLong(0))
    out.foreach(r => assert(math.abs(r) <= grid, s"residual $r out of bound"))
    // and the w0 = 0 tick sits exactly on the half grid
    val r0 = Seq((true, 0L, 10L), (false, 0L, 10L)).toDF("y", "zn", "nt")
      .select(graft.operators.Classify.residual($"y", $"zn", $"nt").as("r"))
      .collect().map(_.getLong(0)).toSeq
    assert(r0 == Seq(grid / 2, -(grid / 2)), r0.toString)
  }
}
