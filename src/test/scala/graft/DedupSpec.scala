package graft

import graft.operators.{Dedup, MergeLog}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedupFirstWins keeps first per key; NULL keys all pass through") {
    // ref: strict_deduplication.py:21-32 — rows lacking an id are kept.
    val df = Seq(
      (1, Some("a")), (2, Some("a")), (3, None), (4, None), (5, Some("b"))
    ).toDF("ord", "key")
    val out = col0[Int](
      Dedup.dedupFirstWins(df, $"key", $"ord").select($"ord").orderBy($"ord"))
    assert(out == Seq(1, 3, 4, 5))
  }

  test("titleHashDedup collapses case/whitespace variants, first wins") {
    // ref: strict_deduplication.py:35-45.
    val df = Seq((1, " Deep Learning "), (2, "deep learning"), (3, "Other"))
      .toDF("ord", "title")
    val out = col0[Int](
      Dedup.titleHashDedup(df, $"title", $"ord").select($"ord").orderBy($"ord"))
    assert(out == Seq(1, 3))
  }

  test("dedup is idempotent") {
    val df = Seq((1, "x"), (2, "x"), (3, "y")).toDF("ord", "k")
    val once = Dedup.dedupFirstWins(df, $"k", $"ord")
    val twice = Dedup.dedupFirstWins(once, $"k", $"ord")
    assert(once.collect().sortBy(_.getInt(0)).toSeq ==
      twice.collect().sortBy(_.getInt(0)).toSeq)
  }

  test("jaccardPairs finds near-identical token sets above threshold") {
    // ref: strict_deduplication.py:48-76 — token-set Jaccard >= 0.9.
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // identical
      (3L, "the quick brown fox jumps over the lazy dog"),       // 8/9 < 0.9
      (4L, "completely different words entirely")).toDF("id", "text")
    val pairs = rows(
      Dedup.jaccardPairs(df, $"id", $"text", 0.9)
        .select($"id_a", $"id_b").orderBy($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs == Seq((1L, 2L)))
    val loose = rows(
      Dedup.jaccardPairs(df, $"id", $"text", 0.85)
        .select($"id_a", $"id_b").orderBy($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(loose == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("containmentPairs: excerpt inside a larger doc scores 1.0; Jaccard misses it") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma"),                    // fully contained in 1
      (3L, "alpha beta nu"),                       // 2/3 < 0.9 vs 1
      (4L, "completely different words entirely")).toDF("id", "text")
    val pairs = rows(
      Dedup.containmentPairs(df, $"id", $"text", 0.9)
        .select($"id_a", $"id_b", $"inter", $"size_a", $"size_b",
          $"containment")
        .orderBy($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(pairs == Seq((2L, 1L, 3L, 3L, 12L, 1.0)))
    // the symmetric Jaccard path cannot see the same pair (3/12 = 0.25)
    assert(rows(Dedup.jaccardPairs(df, $"id", $"text", 0.9)
      .select($"id_a")).isEmpty)
  }

  test("containmentPairs: equal-size identical sets pair once, smaller id contained") {
    val df = Seq(
      (7L, "one two three four five six seven eight nine ten"),
      (9L, "ten nine eight seven six five four three two one")).toDF("id", "text")
    val pairs = rows(
      Dedup.containmentPairs(df, $"id", $"text", 0.9)
        .select($"id_a", $"id_b", $"containment"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs == Seq((7L, 9L, 1.0)))
  }

  test("containmentProbe: batch excerpts find corpus containers; batch-batch pairs never form") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "completely different words entirely")).toDF("id", "text")
    val batch = Seq(
      (100L, "alpha beta gamma"),                 // contained in 1
      (101L, "alpha beta gamma"),                 // identical batch twin: must not pair with 100
      (102L, "alpha nu xi")).toDF("id", "text")   // 1/3 < 0.9
    val got = rows(Dedup.containmentProbe(batch, corpus, $"id", $"text", 0.9)
      .select($"id_a", $"id_b", $"containment").orderBy($"id_a"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got == Seq((100L, 1L, 1.0), (101L, 1L, 1.0)))
  }

  test("containmentBest equals probe + (inter desc, size_b desc, id_b asc) top-1") {
    // multiple qualifying containers with ties on inter AND size_b so
    // every tie-break level of the struct-max is exercised
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),          // inter 3, size 4
      (2L, "alpha beta gamma delta"),          // identical: id tie -> smaller wins
      (3L, "alpha beta gamma delta epsilon"),  // inter 3, size 5 -> size wins
      (4L, "alpha beta gamma zeta eta theta"), // inter 3, size 6 -> biggest
      (5L, "totally unrelated words")).toDF("id", "text")
    val batch = Seq((100L, "alpha beta gamma")).toDF("id", "text")
    import org.apache.spark.sql.expressions.Window
    val byA = Window.partitionBy($"id_a").orderBy(
      $"inter".desc, $"size_b".desc, $"id_b")
    val viaProbe = rows(
      Dedup.containmentProbe(batch, corpus, $"id", $"text", 0.9)
        .withColumn("_rk", org.apache.spark.sql.functions.row_number().over(byA))
        .filter($"_rk" === 1)
        .select($"id_a", $"id_b", $"inter".cast("long").as("inter"),
          $"size_a", $"size_b", $"containment")
        .orderBy($"id_a"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val viaBest = rows(
      Dedup.containmentBest(batch, corpus, $"id", $"text", 0.9)
        .select($"id_a", $"id_b", $"inter".cast("long").as("inter"),
          $"size_a", $"size_b", $"containment")
        .orderBy($"id_a"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(viaBest == viaProbe)
    assert(viaBest == Seq((100L, 4L, 3L, 3L, 6L, 1.0)))
  }

  test("fuzzyDedup keeps the smallest-id survivor of each near-dup cluster") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "unrelated content here")).toDF("id", "text")
    val out = col0[Long](
      Dedup.fuzzyDedup(df, $"id", $"text", 0.9).select($"id").orderBy($"id"))
    assert(out == Seq(1L, 3L))
  }

  test("shingles produce word n-grams; short texts collapse to one shingle") {
    val df = Seq("a b c d", "a b").toDF("t")
    val out = col0[collection.Seq[String]](df.select(Dedup.shingles($"t", 3)))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b"))
  }

  test("minhashPairs: identical docs agree on full signature; disjoint do not collide") {
    val df = Seq(
      (1L, "spark is a unified analytics engine for large scale data"),
      (2L, "spark is a unified analytics engine for large scale data"),
      (3L, "ducks prefer ponds with quiet reeds and morning fog"))
      .toDF("id", "text")
    val got = rows(Dedup.minhashPairs(df, $"id", $"text"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got == Seq((1L, 2L, 1.0)))
  }

  test("minhash recalls CJK near-dups (per-char tokens, not one giant pseudo-token)") {
    // Two Chinese docs differing by one trailing ideograph, one unrelated.
    // Whitespace tokenization would collapse each doc to a single token →
    // single whole-doc shingle → zero signature agreement between the
    // near-dups. CJK per-char tokens shingle into char 3-grams, so the
    // near-dup pair shares most of its shingle set.
    val df = Seq(
      (1L, "我在中国大学学习计算机科学与技术专业"),
      (2L, "我在中国大学学习计算机科学与技术专门"),
      (3L, "的一是不了人的一是不了人的一是不了人"))
      .toDF("id", "text")
    val got = rows(Dedup.minhashPairs(df, $"id", $"text"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nearDup = got.find(p => p._1 == 1L && p._2 == 2L)
    assert(nearDup.exists(_._3 >= 0.5), s"near-dup pair missing or weak: $got")
    assert(!got.exists(p => p._2 == 3L && p._3 > 0.5), s"false positive: $got")
  }

  test("incrementalDedup equals the plain anti-join (nulls kept, dup corpus keys, FP-heavy filter)") {
    // corpus has duplicate keys and the filter is deliberately undersized
    // (expectedItems=2 over 6 keys, fpp 0.3) so bloom false positives are
    // near-certain — they must all be caught by the exact re-check.
    val corpus = Seq("a", "a", "b", "c", "d", "e", "f", "f")
      .toDF("key").withColumn("extra", lit(1))
    val batch = Seq(
      (1, Some("a")), (2, Some("x")), (3, None),
      (4, Some("f")), (5, Some("y")), (6, None)
    ).toDF("ord", "key")
    val got = Dedup.incrementalDedup(batch, corpus, "key",
        expectedItems = 2, fpp = 0.3)
      .select($"ord").as[Int].collect().sorted.toSeq
    val want = batch.join(corpus, Seq("key"), "left_anti")
      .select($"ord").as[Int].collect().sorted.toSeq
    assert(got == want)
    assert(got == Seq(2, 3, 5, 6)) // x, y new; NULL keys pass through
  }

  test("corpusBloom has no false negatives and BloomMightContain agrees interpreted vs codegen") {
    val keys = (1 to 200).map(i => s"key_$i")
    val corpus = keys.toDF("key")
    val bytes = Dedup.corpusBloom(corpus, "key", expectedItems = 200, fpp = 0.01)
    val probeDf = keys.toDF("k")
      .select(graft.expressions.BloomMightContain(spark, bytes, $"k").as("hit"))
    // every inserted key must probe true (bloom guarantee the
    // incremental-dedup pass-through path rests on): probe-vs-insert
    // byte identity holds through the broadcast hop
    assert(col0[Boolean](probeDf).forall(identity))
    // NULL key probes NULL (null-intolerant unary expression)
    val nullProbe = Seq(Option.empty[String]).toDF("k")
      .select(graft.expressions.BloomMightContain(spark, bytes, $"k"))
    assert(rows(nullProbe).head.isNullAt(0))
  }

  test("bloom artifact round-trips through save/load and a prebuilt filter dedups identically") {
    val corpus = (1 to 50).map(i => s"c$i").toDF("key")
    val batch = ((40 to 60).map(i => s"c$i") :+ "brand-new").toDF("key")
    val bytes = Dedup.corpusBloom(corpus, "key", expectedItems = 50, fpp = 0.05)
    val path = java.nio.file.Files.createTempFile("bloomspec", ".bin")
    try {
      Dedup.saveBloom(bytes, path.toString)
      val loaded = Dedup.loadBloom(path.toString)
      assert(loaded.toSeq == bytes.toSeq)
      val viaBuild = col0[String](
        Dedup.incrementalDedup(batch, corpus, "key", 50L, 0.05).orderBy($"key"))
      val viaArtifact = col0[String](
        Dedup.incrementalDedup(batch, corpus, "key", loaded).orderBy($"key"))
      assert(viaArtifact == viaBuild)
      assert(viaArtifact == ((51 to 60).map(i => s"c$i") :+ "brand-new").sorted)
    } finally java.nio.file.Files.deleteIfExists(path): Unit
  }

  test("mergeUpsert applies latest version, drops tombstoned keys, passes the rest") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    val delta = Seq(
      (2L, "b1", 1L, false), (2L, "b2", 2L, false), // competing upserts
      (3L, "c", 5L, true),                          // tombstone
      (9L, "new", 1L, false)                        // pure insert
    ).toDF("id", "v", "version", "deleted")
    val out = rows(Dedup.mergeUpsert(snap, delta, "id").orderBy($"id"))
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out == Seq((1L, "a"), (2L, "b2"), (4L, "d"), (9L, "new")))
  }

  test("mergeUpsert: a higher-version tombstone beats an upsert on the same key") {
    val snap = Seq((1L, "a")).toDF("id", "v")
    val delta = Seq((1L, "a2", 1L, false), (1L, "a2", 2L, true))
      .toDF("id", "v", "version", "deleted")
    assert(rows(Dedup.mergeUpsert(snap, delta, "id")).isEmpty)
  }

  test("mergeUpsert matches the union-then-window brute force") {
    val snap = (1L to 40L).map(i => (i, s"s$i")).toDF("id", "v")
    val delta = ((1L to 40L by 3L).flatMap(i =>
      Seq((i, s"d$i-1", 1L, false), (i, s"d$i-2", 2L, i % 6 == 1))))
      .toDF("id", "v", "version", "deleted")
    // brute force: snapshot rows as version 0, one global window
    val all = snap.select($"id", $"v", lit(0L).as("version"),
        lit(false).as("deleted"))
      .unionByName(delta)
    val brute = Dedup.dedupFirstWins(all, $"id", $"version".desc)
      .filter(!$"deleted").select($"id", $"v")
    val fast = Dedup.mergeUpsert(snap, delta, "id")
    assert(rows(fast.orderBy($"id")).map(r => (r.getLong(0), r.getString(1)))
      == rows(brute.orderBy($"id")).map(r => (r.getLong(0), r.getString(1))))
  }

  test("mergeUpsert passes NULL-key snapshot rows through untouched") {
    val snap = Seq((Some(1L), "a"), (None, "n1"), (None, "n2"))
      .toDF("id", "v")
    val delta = Seq((1L, "a2", 1L, false)).toDF("id", "v", "version", "deleted")
    val out = rows(Dedup.mergeUpsert(snap, delta, "id").orderBy($"v"))
      .map(_.getString(1))
    assert(out == Seq("a2", "n1", "n2"))
  }

  test("simhash16 is deterministic, bounded, and equal for equal texts") {
    val df = Seq("one two three", "one two three", "four five six").toDF("t")
    val out = col0[Int](df.select(Dedup.simhash16($"t")))
    assert(out(0) == out(1))
    assert(out.forall(h => h >= 0 && h < 65536))
    assert(out(0) != out(2))
  }

  test("repeatedGramStats counts grams shared across docs, not within") {
    val df = Seq(
      (1L, "a b c d e"),     // "a b c" shared with doc 2; "b c d", "c d e" not
      (2L, "a b c x y"),     // "a b c" shared with doc 1
      (3L, "p q r p q r p q"), // repeats internally ONLY → zero shared
      (4L, "zz")             // too short for grams → 0/0
    ).toDF("id", "t")
    val got = rows(Dedup.repeatedGramStats(df, $"id", $"t", 3).orderBy($"id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) == ((1L, 3L, 1L, 1.0 / 3)))
    assert(got(1) == ((2L, 3L, 1L, 1.0 / 3)))
    // within-doc repetition is NOT cross-doc sharing (distinct per doc)
    assert(got(2)._3 == 0L)
    assert(got(3) == ((4L, 0L, 0L, 0.0)))
  }

  test("boilerplate lines: per-doc-distinct count, blanks excluded, strip keeps structure") {
    val df = Seq(
      (1L, "intro one\nall rights reserved\n\nbody a"),
      (2L, "intro two\nall rights reserved\nall rights reserved\nbody b"),
      (3L, "intro three\nall rights reserved\n\nbody c"),
      (4L, "no footer here\nbody d")
    ).toDF("id", "t")
    // "all rights reserved" is in 3 docs (doc 2's repeat counts ONCE);
    // "" appears in 2 docs but blanks never qualify
    val bp = graft.operators.Dedup.boilerplateLineHashes(
      df, $"t", minDocs = 3L, maxLines = 10)
    assert(bp.length == 1)
    val cleaned = rows(df.select($"id",
      graft.operators.Dedup.stripLines($"t", bp).as("c")).orderBy($"id"))
      .map(_.getString(1))
    assert(cleaned(0) == "intro one\n\nbody a") // empty line survives
    assert(cleaned(1) == "intro two\nbody b")   // both copies stripped
    assert(cleaned(3) == "no footer here\nbody d") // untouched
  }

  test("boilerplate cap takes the most frequent lines with a lexicographic tie") {
    val df = (1L to 6L).map { i =>
      val always = "shared everywhere"
      val even = if (i % 2 == 0) "\neven line" else ""
      (i, s"head $i\n$always$even")
    }.toDF("id", "t")
    // cap 1 at minDocs 3: "shared everywhere" (6 docs) beats "even line" (3)
    val bp1 = graft.operators.Dedup.boilerplateLineHashes(df, $"t", 3L, 1)
    val bp2 = graft.operators.Dedup.boilerplateLineHashes(df, $"t", 3L, 10)
    assert(bp1.length == 1 && bp2.length == 2)
    assert(bp2.contains(bp1.head))
    val c = rows(df.select(
      graft.operators.Dedup.stripLines($"t", bp1).as("c")).orderBy($"c"))
      .map(_.getString(0))
    assert(c.forall(!_.contains("shared everywhere")))
    assert(c.exists(_.contains("even line")))
  }

  test("repeatedGramStats hot-gram split: identical at both threshold extremes") {
    // "t u v" is the stop-gram: present in every doc → hot at
    // threshold 1, cold at the default. Results must not depend on
    // which branch a gram takes.
    val df = Seq(
      (1L, "t u v a b c"), (2L, "t u v a b c"), (3L, "t u v x y z"),
      (4L, "t u v p q r"), (5L, "only unique words here now")
    ).toDF("id", "t")
    def run(thr: Long) =
      rows(Dedup.repeatedGramStats(df, $"id", $"t", 3, thr).orderBy($"id"))
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val allCold = run(Long.MaxValue)
    val allHot = run(1L)
    assert(allCold == allHot)
    // every ≥2-count gram hot → the shuffled branch is empty but the
    // broadcast probe still finds them
    assert(allHot.head._3 > 0L)
    // plan guard: the hot branch joins by BROADCAST — no partitioning
    // by gram for hot keys
    val plan = Dedup.repeatedGramStats(df, $"id", $"t", 3, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  /** Brute-force component labels for [[ccMatches]]: repeated min
    * propagation over the full edge list until fixpoint — O(V·E), fine
    * at spec scale, obviously correct.
    */
  private def bruteComponents(edges0: Seq[(Long, Long)]): Map[Long, Long] = {
    // mirror the operator contract: self-loops drop (singleton nodes
    // are the caller's coalesce case)
    val edges = edges0.filter(e => e._1 != e._2)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var lab = nodes.map(n => n -> n).toMap
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (x, y) =>
        val m = math.min(lab(x), lab(y))
        if (lab(x) != m) { lab += x -> m; changed = true }
        if (lab(y) != m) { lab += y -> m; changed = true }
      }
    }
    lab
  }

  private def ccMatches(edges: Seq[(Long, Long)]): Unit = {
    val got = rows(Dedup.connectedComponents(
        edges.toDF("a", "b"), $"a", $"b"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteComponents(edges))
  }

  test("connectedComponents matches brute force on chains, cycles, merges") {
    // long chain — the shape naive label propagation pays O(n) rounds
    // for; star rounds collapse it in O(log²)
    ccMatches((1L to 40L).sliding(2).map(s => (s(1), s.head)).toSeq)
    // two components, a cycle, duplicate + reversed + self edges
    ccMatches(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (5L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L)))
    // bridge added later in the list merges two grown components
    ccMatches(Seq((1L, 2L), (3L, 4L), (5L, 6L), (2L, 3L), (6L, 7L), (4L, 5L)))
  }

  test("connectedComponents: empty edge set yields empty labels") {
    val out = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), $"a", $"b")
    assert(out.columns.toSeq == Seq("id", "comp"))
    assert(out.count() == 0L)
  }

  test("LSH band index: probe matches minhashPairs cross pairs; append grows it; reads prune") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today ok"),
      (2L, "an entirely different document about distributed query engines"),
      (3L, "rain in spain falls mainly on the plain every single year"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today yes"),
      (2L, "an entirely different document about distributed query engines"),
      (11L, "nothing here resembles anything stored in the corpus at all"))
      .toDF("doc_id", "text")
    val idx = Scratch.dir("lsh_idx") + "/lsh"
    Dedup.saveLshBandIndex(corpus, $"doc_id", $"text", idx, buckets = 8)
    val probe = Dedup.probeLshBandIndex(spark, idx, batch, $"doc_id", $"text",
      buckets = 8)
    val got = rows(probe.orderBy($"id_batch", $"id_corpus"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // oracle: self-join of the union, restricted to cross (batch,corpus)
    // pairs with different ids
    val expected = rows(Dedup.minhashPairs(
        corpus.unionAll(batch.withColumn("doc_id", $"doc_id" + 100L)),
        $"doc_id", $"text"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .collect { // (corpus id < 100 < shifted batch id) = a cross pair
        case (a, b, e) if a <= 3L && b > 100L && (b - 100L) != a =>
          (b - 100L, a, e)
      }.toSet
    assert(got == expected)
    // the near-identical doc is found, the unrelated one is not
    assert(got.exists(p => p._1 == 10L && p._2 == 1L && p._3 > 0.3))
    assert(!got.exists(_._1 == 11L))
    // same id on both sides (doc 2 re-sent) is a self-match: excluded
    assert(!got.exists(p => p._1 == 2L && p._2 == 2L))
    // append: new corpus doc becomes probe-visible, old results stable
    Dedup.appendLshBandIndex(
      Seq((4L, "nothing here resembles anything stored in the corpus at all"))
        .toDF("doc_id", "text"),
      $"doc_id", $"text", idx, buckets = 8)
    val got2 = rows(Dedup.probeLshBandIndex(spark, idx, batch, $"doc_id",
        $"text", buckets = 8))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got2.exists(p => p._1 == 11L && p._2 == 4L && p._3 == 1.0))
    assert(got.subsetOf(got2))
    // plan guard: the index scan is partition-pruned by the batch's
    // bucket set and the batch side broadcasts (index never shuffles)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bp"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("band index appends are commit-gated: torn appends invisible, replays no-op") {
    import java.nio.file.{Files, Paths, Path}
    import scala.jdk.CollectionConverters._
    def walk[A](dir: String)(f: Iterator[Path] => A): A = {
      val s = Files.walk(Paths.get(dir))
      try f(s.iterator().asScala) finally s.close()
    }
    def snapshot(dir: String): Seq[(String, Long, Long)] =
      walk(dir)(_.filter(Files.isRegularFile(_))
        .map(p => (Paths.get(dir).relativize(p).toString, Files.size(p),
          Files.getLastModifiedTime(p).toMillis)).toSeq.sortBy(_._1))
    def rmTree(dir: String): Unit =
      walk(dir)(_.toSeq).sortBy(-_.getNameCount)
        .foreach(Files.delete(_))
    val idx = Scratch.dir("lsh_gate") + "/lsh"
    Dedup.saveLshBandIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog again today yes"))
        .toDF("doc_id", "text"), $"doc_id", $"text", idx, buckets = 8)
    val newDoc = Seq(
      (4L, "nothing here resembles anything stored in the corpus at all"))
      .toDF("doc_id", "text")
    assert(Dedup.appendLshBandIndex(newDoc, $"doc_id", $"text", idx,
      buckets = 8, srcBatch = 3L) == 3L)
    val batch = Seq(
      (11L, "nothing here resembles anything stored in the corpus at all"))
      .toDF("doc_id", "text")
    def probePairs() = rows(Dedup.probeLshBandIndex(spark, idx, batch,
        $"doc_id", $"text", buckets = 8))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probePairs().contains((11L, 4L)))
    // replaying a COMMITTED batch id is a complete no-op: same return,
    // not one byte of the index rewritten
    val before = snapshot(idx)
    assert(Dedup.appendLshBandIndex(newDoc, $"doc_id", $"text", idx,
      buckets = 8, srcBatch = 3L) == 3L)
    assert(snapshot(idx) == before, "replay must not touch the index")
    // a torn append (data landed, crash before the commit marker) is
    // INVISIBLE to probes...
    val spainDoc = Seq(
      (7L, "rain in spain falls mainly on the plain every single year"))
      .toDF("doc_id", "text")
    assert(Dedup.appendLshBandIndex(spainDoc, $"doc_id", $"text", idx,
      buckets = 8, srcBatch = 5L) == 5L)
    val batch7 = Seq(
      (17L, "rain in spain falls mainly on the plain every single year"))
      .toDF("doc_id", "text")
    def probe7() = rows(Dedup.probeLshBandIndex(spark, idx, batch7,
        $"doc_id", $"text", buckets = 8)).map(_.getLong(1)).toSet
    assert(probe7().contains(7L))
    // simulate the crash point: a torn append dies BEFORE its commit
    // marker, and the hwm water line is recorded only AFTER the commit
    // — so the crash state has neither (deleting only the marker would
    // fabricate a state no crash can produce: the line past an
    // uncommitted id)
    rmTree(s"$idx/commits/k=5")
    rmTree(s"$idx/hwm/k=5")
    assert(!probe7().contains(7L), "torn segment must be invisible")
    // ...and the replayed append REWRITES the torn segment, recommits
    assert(Dedup.appendLshBandIndex(spainDoc, $"doc_id", $"text", idx,
      buckets = 8, srcBatch = 5L) == 5L)
    assert(probe7().contains(7L))
    // a negative srcBatch auto-assigns the next free segment id
    assert(Dedup.appendLshBandIndex(
      Seq((8L, "completely fresh words unlike all previous sentences here"))
        .toDF("doc_id", "text"),
      $"doc_id", $"text", idx, buckets = 8) == 6L)
  }

  test("band index compaction: probe-invariant, one negative-gen segment, append keeps working") {
    val docsA = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today yes"),
      (3L, "rain in spain falls mainly on the plain every single year"))
      .toDF("doc_id", "text")
    val docsB = Seq(
      (4L, "nothing here resembles anything stored in the corpus at all"))
      .toDF("doc_id", "text")
    val docsC = Seq(
      (6L, "an entirely different document about distributed query engines"))
      .toDF("doc_id", "text")
    val idx = Scratch.dir("lsh_compact") + "/lsh"
    Dedup.saveLshBandIndex(docsA, $"doc_id", $"text", idx, buckets = 8)
    assert(Dedup.appendLshBandIndex(docsB, $"doc_id", $"text", idx,
      buckets = 8, srcBatch = 0L) == 0L)
    assert(Dedup.appendLshBandIndex(docsC, $"doc_id", $"text", idx,
      buckets = 8, srcBatch = 1L) == 1L)
    val batch = Seq(
      (11L, "nothing here resembles anything stored in the corpus at all"),
      (13L, "rain in spain falls mainly on the plain every single year"),
      (16L, "an entirely different document about distributed query engines"))
      .toDF("doc_id", "text")
    def probe() = rows(Dedup.probeLshBandIndex(spark, idx, batch,
        $"doc_id", $"text", buckets = 8)
      .select($"id_batch", $"id_corpus").orderBy($"id_batch", $"id_corpus"))
      .map(r => (r.getLong(0), r.getLong(1)))
    val before = probe()
    assert(before.map(_._1).toSet == Set(11L, 13L, 16L))
    // fold base + batch 0 (watermark 0): batch 1 stays its own segment
    assert(Dedup.compactLshBandIndex(spark, idx, upTo = 0L) == Some(-2L))
    assert(probe() == before, "compaction must be probe-invariant")
    def segDirs() = new java.io.File(s"$idx/bands").listFiles()
      .map(_.getName).toSet
    assert(segDirs() == Set("sb=-2", "sb=1"), segDirs().toString)
    // a second pass folds the merged gen + batch 1 into gen -3
    assert(Dedup.compactLshBandIndex(spark, idx, upTo = 1L) == Some(-3L))
    assert(probe() == before)
    assert(segDirs() == Set("sb=-3"), segDirs().toString)
    // nothing left to fold: no-op
    assert(Dedup.compactLshBandIndex(spark, idx, upTo = 99L).isEmpty)
    // the other half of the compact-vs-append race (the IVF spec's
    // twin): a blind replay of FOLDED batch 0 arrives after retirement
    // deleted its commit marker — the hwm water line must no-op it
    // (its rows live in gen -3), never double-append
    assert(Dedup.appendLshBandIndex(docsB, $"doc_id", $"text", idx,
      buckets = 8, srcBatch = 0L) == 0L)
    assert(probe() == before, "folded-id replay must not double-append")
    assert(segDirs() == Set("sb=-3"), segDirs().toString)
    // fresh appends keep working after compaction, with unpoisoned ids
    assert(Dedup.appendLshBandIndex(
      Seq((7L, "completely fresh words unlike all previous sentences here"))
        .toDF("doc_id", "text"),
      $"doc_id", $"text", idx, buckets = 8, srcBatch = 2L) == 2L)
    val after = probe()
    assert(before.toSet.subsetOf(after.toSet))
  }

  test("nearDupSink: streaming ingest dedups vs corpus, within batch, across batches; replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val idx = Scratch.dir("lsh_stream") + "/lsh"
    val outDir = Scratch.dir("lsh_stream_out")
    // bootstrap corpus: one known doc
    Dedup.saveLshBandIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog again today ok"))
        .toDF("doc_id", "text"),
      $"doc_id", $"text", idx, buckets = 8)
    val input = MemoryStream[(Long, String)]
    val q = Dedup.nearDupSink(
        input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", idx, outDir, threshold = 0.4, buckets = 8)
      .option("checkpointLocation", Scratch.dir("lsh_stream_ckpt"))
      .start()
    def landed(): Seq[Long] =
      col0[Long](spark.read.parquet(outDir).select($"doc_id").orderBy($"doc_id"))
    try {
      // batch 0: a corpus near-dup (dropped), an intra-batch dup pair
      // (collapsed to min id), a fresh doc (kept)
      input.addData(
        (10L, "the quick brown fox jumps over the lazy dog again today yes"),
        (11L, "completely novel content about adaptive query execution now"),
        (12L, "completely novel content about adaptive query execution now indeed"),
        (13L, "rain in spain falls mainly on the plain every single year"))
      q.processAllAvailable()
      assert(landed() == Seq(11L, 13L))
      // batch 1: near-dup of a batch-0 SURVIVOR (dropped — the index
      // grew), plus a fresh doc
      input.addData(
        (20L, "completely novel content about adaptive query execution ok"),
        (21L, "totally unrelated musing on parquet footer metadata layout"))
      q.processAllAvailable()
      assert(landed() == Seq(11L, 13L, 21L))
    } finally q.stop()
    // replay any batch id: the sb tag excludes that batch's own band
    // rows, so the recompute yields the same kept set at any crash point
    val replay0 = Dedup.nearDupIngest(spark, idx,
      Seq((10L, "the quick brown fox jumps over the lazy dog again today yes"),
        (11L, "completely novel content about adaptive query execution now"),
        (12L, "completely novel content about adaptive query execution now indeed"),
        (13L, "rain in spain falls mainly on the plain every single year"))
        .toDF("doc_id", "text"),
      $"doc_id", $"text", threshold = 0.4, batchId = 0L, buckets = 8)
    assert(col0[Long](replay0.select($"doc_id").orderBy($"doc_id")) ==
      Seq(11L, 13L))
  }

  test("mergeComponents: incremental maintenance equals full recompute") {
    val batch1 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    // batch 2 bridges two old components, extends one, adds a new one
    val batch2 = Seq((3L, 10L), (21L, 22L), (30L, 31L))
    val labels1 = Dedup.connectedComponents(batch1.toDF("a", "b"), $"a", $"b")
    val inc = rows(Dedup.mergeComponents(labels1, batch2.toDF("a", "b"),
        $"a", $"b"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = rows(Dedup.connectedComponents(
        (batch1 ++ batch2).toDF("a", "b"), $"a", $"b"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
    // composes: a third round over the incremental labels
    val batch3 = Seq((22L, 30L))
    val inc3 = rows(Dedup.mergeComponents(inc.toSeq.toDF("id", "comp"),
        batch3.toDF("a", "b"), $"a", $"b"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full3 = rows(Dedup.connectedComponents(
        (batch1 ++ batch2 ++ batch3).toDF("a", "b"), $"a", $"b"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc3 == full3)
  }

  test("editDistancePairs: exact within block; prefix-edit miss is the documented contract") {
    val d = Seq(
      (1L, "Adaptive Query Execution"),
      (2L, "Adaptive Query Executio"),  // tail deletion, dist 1
      (3L, "Adaptive Query Exec v2"),   // dist > 2 from every sibling
      (4L, "adaptive query execution"), // case fold -> dist 0 from 1
      (5L, "Bdaptive Query Execution"), // FIRST-char edit: other block
      (6L, "Unrelated Title Entirely")
    ).toDF("id", "t")
    val pairs = rows(Dedup.editDistancePairs(d, $"id", $"t", maxDist = 2)
        .orderBy($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 1)))
    assert(pairs.contains((1L, 4L, 0)))
    assert(pairs.contains((2L, 4L, 1)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "dist > maxDist")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "a first-char edit leaves the block — the stated recall tradeoff")
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("simhashPairs: only pairs within the Hamming radius; near-identical docs collide") {
    val df = Seq(
      (1L, "spark is a unified analytics engine for large scale data"),
      (2L, "spark is a unified analytics engine for large scale data"),
      (3L, "spark is a unified analytics engine for big scale data"),
      (4L, "ducks prefer ponds with quiet reeds and morning fog"))
      .toDF("id", "text")
    val got = rows(Dedup.simhashPairs(df, $"id", $"text", maxDist = 3)
      .orderBy($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // identical docs: distance 0
    assert(got.contains((1L, 2L, 0)))
    // every reported pair respects the radius and the exact distance
    val sh = rows(df.select($"id",
        graft.expressions.SimHash64($"text").as("s")))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (a, b, d) =>
      assert(d == java.lang.Long.bitCount(sh(a) ^ sh(b)) && d <= 3)
    }
    // completeness: every true pair within the radius is reported
    // (pigeonhole guarantee of the 4-band index)
    val all = sh.keys.toSeq.sorted.combinations(2).collect {
      case Seq(a, b) if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 3 =>
        (a, b, java.lang.Long.bitCount(sh(a) ^ sh(b)))
    }.toSet
    assert(got.toSet == all)
  }

  test("SimHash64: native == declarative; distinct-token invariance; near-dups land close") {
    val texts = Seq("spark is a unified analytics engine for data",
      "spark is a unified analytics engine for data ok",
      "data for engine analytics unified a is spark", // same token set
      "ducks prefer ponds with quiet reeds and morning fog", "", "一 二 三")
    val df = texts.toDF("t")
    val native = col0[Long](df.select(graft.expressions.SimHash64($"t")))
    val decl = col0[Long](df.select(Dedup.simhash64($"t")))
    assert(native == decl)
    // token-set semantics: permutation of the same tokens → same print
    assert(native(0) == native(2))
    // near-identical docs differ in few bits; unrelated in many
    assert(java.lang.Long.bitCount(native(0) ^ native(1)) <= 16)
    assert(java.lang.Long.bitCount(native(0) ^ native(3)) > 16)
  }

  test("clusterLabelSink: labels accrue across batches; bridges merge; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val idx = Scratch.dir("lbl_idx") + "/lsh"
    val labels = Scratch.dir("lbl_log")
    Dedup.saveLshBandIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      $"doc_id", $"text", idx, buckets = 8)
    MergeLog.init(Seq.empty[(Long, Long)].toDF("id", "comp"), labels)
    def snapshot(): Map[Long, Long] =
      rows(MergeLog.read(spark, labels, "id"))
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val input = MemoryStream[(Long, String)]
    val q = Dedup.clusterLabelSink(
        input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", idx, labels, threshold = 0.4, buckets = 8)
      .option("checkpointLocation", Scratch.dir("lbl_ckpt"))
      .start()
    try {
      // batch 0: an intra-batch near-dup pair + an unrelated singleton
      input.addData(
        (10L, "the quick brown fox jumps over the lazy dog again today ok"),
        (11L, "the quick brown fox jumps over the lazy dog again today yes"),
        (30L, "completely different content about spark execution engines"))
      q.processAllAvailable()
      assert(snapshot() == Map(10L -> 10L, 11L -> 10L))
      // batch 1: near-dup of doc 11 (found via the grown index) plus a
      // fresh singleton — the bridge extends the existing cluster
      input.addData(
        (20L, "a quick brown fox jumps over the lazy dog again today yes"),
        (40L, "rain in spain falls mainly on the plain every single year"))
      q.processAllAvailable()
      assert(snapshot() == Map(10L -> 10L, 11L -> 10L, 20L -> 10L))
    } finally q.stop()
    // replay batch 1 at any crash point: closure is idempotent, the
    // delta recomputes empty, appendDelta skips by batch id
    val replay = Dedup.maintainClusterLabels(spark, idx, labels,
      Seq((20L, "a quick brown fox jumps over the lazy dog again today yes"),
        (40L, "rain in spain falls mainly on the plain every single year"))
        .toDF("doc_id", "text"),
      $"doc_id", $"text", threshold = 0.4, batchId = 1L, buckets = 8)
    assert(rows(replay).map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(10L -> 10L, 11L -> 10L, 20L -> 10L))
    assert(snapshot() == Map(10L -> 10L, 11L -> 10L, 20L -> 10L))
  }

  test("cluster bridge re-elects keep-best survivor deterministically; replay stable") {
    // The registry leaves survivorship to downstream (d25's longest-wins
    // policy); this pins what happens when a LATER batch bridges two
    // existing clusters: the merged cluster RE-ELECTS a single survivor
    // (the prior per-cluster survivors deterministically lose), and a
    // crash-replay of the bridge batch reproduces labels and survivor
    // byte-identically. Texts share one contiguous 8-token run, so the
    // two clusters sit at shingle-Jaccard 1/3 (below the 0.5 threshold)
    // while the bridge doc (the concatenation) sits at 2/3 with each
    // side; numHashes = 64 / rowsPerBand = 1 makes candidate recall and
    // the estimate deterministic for these fixed texts.
    val idx = Scratch.dir("br_idx") + "/lsh"
    val labels = Scratch.dir("br_log")
    val ta = "alpha bravo charlie delta echo foxtrot " +
      "common ground shared words run here stays put"
    val tb = "common ground shared words run here stays put " +
      "zulu yankee xray whiskey victor uniform"
    val bridge = "alpha bravo charlie delta echo foxtrot " +
      "common ground shared words run here stays put " +
      "zulu yankee xray whiskey victor uniform"
    def maintain(batch: Seq[(Long, String)], batchId: Long) =
      Dedup.maintainClusterLabels(spark, idx, labels,
        batch.toDF("doc_id", "text"), $"doc_id", $"text",
        threshold = 0.5, batchId = batchId, buckets = 8,
        numHashes = 64, rowsPerBand = 1)
    Dedup.saveLshBandIndex(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      $"doc_id", $"text", idx, numHashes = 64, rowsPerBand = 1, buckets = 8)
    MergeLog.init(Seq.empty[(Long, Long)].toDF("id", "comp"), labels)
    def snapshot(): Map[Long, Long] =
      rows(MergeLog.read(spark, labels, "id"))
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // keep-best = d25's (n_chars desc, doc_id asc) window over the
    // registry's current labels: comp -> surviving doc
    def survivors(docs: Seq[(Long, String)]): Map[Long, Long] = {
      val lbl = MergeLog.read(spark, labels, "id")
        .select($"id".as("doc_id"), $"comp")
      rows(docs.toDF("doc_id", "text").join(lbl, "doc_id")
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy($"comp")
              .orderBy(length($"text").desc, $"doc_id")))
          .where($"rn" === 1).select($"comp", $"doc_id"))
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // batch 0: two disjoint clusters; the longer member survives each
    val b0 = Seq((10L, ta), (11L, ta + " extra"),
      (50L, tb), (51L, tb + " bonus"))
    maintain(b0, 0L)
    assert(snapshot() ==
      Map(10L -> 10L, 11L -> 10L, 50L -> 50L, 51L -> 50L))
    assert(survivors(b0) == Map(10L -> 11L, 50L -> 51L))
    // batch 1 bridges them: labels merge to the global min id, and the
    // merged cluster re-elects ONE survivor (the longest = the bridge);
    // batch 0's survivors 11 and 51 lose survivorship — RE-ELECTION is
    // the documented semantics, not per-batch survivor stability
    val b1 = Seq((60L, bridge))
    maintain(b1, 1L)
    val bridged = Map(10L -> 10L, 11L -> 10L, 50L -> 10L, 51L -> 10L,
      60L -> 10L)
    assert(snapshot() == bridged)
    assert(survivors(b0 ++ b1) == Map(10L -> 60L))
    // crash-replay of the bridge batch: closure idempotent, delta
    // recomputes empty, appendDelta skips by batch id — labels and the
    // re-elected survivor are stable
    maintain(b1, 1L)
    assert(snapshot() == bridged)
    assert(survivors(b0 ++ b1) == Map(10L -> 60L))
  }

  test("scrubRepeatedSpans: cross-doc spans removed, canonical copy kept, within-doc repeats untouched") {
    val df = Seq(
      (1L, "alpha beta gamma shared span here delta"),    // keeper (min id)
      (2L, "intro words shared span here outro tail"),
      (3L, "shared span here shared span here again ok"), // two hits
      (4L, "self repeat self repeat self repeat done"),   // within-doc only
      (5L, "nothing in common with anything else at")
    ).toDF("id", "t")
    def run(thr: Long) =
      rows(Dedup.scrubRepeatedSpans(df, $"id", $"t", n = 3,
          hotThreshold = thr).orderBy($"id"))
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val out = run(100000L)
    assert(out == Seq(
      (1L, 7L, 0L, "alpha beta gamma shared span here delta"),
      (2L, 7L, 3L, "intro words outro tail"),
      (3L, 8L, 6L, "again ok"),
      (4L, 7L, 0L, "self repeat self repeat self repeat done"),
      (5L, 7L, 0L, "nothing in common with anything else at")))
    // hot/cold split must not change results (every repeated gram hot)
    assert(run(1L) == out)
  }

  test("dupClusters labels every row; kept = canonical row per cluster") {
    val df = Seq(
      // A~B and B~C collide in LSH buckets; A~C need not — the closure
      // must still put all three in one cluster
      (1L, "the quick brown fox jumps over the lazy dog again today ok"),
      (2L, "the quick brown fox jumps over the lazy dog again today yes"),
      (3L, "a quick brown fox jumps over the lazy dog again today yes"),
      (40L, "completely different content about spark execution engines"),
      (50L, "nothing like anything else in this tiny corpus at all now")
    ).toDF("doc_id", "text")
    val out = rows(Dedup.dupClusters(df, $"doc_id", $"text", threshold = 0.4)
      .orderBy($"doc_id"))
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("cluster_id")),
        r.getLong(r.fieldIndex("cluster_size")),
        r.getBoolean(r.fieldIndex("kept"))))
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 40L, 50L))
    // every row labeled; singletons label themselves and are kept
    assert(out.filter(_._1 >= 40L).forall(t => t._2 == t._1 && t._3 == 1L && t._4))
    // the near-dup trio collapses to one cluster, canonical = min id
    val trio = out.filter(_._1 <= 3L)
    assert(trio.forall(_._2 == 1L) && trio.forall(_._3 == 3L))
    assert(trio.map(_._4) == Seq(true, false, false))
    // exactly one kept row per cluster id
    val byCluster = out.groupBy(_._2).values
    assert(byCluster.forall(_.count(_._4) == 1))
  }
}
