package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional shuffle-partition override (defaults to cpus): at a fixed
    // partition count, per-partition sort/fetch cost grows superlinearly
    // with data — on a real cluster partitions scale with input size, so
    // scale probes need this knob to separate engine cost from the
    // local-mode fixed-32 artifact (r18 n2 probe)
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/scan paths so the first measured query
    // doesn't absorb session start-up; run in sorted order for
    // run-to-run comparability.
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    // optional args = query-name filter for iterating on hotspots; the
    // driver invokes with no args and gets the full suite.
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val ordered = selected.toSeq.sortBy(_._1)
    // System load average (1-min, process count) read before each rep:
    // three rounds of bench artifacts have been poisoned by external
    // machine load, so the artifact carries the evidence — a rep taken
    // at load >> cpus is discountable mechanically instead of by a
    // human re-running the suite.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def sysLoad: Double =
      math.floor(osBean.getSystemLoadAverage * 100) / 100
    // CPU-steal sampling (r17): four same-code full-suite runs spanned
    // 310-370 s at recorded loadavg meds 3.3-4.9 — run-to-run totals
    // vary beyond what THIS vm's runnable-thread count explains, which
    // is the signature of hypervisor co-tenancy. loadavg cannot see
    // stolen cycles; /proc/stat's steal field can. Sampled before and
    // after each rep, reported as percent-of-jiffies per rep, with the
    // suite med/p90 on the totals line — a driver window with steal>0
    // is externally contended, CASE CLOSED from the artifact alone.
    def stealRead(): (Long, Long) = try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        // jiffy total = user..steal (first 8 fields) ONLY: guest/
        // guest_nice are already accounted inside user/nice, so summing
        // them double-counts guest jiffies and understates steal% on
        // VM-hosting machines (ADVICE r17)
        (if (f.length > 7) f(7) else 0L, f.take(8).sum)
      } finally src.close()
    } catch { case _: Throwable => (-1L, -1L) }
    def stealPct(a: (Long, Long), b: (Long, Long)): Double =
      if (a._1 < 0 || b._1 < 0 || b._2 <= a._2) -1.0
      else math.floor((b._1 - a._1) * 1000.0 / (b._2 - a._2)) / 10
    // Fixed-work calibration spin (r19, r18 verdict next-round 1c):
    // same-code driver totals have spanned 250-349 s across windows
    // that load and steal telemetry CANNOT distinguish (r18 closed at
    // steal [0,0] both locally and at the driver, 20% apart). A
    // fixed-work single-thread spin timed before each rep measures the
    // one thing loadavg and /proc/stat both miss: how fast a core
    // actually executes in this window (frequency/thermal era,
    // co-tenant cache pressure). Med/p90 ride the totals line as
    // "cal":[m,p] (ms, 1dp) — a window with cal far above the quiet
    // baseline (~2-4 ms on this class of core) is mechanically
    // discountable from the artifact alone. Runs OUTSIDE every timer.
    def calSpin(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < 4000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42L) System.err.print("") // defeat dead-code elimination
      math.floor((System.nanoTime() - t0) / 1e5) / 10
    }
    // warm the spin's JIT so rep samples measure the machine, not C2
    var calWarm = 0; while (calWarm < 20) { calSpin(); calWarm += 1 }
    // Storage/eviction telemetry (r15 verdict #2): per-rep peak storage
    // memory and eviction counters next to the per-rep load, so the
    // recurring "untouched heavy query 2-3× slower at the driver"
    // anomaly (d4 r14, d22 r15) is attributable from the artifact —
    // evictDisk > 0 means the rep's persists were thrashing under
    // memory pressure; zero with elevated load means a hot machine.
    val telem = new BenchTelemetry
    spark.sparkContext.addSparkListener(telem)
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        // Full-evaluation sink: a count() lets Catalyst prune every
        // unreferenced projection expression, timing a skeleton plan.
        // Materializing the InternalRow iterator forces all columns.
        fn(spark, sfDir).queryExecution.toRdd
          .foreachPartition(it => it.foreach(_ => ()))
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
          -1.0
      }
    }
    // Between queries, restore isolation (r13): drop every cached
    // Dataset and persistent RDD (superseded localCheckpoint frames
    // included — Dataset.unpersist misses those) and let the context
    // cleaner reclaim dead shuffle/broadcast state via an explicit GC.
    // BENCH_r12 measured the alternative: 208×2 queries in one JVM
    // accumulated enough leaked storage that queries sitting after the
    // checkpoint-heavy block in suite order read 6–29× slower than the
    // same code isolated — the artifact was measuring leaked state,
    // not code. The scrub runs OUTSIDE every timer, so per-query
    // numbers are unaffected except by the isolation it restores.
    // blocking scrub (Frames.scrubSession) runs OUTSIDE every timer, so
    // waiting is free — an async unpersist could still be dropping
    // blocks when the next query's timer starts
    def scrub(): Unit = Frames.scrubSession(spark)
    // min of two runs: single-shot timings swing ±2-8× with machine
    // load, making round-over-round comparison meaningless; the min is
    // the stable "code speed" estimate and stays comparable. The two
    // reps are INTERLEAVED (full pass over every query, then a second
    // full pass) so a transient load spike lands on at most one rep of
    // any query — back-to-back reps were both poisoned by the same
    // spike, indistinguishable from a real regression.
    val calSamples = scala.collection.mutable.ArrayBuffer[Double]()
    def pass() = ordered.map { case (name, fn) =>
      val l = sysLoad
      calSamples += calSpin() // outside the timer, one sample per rep
      val st0 = stealRead()
      telem.reset()
      val t = timeOne(name, fn)
      // the block-update events post async; drain before the snapshot
      // so the rep's own tail events can't bleed into the next rep
      // (drain and snapshot both run OUTSIDE the timer)
      org.apache.spark.graftbridge.Bus.drain(spark.sparkContext)
      val m = telem.snapshot()
      val sp = stealPct(st0, stealRead())
      scrub()
      (name, t, l, m, sp)
    }
    val pass1 = pass()
    val pass2 = pass()
    val results = pass1.zip(pass2).map {
      case ((name, t1, l1, m1, s1), (_, t2, l2, m2, s2)) =>
        name -> (Seq(t1, t2), Seq(l1, l2), Seq(m1, m2), Seq(s1, s2))
    }
    val mins = results.map { case (k, (ts, _, _, _)) =>
      k -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }.toMap
    // Suite-level load summary for the TOTALS line (r16 verdict #1):
    // the per-rep load series lives on bench_diag, which the driver's
    // 2000-char tail cuts — so the hot-window question ("is this
    // round's drift machine heat or code?") must be answerable from
    // the surviving final line alone. med/p90 over all per-rep 1-min
    // samples, ~22 chars.
    def medP90(xs: Seq[Double]): String = {
      // empty sample set (e.g. /proc/stat unreadable → every steal
      // sample filtered out) must NOT read as a measured [0.0,0.0]
      // "genuinely uncontended" — emit the sentinel instead (ADVICE r17)
      if (xs.isEmpty) return "[-1,-1]"
      val v = xs.sorted
      def pct(p: Double): Double =
        v(math.min(v.size - 1, (v.size * p).toInt))
      s"[${pct(0.5)},${pct(0.9)}]"
    }
    val loadSummary = medP90(results.flatMap(_._2._2))
    // per-rep CPU-steal med/p90 (percent; -1 samples = /proc/stat
    // unavailable, excluded): steal > 0 at the driver = hypervisor
    // co-tenancy that loadavg cannot see
    val stealSummary = medP90(results.flatMap(_._2._4).filter(_ >= 0))
    val qs = mins.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Both raw timings per query: a loaded machine shows as BOTH runs
    // slow across the board, distinguishable from a real code regression
    // without a re-run. The min stays the headline comparison number.
    val runs = results.map { case (k, (ts, _, _, _)) =>
      s"\"" + k + "\":[" + ts.mkString(",") + "]"
    }.mkString("{", ",", "}")
    // 1-min system load sampled immediately before each rep: a rep taken
    // at load far above the allotted cpus is externally contaminated and
    // its timing should be discounted by the reader.
    val loads = results.map { case (k, (_, ls, _, _)) =>
      s"\"" + k + "\":[" + ls.mkString(",") + "]"
    }.mkString("{", ",", "}")
    // Full per-rep storage telemetry: [peakMB, evictDisk, drops] per rep.
    val memFull = results.map { case (k, (_, _, ms, _)) =>
      s"\"" + k + "\":[" +
        ms.map(m => s"[${m.peakMB},${m.evictDisk},${m.drops}]")
          .mkString(",") + "]"
    }.mkString("{", ",", "}")
    // Per-rep task-metric decomposition for the slowest queries (r16
    // verdict #2): [runMs, cpuMs, gcMs, shufWriteMs] per rep. With the
    // rep's wall time (on "runs") and the slot count, one read
    // separates CPU starvation (runMs >> cpuMs), GC, shuffle-write IO,
    // and scheduler gap (wall*slots >> runMs) — the d4/d22/tc3
    // driver-vs-local anomalies become attributable from bench_diag
    // alone. Top 20 by min keeps the line bounded; the anomaly class
    // is always a heavy query.
    val slowest = mins.toSeq.sortBy(-_._2).take(20).map(_._1).toSet
    val taskFull = results.filter(r => slowest(r._1)).map { case (k, (_, _, ms, _)) =>
      s"\"" + k + "\":[" +
        ms.map(m => s"[${m.runMs},${m.cpuMs},${m.gcMs},${m.shufWriteMs}]")
          .mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = mins.values.filter(_ >= 0).sum
    // The driver captures only the LAST ~2000 characters of output, so the
    // headline payload (per-query mins) must fit the tail: with 125+
    // queries the full-name map alone is ~3 KB (round-8's artifact lost it
    // behind the runs/loads diagnostics for exactly this reason). The
    // mins line ([[minsLine]]) is SELF-BOUNDING; the FINAL line carries
    // only totals + failures (< 250 chars at any suite size), so both
    // always fit the driver's ~2000-char tail together and the final
    // line stays json-parseable however many queries the suite grows
    // to. Full 3-decimal mins/runs/loads stay on the bench_diag line.
    val fails = mins.toSeq.filter(_._2 < 0).map(_._1).sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val failMap = mins.toSeq.filter(_._2 < 0).map(_._1).sorted
      .map("\"" + short(_) + "\":-1").mkString("{", ",", "}")
    val steals = results.map { case (k, (_, _, _, sps)) =>
      s"\"" + k + "\":[" + sps.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val sfName = new java.io.File(sfDir).getName
    println(s"""{"metric":"bench_diag","queries_full":$qs,"runs":$runs,"loads":$loads,"mem":$memFull,"steals":$steals,"tasks":$taskFull}""")
    val minsStr = minsLine(mins.toSeq)
    val calSummary = medP90(calSamples.toSeq)
    val totalStr = s"""{"metric":"total","value":$total,"unit":"sec","cpus":"$cpus","sf":"$sfName","n_queries":${mins.size},"load":$loadSummary,"steal":$stealSummary,"cal":$calSummary,"fails":$fails,"queries":$failMap}"""
    // The compact mem line sits in the driver's ~2000-char stdout tail
    // above the mins line; its budget is whatever the tail has left
    // after the two must-fit lines, computed EXACTLY (not hoped about).
    // memLine returns "" when the budget can't even hold its header
    // (a high-failure round's long totals line) — printing a blank
    // line would waste tail chars, so skip it entirely and let the two
    // must-fit lines keep the whole
    // Top-3 slowest queries' min-rep task metrics ON THE TAIL (r17
    // verdict #5): bench_diag's full [run,cpu,gc,shufWrite] decomposition
    // doesn't survive the driver's 2000-char cut, so attributing a slow
    // driver query (CPU-starved vs scheduler-bound) needed a local
    // re-run. `id:runS:cpuS` — task-time sums in seconds (1dp) from the
    // rep that produced the min — rides the mem line: with the wall on
    // the mins line and the slot count on totals, one tail read
    // separates CPU-priced (cpuS ≈ runS, many core-seconds per wall
    // second) from scheduler-bound sequential DAGs (runS ≪ wall×slots).
    val slowStr = mins.toSeq.filter(_._2 >= 0).sortBy(-_._2).take(3)
      .map(_._1).flatMap { k =>
        results.find(_._1 == k).map { case (_, (ts, _, ms, _)) =>
          val valid = ts.zipWithIndex.filter(_._1 >= 0)
          val i = if (valid.isEmpty) 0 else valid.minBy(_._1)._2
          val m = ms(i)
          def s1(ms: Long): Double = math.floor(ms / 100.0) / 10
          s"${short(k)}:${s1(m.runMs)}:${s1(m.cpuMs)}"
        }
      }.mkString(",")
    val memBudget = 2000 - minsStr.length - totalStr.length - 8
    val memStr = memLine(
      results.map { case (k, (_, ls, ms, _)) =>
        (k, ms.map(m => (m.peakMB, m.evictDisk, m.drops)), ls)
      }, memBudget, slowStr)
    if (memStr.nonEmpty) println(memStr)
    println(minsStr)
    println(totalStr)
    spark.stop()
  }

  /** Every query name's prefix before the first '_' is unique
    * (q1, g4, tq5, …) — the bench artifact's short id. */
  def short(name: String): String = name.takeWhile(_ != '_')

  /** The per-query mins line, provably tail-safe at ANY suite size: it
    * sits directly above the final totals line inside the driver's
    * ~2000-char stdout tail, so its length is HARD-BOUNDED here rather
    * than hoped about. Entries sort by short id and encode as integer
    * centiseconds. `fmt` says how `q` is packed:
    *  - `"packed"` — `id:centisec` pairs, comma-joined (~8 chars/query;
    *    fits up to ~190 queries);
    *  - `"csv"` — the centisec values alone, comma-joined in sorted-
    *    short-id order (the ids are recoverable from the query set,
    *    and the bench_diag line carries the full-name map) — ~4.5
    *    chars/query, fitting past 350 queries.
    * The switch triggers when the packed payload would exceed
    * [[MinsBudget]] chars, keeping line length < MinsBudget + ~60
    * header chars < 1800 at any n — spec-pinned at 280 queries.
    */
  val MinsBudget = 1650

  /** The compact tail-visible storage line (r15 verdict #2): per query
    * `shortid:peakMB:evictDisk:load` — peakMB/evictDisk are the max
    * over reps, and load is the 1-min system load at the start of THE
    * REP THAT PRODUCED THEM (most evictions, then highest peak; 1
    * decimal) — so the entry's heat context belongs to the same rep as
    * its eviction/peak evidence, not to whichever rep happened to be
    * hottest (r17 review: a cool-rep eviction next to the other rep's
    * high load would read as machine heat, the exact misattribution
    * the `:load` field exists to prevent). Sorted evictions-first then
    * peak-desc so
    * the anomaly evidence survives however tight the budget — entries
    * are appended only while they fit `budget` chars of payload, and a
    * `"cut":N` suffix names how many were cut (the no-silent-caps
    * rule). Full per-rep triples live on bench_diag. Returns "" when
    * `budget` can't hold even the header+suffix (a long totals line on
    * a high-failure round — ADVICE r17: emitting the header anyway
    * would push the three-line tail past the driver's window).
    */
  def memLine(mem: Seq[(String, Seq[(Long, Long, Long)], Seq[Double])],
              budget: Int, slow: String = ""): String = {
    val entries = mem.map { case (k, ms, ls) =>
      val pk = if (ms.isEmpty) 0L else ms.map(_._1).max
      val ev = if (ms.isEmpty) 0L else ms.map(_._2).max
      val worst =
        if (ms.isEmpty) -1
        else ms.zipWithIndex.maxBy { case ((p, e, _), _) => (e, p) }._2
      val ld =
        if (worst < 0 || worst >= ls.size) 0.0
        else math.floor(ls(worst) * 10) / 10
      (short(k), pk, ev, ld)
    }.sortBy { case (id, pk, ev, _) => (-ev, -pk, id) }
    // the slow field (top-3 mins' `id:runS:cpuS` task seconds, r17
    // verdict #5) rides inside the header so the exact budget
    // accounting below covers it too
    val slowField = if (slow.isEmpty) "" else s""""slow":"$slow","""
    val header = s"""{"metric":"mem","unit":"id:peakMB:evictDisk:load","n":${mem.size},$slowField"q":""""
    // closing quote + `,"cut":NNNN` + `}` worst case
    val room = budget - header.length - 16
    if (room <= 0) return ""
    val sb = new StringBuilder
    var kept = 0
    entries.foreach { case (id, pk, ev, ld) =>
      val piece = (if (kept == 0) "" else ",") + s"$id:$pk:$ev:$ld"
      if (sb.length + piece.length <= room) { sb.append(piece); kept += 1 }
    }
    val cut = entries.size - kept
    val suffix = if (cut > 0) s""","cut":$cut""" else ""
    header + sb.toString + "\"" + suffix + "}"
  }

  def minsLine(mins: Seq[(String, Double)]): String = {
    def cs(v: Double): String = if (v < 0) "-1" else (v * 100).round.toString
    val sorted = mins.sortBy(p => short(p._1))
    val packed = sorted.map { case (k, v) => short(k) + ":" + cs(v) }
      .mkString(",")
    val (fmt, payload) =
      if (packed.length <= MinsBudget) ("packed", packed)
      else ("csv", sorted.map(p => cs(p._2)).mkString(","))
    s"""{"metric":"mins","unit":"centisec","fmt":"$fmt","n":${mins.size},"q":"$payload"}"""
  }
}
