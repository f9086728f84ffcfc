package graft

/** Whole-suite meta-guards over the driver contract: every query has
  * its DuckDB twin (the correctness gate can't silently weaken), no
  * query's physical plan contains a CartesianProduct — the one join
  * strategy that cannot survive a 100× scale-up under any partitioning
  * (BroadcastNestedLoopJoin over a 1-row stats side is fine and
  * intentional in several queries; CartesianProduct specifically means
  * two non-broadcastable sides pairing all-to-all) — and EVERY query's
  * plan shape matches a checked-in fingerprint golden (r15 verdict #5:
  * PlanAuditSpec hand-pins ~25 queries; this pins the other ~200
  * mechanically, so any plan regression — a lost broadcast, a new
  * shuffle, a window that appeared in a hot path — fails a spec
  * instead of waiting for a bench read).
  */
class PlanSweepSpec extends SparkSpec {

  test("every query has an oracle twin and every oracle has a query") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracleSql: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without query: $orphans")
  }

  // ONE sweep shared by the cartesian guard and the fingerprint golden:
  // building all ~220 plans at sf0.001 is the expensive part (lifecycle
  // queries run their index builds at construction time).
  private lazy val planStrings: Seq[(String, String)] = {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          fail(s"$name threw at plan time: ${e.getMessage}")
        }
      (name, plan)
    }
  }

  test("no query plans a CartesianProduct (sf0.001 sweep)") {
    val bad = planStrings.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    assert(bad.isEmpty, s"CartesianProduct in: $bad")
  }

  /** Compact shape fingerprint of a physical plan string: counts of the
    * node kinds whose appearance/disappearance IS a plan regression.
    * String-counted (not tree-walked) so AQE wrappers don't hide
    * anything — the initial plan prints in full.
    */
  private def fingerprint(plan: String): String = {
    def n(re: String) = re.r.findAllMatchIn(plan).size
    // "Exchange" alone would also match BroadcastExchange/ReusedExchange;
    // shuffles print as "Exchange <partitioning>"
    val shuffle = n("""(?m)(?<![a-zA-Z])Exchange (hash|range|Single)""")
    val rr = n("""Exchange RoundRobinPartitioning""")
    val bcast = n("""BroadcastExchange""")
    val window = n("""(?m)(?<![a-zA-Z])Window(?!GroupLimit) """) +
      n("""WindowGroupLimit""")
    val bhj = n("""BroadcastHashJoin""")
    val smj = n("""SortMergeJoin""")
    val bnlj = n("""BroadcastNestedLoopJoin""")
    val cp = n("""CartesianProduct""")
    s"s=$shuffle rr=$rr bc=$bcast w=$window bhj=$bhj smj=$smj bnlj=$bnlj cp=$cp"
  }

  test("plan-shape fingerprints match the committed golden (sf0.001)") {
    val goldenPath = java.nio.file.Paths.get(
      sys.props("user.dir"), "src", "test", "resources",
      "plan_fingerprints.txt")
    val current = planStrings.map { case (name, plan) =>
      (name, fingerprint(plan))
    }
    val render = current.map { case (k, v) => s"$k $v" }.mkString("\n") + "\n"
    if (!java.nio.file.Files.exists(goldenPath)) {
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      java.nio.file.Files.writeString(goldenPath, render)
      fail(s"golden created at $goldenPath — review and commit it")
    }
    val golden = new String(java.nio.file.Files.readAllBytes(goldenPath))
      .linesIterator.filter(_.nonEmpty).map { line =>
        val i = line.indexOf(' ')
        (line.substring(0, i), line.substring(i + 1))
      }.toMap
    val drift = current.flatMap { case (name, fp) =>
      golden.get(name) match {
        case Some(g) if g == fp => None
        case Some(g) => Some(s"$name: golden[$g] != current[$fp]")
        case None => Some(s"$name: NEW query — add to golden: $name $fp")
      }
    }
    val gone = (golden.keySet -- current.map(_._1).toSet).toSeq.sorted
      .map(n => s"$n: in golden but no longer in the suite")
    val problems = drift ++ gone
    assert(problems.isEmpty,
      "plan-shape drift (if deliberate, update src/test/resources/" +
        "plan_fingerprints.txt in the same diff):\n" +
        problems.mkString("\n"))
  }
}
