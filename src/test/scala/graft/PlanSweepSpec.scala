package graft

/** Whole-suite meta-guards over the driver contract: every query has
  * its DuckDB twin (the correctness gate can't silently weaken), and no
  * query's physical plan contains a CartesianProduct — the one join
  * strategy that cannot survive a 100× scale-up under any partitioning.
  * (BroadcastNestedLoopJoin over a 1-row stats side is fine and
  * intentional in several queries; CartesianProduct specifically means
  * two non-broadcastable sides pairing all-to-all.)
  */
class PlanSweepSpec extends SparkSpec {

  test("every query has an oracle twin and every oracle has a query") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracleSql: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without query: $orphans")
  }

  test("no query plans a CartesianProduct (sf0.001 sweep)") {
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, dir).queryExecution.executedPlan.toString
          catch { case e: Throwable =>
            fail(s"$name threw at plan time: ${e.getMessage}")
          }
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(bad.isEmpty, s"CartesianProduct in: $bad")
  }
}
