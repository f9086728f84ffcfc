package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.load`'s timestamp normalization across every physical `ts`
  * encoding the testdata generator has shipped. Round 8 proved the encoding
  * can change under the engine (TIMESTAMP(NANOS) → TIMESTAMP_MICROS/NTZ on
  * 2026-08-13), silently breaking every `unix_micros(ts)` consumer; this
  * spec makes the next regen a test failure instead of a vanished query.
  *
  * The loader branches on the SURFACED Spark type, so writing parquet with
  * a LongType / TimestampNTZType / TimestampType `ts` column exercises the
  * exact branches the real files hit (TIMESTAMP(NANOS) surfaces as long via
  * nanosAsLong; TIMESTAMP_MICROS isAdjustedToUTC=0 surfaces as NTZ).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // One instant, expressed per-encoding. 2021-03-04T05:06:07.123456Z.
  private val micros = 1614834367123456L

  private def writeFixture(dir: java.nio.file.Path, encode: String): Unit = {
    val df = encode match {
      case "nanos-as-long" =>
        Seq((1L, micros * 1000L)).toDF("id", "ts")
      case "ntz" =>
        Seq((1L, micros)).toDF("id", "us")
          .select($"id", timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      case "tz" =>
        Seq((1L, micros)).toDF("id", "us")
          .select($"id", timestamp_micros($"us").as("ts"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  for (enc <- Seq("nanos-as-long", "ntz", "tz")) {
    test(s"load normalizes a $enc ts column to session-TZ TIMESTAMP at the same instant") {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-ts-$enc")
      writeFixture(dir, enc)
      val loaded = Tables.load(spark, dir.toString, "events")
      assert(loaded.schema("ts").dataType === TimestampType, s"encoding $enc")
      val got = loaded.select(unix_micros($"ts")).as[Long].head()
      assert(got === micros, s"encoding $enc")
    }
  }

  test("load leaves non-ts long columns untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts-other")
    Seq((1L, 42L)).toDF("ts_like", "id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir.toString, "events")
    assert(loaded.schema("ts_like").dataType === LongType)
    assert(loaded.schema("id").dataType === LongType)
  }

  test("relation memo sweeps dead sessions' entries, keeps live ones (r18 verdict #3)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memo-evict")
    Seq((1L, 2L)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // a distinct SparkSession key over the shared context (stopping a
    // real context would kill every other suite's session, so the
    // stopped-session predicate itself can't fire in the test JVM —
    // the sweep mechanism is pinned through its parameterized form,
    // and load() wires it to sparkContext.isStopped)
    val other = spark.newSession()
    Tables.load(other, dir.toString, "events").count()
    assert(Tables.cachedFor(other) == 1)
    // live sessions survive the sweep a load triggers
    Tables.load(spark, dir.toString, "events").count()
    assert(Tables.cachedFor(other) == 1)
    assert(Tables.cachedFor(spark) >= 1)
    // "session stopped" → its entries (and only its) are removed
    Tables.sweepWhere(_ eq other)
    assert(Tables.cachedFor(other) == 0)
    assert(Tables.cachedFor(spark) >= 1)
  }
}
