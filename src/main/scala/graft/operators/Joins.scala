package graft.operators

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
}
