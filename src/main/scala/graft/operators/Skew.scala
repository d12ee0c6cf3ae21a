package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join patterns for hot keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; salting
  * is the explicit form for when a key is so hot that even split
  * partitions overwhelm a task (the classic power-law user at
  * 100 TB). The salt is hash-derived from a row-unique column —
  * deterministic, so results are reproducible (never `rand()` in a
  * plan that feeds a correctness gate).
  */
object Skew {
  /** Join a skewed fact to a dim on `key`, spreading each fact key
    * over `salts` sub-partitions and replicating the dim rows to
    * match. Equivalent rows to a plain inner join on `key`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFrom: Column, salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltFrom), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation for hot grouping keys: phase 1
    * aggregates (key, salt) — the hot key's rows spread over `salts`
    * tasks — phase 2 merges the per-salt partials. Only works for
    * aggregates with a partial/merge decomposition (sum, count, min,
    * max: exactly what Spark's own partial aggregation exploits; this
    * extends it when even one key's MERGED partials overwhelm the
    * single reducer that hash partitioning would give it). */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
                saltFrom: Column, salts: Int = 8): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(saltFrom), lit(salts)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pn")).as("n"))
}
