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
}
