package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling primitives. Like the stratified sampler in
  * [[TextAnalysis]], these draw no random numbers: the sample is a
  * pure function of row identity (md5 of the id), so it is
  * reproducible across engines, cluster sizes, and reruns — the
  * property that makes a 100 TB sample auditable.
  */
object Sampling {
  /** Uniform k-per-key sample: the k rows with the smallest
    * md5(id) per key — equivalent in distribution to a per-key
    * reservoir sample, but deterministic. One shuffle on the key;
    * the per-partition top-k heap (TakeOrdered-style window rank)
    * never materializes a full per-key sort at scale beyond the
    * shuffle's own ordering. */
  def samplePerKey(df: DataFrame, keyCol: String, idCol: String,
                   k: Int): DataFrame =
    df.withColumn("_h", md5(col(idCol).cast("string")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keyCol).orderBy(col("_h"), col(idCol))))
      .filter(col("_rn") <= k)
      .drop("_h", "_rn")
}
