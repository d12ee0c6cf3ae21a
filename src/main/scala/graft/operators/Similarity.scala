package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over an embedding column (array<float>).
  *
  * Brute-force is the exact baseline: broadcast the (small) query
  * set against the corpus scan — one pass, no shuffle of the corpus,
  * top-k per query via per-partition partial ranking. The LSH path
  * is the 100 TB shape: bucket the corpus once (single long key),
  * search only within the query's bucket.
  */
object Similarity {
  /** Exact top-k nearest by cosine for each query vector.
    * The query side is broadcast; the corpus is scanned once. */
  def bruteForceTopK(embs: DataFrame, queries: DataFrame, k: Int = 5)
      : DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val cand = embs.select(col("vec_id").as("neighbor_id"), col("embedding"))
    cand.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim",
        GraftFunctions.cosine_sim(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
  }

  /** Approximate top-k: candidates restricted to the query's
    * random-hyperplane LSH bucket plus every bucket within hamming
    * distance 1 (multi-probe: planes+1 probes per query — the
    * standard recall/cost lever; the corpus side stays single-bucket
    * so the index is built once). */
  def lshTopK(embs: DataFrame, queries: DataFrame, planes: Int = 6,
              k: Int = 5): DataFrame = {
    val probeBuckets = array(
      (col("_b") +: (0 until planes).map(j =>
        col("_b").bitwiseXOR(lit(1L << j)))): _*)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      GraftFunctions.rhp_lsh(col("embedding"), planes).as("_b"))
      .withColumn("bucket", explode(probeBuckets))
      .drop("_b")
    val cand = embs.select(col("vec_id").as("neighbor_id"), col("embedding"),
      GraftFunctions.rhp_lsh(col("embedding"), planes).as("bucket"))
    cand.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim",
        GraftFunctions.cosine_sim(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
  }
}
