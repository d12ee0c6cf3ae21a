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

  /** IVF (inverted-file) ANN: the corpus is coarse-quantized to its
    * nearest of `nlist` centroids; each query probes only the
    * `nprobe` nearest centroid lists. The second classic ANN scale
    * path next to LSH: recall is tuned by nprobe instead of
    * hamming-probe width, and list sizes adapt to the data
    * distribution (LSH buckets don't).
    *
    * Centroids here are the `nlist` lowest-id corpus vectors —
    * deterministic and cheap; swap in k-means iterations offline for
    * better list balance (the plan shape is identical). Assignment is
    * a broadcast of nlist centroid rows against one corpus scan with
    * a map-side-partial max_by — the corpus shuffles once, as (id,
    * vector, centroid) — and the probe join shuffles only candidate
    * lists matching a query probe. */
  /** Lloyd-refined coarse centroids for IVF: seed with the first
    * nlist vectors, then `iters` rounds of assign → recompute-mean.
    * Means are computed with the scaled-integer trick (floor(x*1e6)
    * BIGINT sums) so every round is order-independent and the
    * resulting index is bit-identical across cluster sizes — an
    * IVF index build must be reproducible or every downstream probe
    * result changes between builds. Each round is one broadcast
    * assign + two narrow-key shuffles over (nlist x dim) rows; a
    * centroid whose list empties is dropped (standard Lloyd). */
  def kmeansCentroids(embs: DataFrame, nlist: Int = 16, iters: Int = 3)
      : DataFrame = {
    var centroids = embs.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = embs.crossJoin(broadcast(centroids))
        .withColumn("c_sim",
          GraftFunctions.cosine_sim(col("embedding"), col("c_emb")))
        .groupBy("vec_id")
        .agg(max_by(col("centroid_id"), struct(col("c_sim"), -col("centroid_id")))
          .as("centroid_id"),
          first(col("embedding")).as("embedding"))
      centroids = assigned
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg(sum(floor(col("x").cast("double") * 1e6).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .groupBy("centroid_id")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"),
            (col("s").cast("double") / col("n") / 1e6).cast("float").as("m")))),
          e => e.getField("m")).as("c_emb"))
        .localCheckpoint()
    }
    centroids
  }

  def ivfTopK(embs: DataFrame, queries: DataFrame, nlist: Int = 16,
              nprobe: Int = 4, k: Int = 5): DataFrame =
    ivfTopKWith(embs, queries,
      embs.filter(col("vec_id") < nlist)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb")),
      nprobe, k)

  /** IVF probe against Lloyd-refined centroids ([[kmeansCentroids]]). */
  def ivfTopKRefined(embs: DataFrame, queries: DataFrame, nlist: Int = 16,
                     nprobe: Int = 4, k: Int = 5, iters: Int = 3): DataFrame =
    ivfTopKWith(embs, queries, kmeansCentroids(embs, nlist, iters), nprobe, k)

  private def ivfTopKWith(embs: DataFrame, queries: DataFrame,
                          centroidsIn: DataFrame, nprobe: Int, k: Int)
      : DataFrame = {
    val centroids = centroidsIn
    val assigned = embs.crossJoin(broadcast(centroids))
      .withColumn("c_sim",
        GraftFunctions.cosine_sim(col("embedding"), col("c_emb")))
      .groupBy("vec_id")
      .agg(
        max_by(col("centroid_id"), struct(col("c_sim"), -col("centroid_id")))
          .as("centroid_id"),
        first(col("embedding")).as("embedding"))
    val qprobes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("c_sim", GraftFunctions.cosine_sim(col("q_emb"), col("c_emb")))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("c_sim").desc, col("centroid_id"))))
      .filter(col("probe_rank") <= nprobe)
      .select("query_id", "q_emb", "centroid_id")
    assigned.join(broadcast(qprobes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim",
        GraftFunctions.cosine_sim(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos_sim"))
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

  /** Exact per-label embedding centroids, bit-stable across engines
    * and cluster sizes: each float component is scaled to an integer
    * (floor(x * 1e6) — one deterministic IEEE double op), summed as
    * BIGINT (order-independent), and the mean taken as one double
    * division at the end. This sidesteps float-sum non-associativity
    * AND engine-specific double→decimal rounding. posexplode →
    * groupBy(label, dim): partial aggregation collapses each
    * partition to nlabels×dim rows before the one shuffle. */
  def labelCentroids(embs: DataFrame): DataFrame =
    embs
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x").cast("double") * 1e6).cast("long"))
          .as("sum_scaled"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("n"),
        col("sum_scaled"),
        (col("sum_scaled").cast("double") / col("n") / 1e6)
          .as("centroid"))

  /** Radius (range) search: every corpus vector within a cosine
    * threshold of each query — the retrieval twin of top-k when the
    * caller wants "all sufficiently similar", e.g. near-dup audit or
    * contrastive negative mining. Queries broadcast against one
    * corpus scan; the corpus never shuffles and the threshold filter
    * runs inside the scan stage, so output size — not corpus size —
    * bounds what leaves the executors. */
  def rangeSearch(embs: DataFrame, queries: DataFrame,
                  minCosine: Double): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    embs.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim",
        GraftFunctions.cosine_sim(col("q_emb"), col("embedding")))
      .filter(col("cos_sim") >= minCosine)
      .select("query_id", "neighbor_id", "cos_sim")
  }

  /** Int8 quantization audit: symmetric per-vector quantization
    * (scale = max|x| / 127, q = round-half-up(x/scale) clamped to
    * ±127) with the reconstruction error reported per vector. Int8
    * embeddings are the 4x memory / bandwidth lever for ANN serving
    * at corpus scale; this op measures what that costs in fidelity.
    *
    * Narrow per-row map, no shuffle. Determinism rules: rounding is
    * floor(x+0.5) (an engine-neutral primitive — SQL ROUND
    * conventions differ), and error totals are floor-scaled BIGINTs
    * so the per-dimension sum is order-independent. */
  def quantizeAudit(embs: DataFrame): DataFrame =
    embs
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("xs"))
      .withColumn("max_abs", array_max(transform(col("xs"), x => abs(x))))
      .filter(col("max_abs") > 0)
      .withColumn("scale", col("max_abs") / 127.0)
      .withColumn("qerr", transform(col("xs"), x =>
        abs(x - greatest(lit(-127.0),
          least(lit(127.0), floor(x / col("scale") + 0.5)))
          * col("scale"))))
      .select(col("vec_id"), col("scale"),
        aggregate(col("qerr"), lit(0L),
          (acc, e) => acc + floor(e * 1e9).cast("long"))
          .as("abs_err_scaled"),
        floor(array_max(col("qerr")) * 1e9).cast("long")
          .as("max_err_scaled"))
}
