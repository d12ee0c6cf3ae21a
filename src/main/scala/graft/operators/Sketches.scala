package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the forms that replace their
  * exact twins at 100 TB, where an exact distinct or percentile is a
  * full shuffle of every distinct value but a sketch is a fixed-size
  * mergeable state (HyperLogLog++ / KLL respectively) that partial-
  * aggregates map-side like any sum.
  *
  * ScalaTest-gated (Round3Spec asserts error bounds against the exact
  * twins): sketch outputs are implementation-defined, so there is no
  * cross-engine oracle by design.
  */
object Sketches {
  /** Per-event-type approximate cardinality + quantiles next to the
    * row count: one partial-aggregable pass. rsd = relative standard
    * deviation of the HLL++ estimate (0.02 ≈ 1.5 KB of state). */
  def approxStats(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        approx_count_distinct(col("value"), rsd).as("approx_values"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.95)),
          lit(10000)).as("value_quantiles"))

  /** Exact twin for the error-bound assertion (and the form you run
    * when the cardinality is known-small). */
  def exactStats(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("exact_users"),
        countDistinct(col("value")).as("exact_values"))

  /** Count-min-sketch heavy hitters over the md5 hash family, audited
    * against exact counts. The CMS is the streaming-mergeable answer
    * to "which terms dominate the corpus" when the vocabulary is too
    * large to count exactly: depth×width counters (here 4×256 = 8 KB)
    * absorb every token, and a term's estimate = min over depths of
    * its counter — an overestimate, never an under.
    *
    * Cross-engine determinism: bucket(d, term) =
    * ((a_d * h28 + b_d) mod (2^31-1)) mod width with
    * h28 = first 7 hex chars of md5(term) and a_d/b_d themselves
    * md5-derived (the same affine-rehash family as the MinHash
    * kernels) — every value is BIGINT-safe (a_d < 2^31, h28 < 2^28 ⇒
    * product < 2^59) and reproducible in any engine with md5().
    *
    * Scale shape: tokens are exact-counted FIRST (one shuffle on
    * term — partial-aggregable), so the depth-fanout runs over the
    * distinct-term frame, not the raw token stream; cells are a
    * ≤ depth×width frame (broadcast), and the top-k probe is a
    * narrow broadcast join. At 100 TB you'd feed the cells from a
    * TypedImperativeAggregate instead of the term frame; the cell
    * values — and therefore the estimates — would be identical.
    *
    * Result: (term, exact_cnt, cms_est, overestimate ≥ 0) for the
    * top-k exact terms. */
  def cmsHeavyHitters(docs: DataFrame, depth: Int = 4, width: Int = 256,
                      k: Int = 20): DataFrame = {
    val counts = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val withH = counts.withColumn("h28", md5Prefix28(col("term")))
    val cells = withH
      .select(col("cnt"), explode(cmsPairs(depth, width)).as("db"))
      .select(col("db.d").as("d"), col("db.bucket").as("bucket"),
        col("cnt"))
      .groupBy("d", "bucket").agg(sum("cnt").as("cell"))
    withH
      .orderBy(col("cnt").desc, col("term"))
      .limit(k)
      .select(col("term"), col("cnt"),
        explode(cmsPairs(depth, width)).as("db"))
      .select(col("term"), col("cnt"), col("db.d").as("d"),
        col("db.bucket").as("bucket"))
      .join(broadcast(cells), Seq("d", "bucket"))
      .groupBy("term", "cnt")
      .agg(min("cell").as("cms_est"))
      .select(col("term"), col("cnt").as("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("cnt")).as("overestimate"))
  }

  /** First 28 md5 bits of a string column — the SQL-auditable term
    * hash (('0x' || substr(md5(term), 1, 7))::BIGINT). 28 bits keeps
    * a_d * h28 < 2^59: BIGINT-safe in every engine. */
  private[operators] def md5Prefix28(s: org.apache.spark.sql.Column) =
    conv(substring(md5(s), 1, 7), 16, 10).cast("long")

  /** The (d, bucket) pairs of a row's `h28` under the md5 affine
    * family, as a literal struct array — join-free (the constants
    * fold into codegen), so the SAME column works on a bounded frame
    * and inside a streaming aggregation. */
  private[operators] def cmsPairs(depth: Int, width: Int)
      : org.apache.spark.sql.Column = {
    import graft.functions.Kernels
    val P = 2147483647L // 2^31 - 1, the family's Mersenne modulus
    array((0 until depth).map { d =>
      val ca = 1L + Kernels.md5Prefix60("cms:a:" + d) % (P - 1)
      val cb = Kernels.md5Prefix60("cms:b:" + d) % P
      struct(lit(d.toLong).as("d"),
        (((lit(ca) * col("h28") + lit(cb)) % P) % width).as("bucket"))
    }: _*)
  }

  /** Mergeable bottom-k sample quantiles over the md5 family — the
    * deterministic cousin of a KLL/t-digest, inside the hash-exact
    * gate like [[graft.functions.KmvSketch]]: the per-key state is
    * the k rows with the smallest md5(id) (a uniform fixed-size
    * sample, mergeable by keep-k-smallest like KMV), and the
    * quantile estimate is the ceil(q·m)-th order statistic of the
    * sample. Any engine with md5() re-derives the identical sample
    * and therefore the identical estimates — impossible for
    * percentile_approx, whose t-digest is implementation-defined.
    *
    * Scale shape: [[Sampling.samplePerKey]]'s one shuffle on the key
    * (window top-k never materializes a full per-key sort beyond the
    * shuffle's own ordering); the sort_array/element_at finish runs
    * on ≤ k values per key. Audit it against the exact twin
    * (`source_percentiles`) exactly like sketch_distinct audits
    * count_distinct. */
  def quantileSketch(docs: DataFrame, k: Int = 256,
                     qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val sample = Sampling.samplePerKey(docs, "source", "doc_id", k)
    val agged = sample.groupBy("source").agg(
      sort_array(collect_list(col("n_chars"))).as("vals"),
      count(lit(1)).as("sample_m"))
    val ests = qs.map { q =>
      val tag = (q * 100).round.toInt
      element_at(col("vals"),
        greatest(lit(1L), ceil(col("sample_m") * lit(q)))
          .cast("int")).as(s"est_p$tag")
    }
    agged.select(col("source") +: col("sample_m") +: ests: _*)
  }

  /** Streaming twin of the CMS cell build: the counters ARE the
    * running aggregation state (depth×width rows forever — the
    * sketch is its own state bound), incremented per token by
    * Structured Streaming's incremental agg. After consuming the
    * same documents, the cell frame equals the batch build's —
    * asserted in StreamingSpec. */
  def cmsCellsStream(docs: DataFrame, depth: Int = 4,
                     width: Int = 256): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .where(col("term") =!= "")
      .withColumn("h28", md5Prefix28(col("term")))
      .select(explode(cmsPairs(depth, width)).as("db"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(count(lit(1)).as("cell"))

  /** KMV set-operation estimates per source PAIR: |A∪B| from the
    * merged k-minimum-values set and |A∩B| via the ρ = |M∩A∩B|/k
    * identity (Beyer SIGMOD'07) — the sketch algebra that answers
    * "how much do two corpora overlap" from two O(k) states instead
    * of the vocabulary-shuffling exact join the source-overlap
    * matrix pays. The same deterministic md5-prefix family as
    * [[graft.operators.TextAnalysis.distinctTokensSketch]], so the
    * cross-engine gate re-derives the identical estimates; exact
    * union/intersection ride along as audit columns (gate-scale
    * only — at 100 TB you drop them and keep the sketch).
    *
    * Shape: ONE distinct-collapse of (source, hash) with map-side
    * partials, a per-source rank window cut to the k smallest
    * (bounded: k rows survive per source), then every pair/merge/
    * intersect runs on the nsources×k array frame — driver-size,
    * broadcast both sides. The 15·2⁶⁰ numerator rides DECIMAL(38,0)
    * exactly like the agg kernel's BigInt path. */
  def kmvSetOps(docs: DataFrame, k: Int = 16): DataFrame = {
    val tk = docs
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .select(col("source"), col("term"),
        conv(substring(md5(col("term")), 1, 15), 16, 10)
          .cast("long").as("h"))
    val dist = tk.select("source", "h").distinct()
    val kmin = dist
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("h")))
      .filter(col("rn") <= k)
      .groupBy("source")
      .agg(array_sort(collect_list(col("h"))).as("mins"),
        count(lit(1)).as("n_mins"))
    val exact = tk.select("source", "term").distinct()
    val exactPair = exact.select(col("source").as("source_a"),
        col("term"))
      .join(exact.select(col("source").as("source_b"), col("term")),
        Seq("term"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_inter_exact"))
    val exactN = exact.groupBy("source").agg(count(lit(1)).as("n_ex"))
    val a = kmin.select(col("source").as("source_a"),
      col("mins").as("mins_a"), col("n_mins").as("nm_a"))
    val b = kmin.select(col("source").as("source_b"),
      col("mins").as("mins_b"), col("n_mins").as("nm_b"))
    a.crossJoin(broadcast(b))
      .filter(col("source_a") < col("source_b"))
      .withColumn("merged",
        slice(array_sort(array_union(col("mins_a"), col("mins_b"))),
          1, k))
      .withColumn("n_merged", size(col("merged")).cast("long"))
      .withColumn("union_est",
        when(col("n_merged") < k, col("n_merged"))
          .otherwise(expr("CAST(" + (k - 1) +
            " AS DECIMAL(38,0)) * 1152921504606846976 " +
            s"div element_at(merged, $k)")))
      .withColumn("rho", size(array_intersect(col("merged"),
        array_intersect(col("mins_a"), col("mins_b")))).cast("long"))
      // unsaturated merged sketch ⇒ the union is known EXACTLY and ρ
      // IS the intersection — the ρ·|U|/k scaling applies only once
      // the k-th minimum truncates the view
      .withColumn("inter_est",
        when(col("n_merged") < k, col("rho"))
          .otherwise(expr(s"rho * union_est div $k")))
      .withColumn("jaccard_est_ppm",
        when(col("n_merged") < k, expr("rho * 1000000 div n_merged"))
          .otherwise(expr(s"rho * 1000000 div $k")))
      .join(broadcast(exactPair), Seq("source_a", "source_b"), "left")
      .join(broadcast(exactN.withColumnsRenamed(
        Map("source" -> "source_a", "n_ex" -> "n_a"))), "source_a")
      .join(broadcast(exactN.withColumnsRenamed(
        Map("source" -> "source_b", "n_ex" -> "n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("union_est"),
        col("inter_est"), col("jaccard_est_ppm"),
        (col("n_a") + col("n_b") -
          coalesce(col("n_inter_exact"), lit(0L))).as("n_union_exact"),
        coalesce(col("n_inter_exact"), lit(0L)).as("n_inter_exact"))
  }
}
