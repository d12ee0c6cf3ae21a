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

  /** Mixture (temperature) sampling across sources: per-source quota
    * proportional to count^0.5 — the standard up-weighting of small
    * sources when rebalancing a training mixture — then the quota is
    * filled by the smallest-md5 rows of each source.
    *
    * Determinism across engines: the sqrt weights are floored to
    * scaled BIGINTs before the cross-source total, so the sum is
    * exact integer arithmetic (a DOUBLE sum's rounding would depend
    * on summation order and break bit-reproducibility); the quota is
    * a BIGINT division of exact integers. sqrt itself is
    * correctly-rounded by IEEE 754, identical everywhere.
    *
    * Scale: the per-source count/quota table is O(sources) and
    * broadcast; the corpus shuffles once on source for the ranked
    * fill. At extreme per-source cardinality swap the row_number
    * fill for an md5-prefix threshold filter (approximate quota, no
    * sort) — same determinism, no per-source ranking. */
  def mixtureSample(docs: DataFrame, target: Long = 100L): DataFrame = {
    val c = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("w", floor(sqrt(col("n").cast("double")) * 1e6)
        .cast("long"))
    val quota = c.crossJoin(broadcast(c.agg(sum("w").as("tw"))))
      .withColumn("quota",
        greatest(lit(1L), expr(s"($target * w) div tw")))
      .select("source", "quota")
    docs.join(broadcast(quota), "source")
      .withColumn("_rn", row_number().over(Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("_rn") <= col("quota"))
      .select("doc_id", "source", "quota")
  }

  /** Deterministic corpus shuffle + balanced sharding: training-data
    * ordering. Documents are ordered by md5(doc_id) — a fixed,
    * engine-independent permutation standing in for "shuffle the
    * corpus before training" — and dealt round-robin into `nshards`
    * equal (±1 row) shards, with the position within each shard
    * preserved.
    *
    * The global rank is computed WITHOUT a single-task total sort:
    * range-repartition on the hash + in-partition sort gives the
    * total order across ordered partitions, and `zipWithIndex`
    * assigns global indices from per-partition counts (one extra
    * count pass — at 100 TB, persist the sorted set so both passes
    * read it once). The rank is independent of the sampled range
    * boundaries, so results are deterministic at any parallelism. */
  def shuffleShard(docs: DataFrame, nshards: Int = 8,
                   parts: Int = 32): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val sorted = docs.select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("_h"))
      .repartitionByRange(parts, col("_h"), col("doc_id"))
      .sortWithinPartitions("_h", "doc_id")
      .select(col("doc_id"), col("source"))
    sorted.as[(Long, String)].rdd.zipWithIndex()
      .map { case ((id, src), idx) =>
        (id, src, (idx % nshards).toInt, idx / nshards) }
      .toDF("doc_id", "source", "shard", "pos_in_shard")
  }

  /** Token-budget allocation across sources by water-filling (the
    * domain-mixing primitive: spend budget B as evenly as possible,
    * capping abundant sources, fully taking scarce ones). Budget
    * self-calibrates to half the corpus tokens so the op is
    * parameter-free at any scale. Closed form, no iteration:
    * over sources sorted by availability ascending, source i is
    * FULLY taken while cum_{i−1} + a_i·(n−i+1) ≤ B (even capping
    * everyone at a_i cannot exhaust B); the rest share the exact
    * floor cap (B − cum_taken) div n_capped. Every window runs over
    * the |sources| frame — trivially bounded; all arithmetic BIGINT
    * (the B·n cross-multiplication rides DECIMAL(38,0)). */
  def tokenBudget(docs: DataFrame): DataFrame = {
    val avail = docs
      .groupBy("source")
      .agg(sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
        .as("available"))
    val w = Window.orderBy(col("available"), col("source"))
    val ranked = avail
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cum_before", coalesce(sum("available").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(avail.agg(
        count(lit(1)).as("n_src"),
        expr("sum(available) div 2").as("budget"))))
      .withColumn("feasible",
        expr("cum_before + CAST(available AS DECIMAL(38,0)) " +
          "* (n_src - i + 1) <= budget"))
    val taken = ranked.agg(
      sum(when(col("feasible"), col("available")).otherwise(0L))
        .as("cum_taken"),
      sum(when(col("feasible"), 1L).otherwise(0L)).as("n_taken"))
    ranked.crossJoin(broadcast(taken))
      .select(col("source"), col("available"),
        when(col("feasible"), col("available"))
          .otherwise(expr(
            "(budget - cum_taken) div (n_src - n_taken)"))
          .as("allocated"))
  }

  /** Curriculum ordering: difficulty-quartile buckets with a
    * deterministic 16-way training stage inside each bucket. The
    * difficulty proxy is the token-uniqueness ratio (one exact
    * division); bucket cuts are the exact corpus quartiles; the
    * intra-bucket stage is the first md5 hex digit of the doc id —
    * so `phase = (bucket-1)*16 + stage` is a 64-step easy-to-hard
    * schedule a training loader consumes stage by stage.
    *
    * Deliberately NOT a per-bucket row_number: four buckets would
    * mean four single-task sorts over corpus/4 rows each. The stage
    * digit is a pure map — the whole op is one quartile aggregate
    * (broadcast back as a scalar row) plus a narrow projection, and
    * within a stage the loader's own shuffle supplies the order. */
  def curriculumOrder(docs: DataFrame): DataFrame = {
    val scored = docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks"))).as("difficulty"))
    val cuts = scored.agg(
      expr("percentile(difficulty, 0.25)").as("c1"),
      expr("percentile(difficulty, 0.5)").as("c2"),
      expr("percentile(difficulty, 0.75)").as("c3"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        lit(1L) + (col("difficulty") > col("c1")).cast("long") +
          (col("difficulty") > col("c2")).cast("long") +
          (col("difficulty") > col("c3")).cast("long"))
      .withColumn("stage",
        conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
          .cast("long"))
      .select(col("doc_id"), col("difficulty"), col("bucket"), col("stage"),
        ((col("bucket") - 1L) * 16L + col("stage")).as("phase"))
  }

  /** Deterministic train/val/test split: the split is a pure
    * function of md5(doc_id) — stable under corpus growth (a doc's
    * split never changes when other docs arrive, unlike rank-based
    * splits), reproducible everywhere, and contamination-auditable.
    * Thresholds are on the first two hex digits: 00-ef train (93.75%),
    * f0-f7 val (3.125%), f8-ff test (3.125%). */
  def splitAssign(docs: DataFrame): DataFrame = {
    val h2 = substring(md5(col("doc_id").cast("string")), 1, 2)
    docs.select(col("doc_id"), col("source"), col("n_chars"),
      when(h2 < "f0", lit("train"))
        .when(h2 < "f8", lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** Deterministic importance sampling: keep each document with
    * probability equal to its quality weight (distinct-token ratio),
    * by comparing an md5-uniform draw against the weight — Bernoulli
    * thinning that up-weights clean text in the blend without any
    * shuffle at all (pure narrow filter over the scan).
    *
    * Both sides of the comparison are integers: weight_ppm =
    * (n_uniq * 1e6) div n_tokens, u_ppm = first 28 md5 bits of
    * "is:"+doc_id mod 1e6 — so the kept set is bit-identical in any
    * engine and stable under corpus growth (a doc's draw never
    * depends on other docs — the same property splitAssign relies
    * on). At 100 TB this composes with the scan: no state, no
    * joins, partition-local. */
  def importanceSample(docs: DataFrame): DataFrame = {
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_uniq", size(array_distinct(toks)).cast("long"))
      .withColumn("weight_ppm", expr("n_uniq * 1000000 div n_tokens"))
      .withColumn("u_ppm",
        conv(substring(md5(concat(lit("is:"),
          col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
          % lit(1000000L))
      .filter(col("u_ppm") < col("weight_ppm"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("weight_ppm"), col("u_ppm"))
  }

  /** Size-balanced sharding: spread documents over N shards so each
    * shard's TOKEN mass (not row count — a count-balanced shard can
    * be 10× heavier than its neighbor under a power-law length
    * distribution, stalling every training epoch on the fat shard)
    * comes out near-equal. Deterministic snake assignment over the
    * global tokens-desc rank: rank r goes to shard `r mod N`
    * forward on even passes, reversed on odd — the classic
    * parallel-friendly LPT approximation that needs no sequential
    * state. The global rank is the [[graft.operators.Relational
    * .qAbcPareto]] two-level construction (range repartition,
    * per-partition row_number, broadcast offsets) — no single-task
    * sort anywhere. Emits the per-shard balance report; dev_ppm is
    * each shard's exact deviation from the ideal N-th. */
  def balancedShards(docs: DataFrame, nshards: Int = 8,
                     parts: Int = 32): DataFrame = {
    val sized = docs.select(col("doc_id"),
      size(graft.operators.TextAnalysis.tokens(col("text")))
        .cast("long").as("n_tokens"))
    val parted = sized
      .repartitionByRange(parts, col("n_tokens").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val offsets = parted.groupBy("pid").agg(count(lit(1)).as("pn"))
      .withColumn("offset", coalesce(sum("pn").over(
        Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    val assigned = parted.join(broadcast(offsets), "pid")
      .withColumn("r", col("offset") +
        row_number().over(Window.partitionBy("pid")
          .orderBy(col("n_tokens").desc, col("doc_id"))) - 1)
      .withColumn("shard", expr(
        s"CASE WHEN (r div $nshards) % 2 = 0 THEN r % $nshards " +
          s"ELSE ${nshards - 1} - r % $nshards END"))
    // grand total = Σ per-shard totals, read off the nshards-row
    // rollup with an unbounded window — the corpus is scanned and
    // tokenized exactly ONCE (a second sized.agg pass would re-scan
    // and re-tokenize everything just to recompute this sum)
    assigned.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .withColumn("grand", sum("total_tokens").over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        expr(s"abs(total_tokens * $nshards - grand) * 1000000 " +
          s"div grand").as("dev_ppm"))
  }

  /** Temporal quality-drift report (ingest monitoring): split the
    * corpus into a reference half and a current half at the midpoint
    * of the id range, build score-decile boundaries FROM THE
    * REFERENCE half, and report each half's per-decile mass — the
    * population-stability frame (a stable ingest keeps every decile
    * near 100000 ppm of the current half; mass migrating across
    * deciles is the early warning that the ingest's quality
    * distribution drifted). Score = whitespace token count; the PSI
    * log-sum itself is left to the consumer like rx_survival's KM
    * product (the one engine-dependent float step), delta_ppm is the
    * exact integer ingredient.
    *
    * All-integer construction: boundaries are exact rank-selected
    * scores (smallest s with cumulative ref count ≥ ceil(n_ref·i/
    * bins)) computed over the per-score rollup — a frame bounded by
    * the SCORE DOMAIN (a few hundred distinct token counts), not the
    * corpus, so its cumulative window is deliberately tiny; bin
    * assignment is a broadcast join against the (bins−1)-row
    * boundary frame; everything else is partial-aggregable rollups. */
  def qualityDrift(docs: DataFrame, bins: Int = 10): DataFrame = {
    val scored = docs.select(col("doc_id"),
      size(graft.operators.TextAnalysis.tokens(col("text")))
        .cast("long").as("s"))
    val mm = scored.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
    // thin checkpoint (r13): four consumers (ref CDF, its total, the
    // binning join, the per-half totals) each re-ran the tokenize
    // scan; the materialized frame is 3 narrow columns per doc
    val halved = scored.crossJoin(broadcast(mm))
      .withColumn("half",
        when(col("doc_id") <= expr("(lo + hi) div 2"), lit("ref"))
          .otherwise(lit("cur")))
      .select("doc_id", "s", "half")
      .localCheckpoint()
    val refCum = halved.filter(col("half") === "ref")
      .groupBy("s").agg(count(lit(1)).as("cn"))
      .withColumn("cum", sum("cn").over(
        Window.orderBy("s")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(halved.filter(col("half") === "ref")
        .agg(count(lit(1)).as("nref"))))
    val cuts = refCum
      .crossJoin(broadcast(
        halved.sparkSession.range(1, bins).select(col("id").as("i"))))
      .filter(col("cum") * bins >= col("i") * col("nref"))
      .groupBy("i").agg(min("s").as("b"))
    val binned = halved
      .crossJoin(broadcast(cuts))
      .groupBy(col("doc_id"), col("half"))
      .agg(sum(when(col("s") > col("b"), 1L).otherwise(0L)).as("bin"))
    val totals = binned.groupBy("half").agg(count(lit(1)).as("tot"))
    binned.groupBy("bin")
      .agg(sum(when(col("half") === "ref", 1L).otherwise(0L)).as("ref_n"),
        sum(when(col("half") === "cur", 1L).otherwise(0L)).as("cur_n"))
      .crossJoin(broadcast(totals.filter(col("half") === "ref")
        .select(col("tot").as("ref_tot"))))
      .crossJoin(broadcast(totals.filter(col("half") === "cur")
        .select(col("tot").as("cur_tot"))))
      .select(col("bin"), col("ref_n"), col("cur_n"),
        expr("ref_n * 1000000 div ref_tot").as("ref_ppm"),
        expr("cur_n * 1000000 div cur_tot").as("cur_ppm"),
        expr("abs(cur_n * 1000000 div cur_tot" +
          " - ref_n * 1000000 div ref_tot)").as("delta_ppm"))
      .orderBy("bin")
  }

  /** Cross-source quantile normalization (score calibration): map
    * each document's WITHIN-source rank onto the pooled corpus
    * distribution's value at the proportional rank — the classic fix
    * for per-source score drift (a "7" from a lenient domain and a
    * "7" from a strict one mean different things; after quantile
    * normalization the q-th percentile of every source carries the
    * same calibrated value). Score here = whitespace token count
    * (swap any integral per-doc signal). All-integer construction:
    * ranks are row_numbers with (score, doc_id) tie-break, the
    * proportional index is the exact floor `(k−1)(N−1) div (n−1)`
    * (single-doc sources pin to the pooled median), so the mapping
    * is bit-reproducible on any engine.
    *
    * Scale: the pooled rank uses the two-level prefix-sum
    * construction (range repartition + per-partition row_number +
    * broadcast offsets — no single-task global sort, the
    * [[balancedShards]] machinery); per-source ranks shuffle once on
    * source; the calibration lookup is ONE equi-join on the computed
    * pooled rank. Nothing wider than (id, score, rank) moves. */
  def quantileNormalize(docs: DataFrame, parts: Int = 8): DataFrame = {
    val scored = docs.select(col("doc_id"), col("source"),
      size(graft.operators.TextAnalysis.tokens(col("text")))
        .cast("long").as("raw"))
    val parted = scored
      .repartitionByRange(parts, col("raw"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val offsets = parted.groupBy("pid").agg(count(lit(1)).as("pn"))
      .withColumn("offset", coalesce(sum("pn").over(
        Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    val pooled = parted.join(broadcast(offsets), "pid")
      .withColumn("g", col("offset") + row_number().over(
        Window.partitionBy("pid").orderBy(col("raw"), col("doc_id"))))
      .select(col("g"), col("raw").as("calibrated"))
    val perSource = scored.groupBy("source").agg(count(lit(1)).as("n"))
    val total = scored.agg(count(lit(1)).as("bign"))
    scored
      .withColumn("k", row_number().over(
        Window.partitionBy("source").orderBy(col("raw"), col("doc_id")))
        .cast("long"))
      .join(broadcast(perSource), "source")
      .crossJoin(broadcast(total))
      .withColumn("g",
        when(col("n") === 1L, expr("(bign + 1) div 2"))
          .otherwise(expr("(k - 1) * (bign - 1) div (n - 1) + 1")))
      .join(pooled, "g")
      .select(col("doc_id"), col("source"), col("raw"), col("calibrated"))
  }

  /** Class-balanced downsampling: every class keeps exactly
    * `quota = min class count` rows — the standard rebalance before
    * training a classifier head (or mixing a labeled eval set) so the
    * majority class cannot drown the loss. Which rows survive is
    * md5-deterministic (smallest md5("cb:"+id) first, the
    * [[samplePerKey]] family), so the balanced set is reproducible
    * across engines and reruns and stable under resharding.
    *
    * Scale: one shuffle on the class key for the per-class ranking;
    * the quota frame is one broadcast row. Under extreme per-class
    * cardinality (the ranking window puts one whole class through a
    * single task) use [[classBalanceThreshold]] — the md5-prefix,
    * sort-free variant. */
  def classBalance(docs: DataFrame, classCol: String = "lang"): DataFrame = {
    val quota = docs.groupBy(classCol).agg(count(lit(1)).as("cn"))
      .agg(min("cn").as("quota"))
    docs
      .withColumn("_h", md5(concat(lit("cb:"), col("doc_id").cast("string"))))
      .withColumn("rank_in_class", row_number().over(
        Window.partitionBy(col(classCol)).orderBy(col("_h"), col("doc_id"))))
      .crossJoin(broadcast(quota))
      .filter(col("rank_in_class") <= col("quota"))
      .select(col("doc_id"), col(classCol),
        col("rank_in_class").cast("long").as("rank_in_class"))
  }

  /** Class-balanced UP-sampling — the replication twin of
    * [[classBalance]]'s downsampling: every class is brought UP to
    * the LARGEST class's count by deterministic replication, the
    * standard minority-oversampling move when downsampling would
    * throw away majority data. Each doc gets target div cn copies,
    * and the first target mod cn docs in the class's md5 order get
    * one extra — per-class totals are EXACTLY the target, and the
    * md5 rank makes which docs carry the extra copy reproducible on
    * any engine. Replication is one narrow `sequence` explode; the
    * per-class count frame is O(classes) and broadcast. Consumers
    * shuffle copies downstream (pipeline_shard); copy_id keeps
    * provenance. */
  def classUpsample(docs: DataFrame, classCol: String = "lang")
      : DataFrame = {
    val counts = docs.groupBy(classCol).agg(count(lit(1)).as("cn"))
    val target = counts.agg(max("cn").as("target"))
    docs
      .withColumn("_h",
        md5(concat(lit("cu:"), col("doc_id").cast("string"))))
      .withColumn("rank_in_class", row_number().over(
        Window.partitionBy(col(classCol))
          .orderBy(col("_h"), col("doc_id"))).cast("long"))
      .join(broadcast(counts), Seq(classCol))
      .crossJoin(broadcast(target))
      .withColumn("n_copies",
        expr("target div cn + IF(rank_in_class <= target % cn, 1, 0)"))
      .select(col("doc_id"), col(classCol),
        explode(expr("sequence(1L, n_copies)")).as("copy_id"))
  }

  /** Sort-free class balancing for EXTREME per-class cardinality:
    * instead of ranking every class member ([[classBalance]] puts a
    * whole class through one window task), keep a row when its
    * md5-uniform draw clears the class's acceptance threshold
    * `quota/count` — a per-class Bernoulli rate that yields
    * quota ± O(√quota) rows per class (approximate quota, exact
    * determinism). The draw is the importanceSample integer
    * construction (first 28 md5 bits mod 1e6 vs a floor-ppm
    * threshold), so the kept set is bit-reproducible on any engine
    * and stable under resharding; the per-class threshold frame is
    * O(classes) and broadcast; the filter is NARROW — no per-class
    * ranking shuffle anywhere, which is the whole point: the fat
    * class never funnels through a single task. */
  def classBalanceThreshold(docs: DataFrame, classCol: String = "lang")
      : DataFrame = {
    val counts = docs.groupBy(classCol).agg(count(lit(1)).as("cn"))
    val thresh = counts
      .crossJoin(broadcast(counts.agg(min("cn").as("quota"))))
      .withColumn("keep_ppm", expr("quota * 1000000 div cn"))
      .select(col(classCol), col("keep_ppm"))
    docs
      .withColumn("u_ppm",
        conv(substring(md5(concat(lit("cb:"),
          col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
          % lit(1000000L))
      .join(broadcast(thresh), classCol)
      .filter(col("u_ppm") < col("keep_ppm"))
      .select(col("doc_id"), col(classCol), col("u_ppm"), col("keep_ppm"))
  }

  /** Leakage-safe (grouped) k-fold manifest: cross-validation folds
    * assigned at the near-dup CLUSTER level, never the document
    * level — a plain per-doc split puts one near-duplicate in train
    * and its twin in eval, and the eval score silently measures
    * memorization (the standard grouped-CV fix, here with dedup
    * clusters as the groups). The fold is a pure function of
    * md5(cluster_id) (the [[importanceSample]] integer draw mod k),
    * so a cluster's fold never changes as the corpus grows and any
    * engine re-derives the same folds; every member of a cluster
    * lands in the same fold BY CONSTRUCTION (the fold key is the
    * cluster id), so no straddle check is needed.
    *
    * Emits the per-fold manifest (clusters, docs, token mass) a
    * training job consumes to plan its k runs. Plan: one join of the
    * (doc_id, cluster_id) label frame — already tiny relative to the
    * corpus — against per-doc token counts, then a k-row rollup;
    * the corpus text itself is scanned once for the counts and
    * never rides a shuffle wider than (doc_id, n_tokens). */
  def groupedKFold(labels: DataFrame, docs: DataFrame, k: Int = 5)
      : DataFrame = {
    val folded = labels.withColumn("fold",
      (conv(substring(md5(concat(lit("kf:"),
        col("cluster_id").cast("string"))), 1, 7), 16, 10).cast("long")
        % lit(k.toLong)))
    docs
      .select(col("doc_id"),
        size(graft.operators.TextAnalysis.tokens(col("text")))
          .cast("long").as("tk"))
      .join(folded, "doc_id")
      .groupBy("fold")
      .agg(countDistinct("cluster_id").as("n_clusters"),
        count(lit(1)).as("n_docs"),
        sum("tk").as("n_tokens"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023): score every
    * document by how target-like its HASHED unigram profile is —
    * `w(doc) = Σ_f tf_f·(⌊log2(tc_f+1)⌋ − ⌊log2(rc_f+1)⌋)
    *           − n_doc·(⌊log2(T+B)⌋ − ⌊log2(R+B)⌋)`
    * where tc/rc are the feature's token counts in the TARGET slice
    * (here: the `lang = targetLang` documents — the "I want more of
    * this" seed) vs the RAW corpus, T/R the slice masses, B the
    * hashed-feature space size. The hashing trick (md5 mod B) keeps
    * the model a fixed B-row table at ANY vocabulary size — the
    * reason DSIR scales where an exact-vocab importance model grows
    * with the corpus. All logs are the exact integer bit-length
    * proxy, so weights are BIGINT and bit-identical across engines.
    *
    * Selection is true importance RESAMPLING, not a top-k sort:
    * accept with probability min(1, 2^w) via the deterministic md5
    * uniform draw — `u_ppm < 10^6 >> min(−w, 62)` for negative w,
    * always for w ≥ 0 — so the accepted set needs no global order
    * and each doc's fate is a pure function of its id and the two
    * count tables.
    *
    * Plan: tokens explode once and collapse to (doc, feature) counts
    * map-side; the raw/target models are B-row partial-aggregable
    * count shuffles; the per-doc score joins token-keyed counts
    * against the B-row model — document text never rides a shuffle
    * at any corpus size. */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
                  buckets: Int = 4096): DataFrame = {
    val b = buckets.toLong
    val feats = docs
      .select(col("doc_id"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .select(col("doc_id"),
        (conv(substring(md5(concat(lit("dsir:"), col("t"))), 1, 7), 16, 10)
          .cast("long") % lit(b)).as("f"))
    val tgtIds = docs.filter(col("lang") === targetLang).select("doc_id")
    val raw = feats.groupBy("f").agg(count(lit(1)).as("rc"))
    val tgt = feats.join(tgtIds, "doc_id")
      .groupBy("f").agg(count(lit(1)).as("tc"))
    val model = raw.join(tgt, Seq("f"), "left")
      .select(col("f"),
        ((length(bin(coalesce(col("tc"), lit(0L)) + 1)) - 1)
          - (length(bin(col("rc") + 1)) - 1)).cast("long").as("w_bits"))
    val totals = raw.agg(sum("rc").as("bigr"))
      .crossJoin(tgt.agg(coalesce(sum("tc"), lit(0L)).as("bigt")))
      .select(((length(bin(col("bigt") + b)) - 1)
        - (length(bin(col("bigr") + b)) - 1)).cast("long").as("norm_bits"))
    feats.groupBy("doc_id", "f").agg(count(lit(1)).as("tf"))
      .join(model, "f")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"), sum(expr("tf * w_bits")).as("s"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_tokens"),
        (col("s") - col("n_tokens") * col("norm_bits")).as("weight_bits"))
      .withColumn("u_ppm",
        conv(substring(md5(concat(lit("dsiru:"),
          col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
          % lit(1000000L))
      .withColumn("accepted",
        // shift clamps to [0, 62] on BOTH engines (negative-shift
        // behavior is engine-defined); w ≥ 0 ⇒ shift 0 ⇒ always accept
        when(col("u_ppm") < expr(
          "shiftright(1000000L, " +
            "CAST(greatest(0L, least(-weight_bits, 62L)) AS INT))"),
          1L).otherwise(0L))
  }

  /** Epoch-aware token-budget mixing: the [[tokenBudget]] follow-on
    * where a source may be repeated for several EPOCHS with
    * geometrically diminishing returns (the repeated-data discount:
    * epoch e of source s is worth `q_s >> (e−1)` per token, q = the
    * source's distinct-token quality ppm; halving = the one discount
    * both engines compute exactly with a shift). Greedy allocation
    * by marginal utility is optimal for independently diminishing
    * items: rank all (source, epoch) cells by `util_ppm` desc (ties:
    * source, epoch), walk the running token sum, the cell at the
    * boundary takes the partial remainder. Budget self-calibrates to
    * half the corpus tokens, like [[tokenBudget]].
    *
    * Plan: one corpus scan collapses to the |sources|-row frame;
    * everything after — the epoch explode, rank window, running sum
    * — runs on |sources|·epochs rows, a bounded single-partition
    * window of the documented prefix-sum class. */
  def epochMix(docs: DataFrame, epochs: Int = 4): DataFrame = {
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val src = docs.groupBy("source").agg(
      sum(size(toks).cast("long")).as("avail"),
      sum(size(array_distinct(toks)).cast("long")).as("uniq"))
      .select(col("source"), col("avail"),
        expr("uniq * 1000000 div avail").as("q_ppm"))
    val budget = src.agg(expr("sum(avail) div 2").as("budget"))
    val cells = src.crossJoin(broadcast(budget))
      .select(col("source"), col("avail"), col("q_ppm"), col("budget"),
        explode(sequence(lit(1), lit(epochs))).as("epoch"))
      .withColumn("util_ppm",
        expr("shiftright(q_ppm, CAST(epoch - 1 AS INT))"))
    val w = Window.orderBy(col("util_ppm").desc, col("source"), col("epoch"))
    cells
      .withColumn("cum_before", coalesce(sum("avail").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("epoch").cast("long").as("epoch"),
        col("util_ppm"), col("avail"),
        greatest(lit(0L), least(col("avail"),
          col("budget") - col("cum_before"))).as("tokens_taken"))
  }
}
