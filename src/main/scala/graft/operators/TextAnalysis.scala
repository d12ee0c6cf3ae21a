package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Everything is built from codegen'd `functions._` (split / filter /
  * transform / aggregate higher-order functions) — no UDFs — so the
  * whole pipeline stays inside WholeStageCodegen and scales linearly
  * with a plain parquet scan: no shuffle at all for per-document
  * scoring.
  */
object TextAnalysis {
  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Lowercased whitespace tokens. */
  def tokens(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    split(lower(text), " ")

  /** Quality scoring: length / token / stopword / uniqueness ratios
    * combined into one score. */
  def textQuality(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      // BIGINT on purpose: matches the oracle engine's integer width
      .withColumn("len", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isInCollection(stopwords))).cast("long"))
      .withColumn("n_uniq", size(array_distinct(col("toks"))).cast("long"))
      .select(
        col("doc_id"), col("len"), col("n_tokens"), col("n_stop"),
        col("n_uniq"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("n_uniq").cast("double") / col("n_tokens")).as("uniq_ratio"),
        ((col("n_uniq").cast("double") / col("n_tokens")) * lit(0.6) +
          (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) * lit(0.4))
          .as("quality_score"))

  /** Token counting: whitespace tokens, alpha runs (BPE-ish subword
    * proxy: ceil(len/4) pieces per token), and mean token length. */
  def tokenCount(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("ws_tokens"),
        aggregate(col("toks"), lit(0L),
          (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))
          .as("subword_pieces"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t))
          .cast("double")./(size(col("toks"))).as("mean_token_len"))

  /** Language ID: n-gram/stopword-profile heuristic. Scores each
    * candidate language by profile-hit ratio; deterministic argmax.
    * (Profiles are tiny; the comparison is a codegen'd expression —
    * at scale this is a pure map over the scan.) */
  def langId(docs: DataFrame): DataFrame = {
    val profiles: Map[String, Seq[String]] = Map(
      "en" -> Seq("the", "and", "of", "is"),
      "fr" -> Seq("le", "la", "et", "de"),
      "de" -> Seq("der", "die", "und", "das"),
      "es" -> Seq("el", "la", "y", "de"),
      "zh" -> Seq("de", "shi", "le", "he"))
    val toks = tokens(col("text"))
    val scores = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        (size(filter(toks, t => t.isInCollection(words))).cast("double") /
          size(toks)).as("score"),
        lit(lang).as("lang"))
    }
    docs.select(
      col("doc_id"), col("lang").as("labeled_lang"),
      array_max(array(scores: _*)).getField("lang").as("predicted_lang"),
      array_max(array(scores: _*)).getField("score").as("confidence"))
  }

  /** Exact n-gram Jaccard similarity for all document pairs within a
    * `source` group (deterministic candidate set — the LSH paths use
    * hash-dependent candidates instead). Distinct 3-gram shingle
    * sets; |A n B| / |A u B|. */
  def ngramJaccard(docs: DataFrame, minJaccard: Double = 0.05): DataFrame = {
    // sorted distinct shingles once per doc -> the per-pair Jaccard
    // is a single merge pass (no per-pair hash sets)
    val withSh = docs.select(col("doc_id"), col("source"),
      array_sort(array_distinct(graft.functions.GraftFunctions
        .text_shingles(tokens(col("text")), 3))).as("sh"))
      .filter(size(col("sh")) > 0)
    withSh.select(col("source"), col("doc_id").as("doc1"), col("sh").as("sh1"))
      .join(withSh.select(col("source"), col("doc_id").as("doc2"),
        col("sh").as("sh2")), Seq("source"))
      .filter(col("doc1") < col("doc2"))
      .withColumn("jaccard", graft.functions.GraftFunctions
        .sorted_jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= minJaccard)
      .select("source", "doc1", "doc2", "jaccard")
  }

  /** Content fingerprint: md5 over the sorted distinct token set —
    * whitespace/word-order-insensitive document identity. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text"))))))
        .as("content_fp"),
      md5(lower(trim(col("text")))).as("exact_fp"))
}
