package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}
import graft.sources.Tables

/** Round-4 curation ops: TF-IDF top terms, n-gram novelty scoring,
  * curriculum ordering. Exact semantics on constructed corpora; the
  * driver gate additionally hash-compares each against its DuckDB
  * oracle at sf0.01. */
class Round4Spec extends AnyFunSuite {
  import TestSession._

  test("tfidfTopTerms ranks a domain-specific term over corpus-wide ones") {
    import spark.implicits._
    // "shared" appears in every doc (df=4 → heavy idf damping);
    // "alpha"/"beta" are exclusive to their source
    val docs = Seq(
      (1L, "alpha alpha shared", "en", "s1", 18L),
      (2L, "alpha shared", "en", "s1", 12L),
      (3L, "beta shared", "en", "s2", 11L),
      (4L, "beta beta shared", "en", "s2", 16L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.tfidfTopTerms(docs, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(5))).toSet
    // per source: alpha/beta (tf=3, df=2) must outrank shared
    // (tf=2, df=4): 3*5/3 = 5.0 > 2*5/5 = 2.0
    assert(out === Set(
      ("s1", "alpha", 3L, 2L, 1L), ("s1", "shared", 2L, 4L, 2L),
      ("s2", "beta", 3L, 2L, 1L), ("s2", "shared", 2L, 4L, 2L)))
  }

  test("tfidf score is the exact rational tf*(N+1)/(df+1)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x", "en", "s1", 5L),
      (2L, "y", "en", "s1", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextAnalysis.tfidfTopTerms(docs, k = 5)
      .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(rows("x") === 3.0 * 3.0 / 2.0) // tf=3, N=2, df=1
    assert(rows("y") === 1.0 * 3.0 / 2.0)
  }

  test("textNovelty credits each shingle to its introducing doc only") {
    import spark.implicits._
    val docs = Seq(
      // doc 1: shingles {a b c, b c d} — all novel
      (1L, "a b c d", "en", "s1", 7L),
      // doc 2: identical → novelty 0
      (2L, "a b c d", "en", "s1", 7L),
      // doc 3: shares "a b c", adds "b c x" → 1 of 2 novel
      (3L, "a b c x", "en", "s1", 7L),
      // doc 4: < 3 tokens → excluded entirely
      (4L, "a b", "en", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.textNovelty(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(out === Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 2L, 1L, 0.5)))
  }

  test("textNovelty sums of novel counts equal the global distinct shingle count") {
    val docs = Tables.documents(spark, sf).limit(40)
    val nov = TextAnalysis.textNovelty(docs)
    val sumNovel = nov.agg(sum("n_novel")).collect()(0).getLong(0)
    // distinct 60-bit shingle hashes across the corpus — every hash
    // is introduced exactly once
    val distinctSh = docs
      .select(explode(array_distinct(graft.functions.GraftFunctions
        .text_shingles(TextAnalysis.tokens(col("text")), 3))).as("s"))
      .select(conv(substring(md5(col("s")), 1, 15), 16, 10).as("h"))
      .distinct().count()
    assert(sumNovel === distinctSh)
  }

  test("curriculumOrder buckets quarter the corpus and phase is (bucket-1)*16+stage") {
    val docs = Tables.documents(spark, sf)
    val out = Sampling.curriculumOrder(docs).cache()
    try {
      val n = out.count()
      // quartile cuts: no bucket can exceed ~half the corpus even
      // with ties; all four appear on real data
      val byBucket = out.groupBy("bucket").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byBucket.keySet === Set(1L, 2L, 3L, 4L))
      assert(byBucket.values.forall(_ <= (n + 1) / 2))
      val bad = out.filter(
        col("phase") =!= (col("bucket") - 1L) * 16L + col("stage") ||
        col("stage") < 0L || col("stage") > 15L).count()
      assert(bad === 0L)
      // deterministic: a rerun is row-identical
      val again = Sampling.curriculumOrder(docs)
      assert(out.exceptAll(again).count() === 0L)
      assert(again.exceptAll(out).count() === 0L)
    } finally out.unpersist()
  }
}
