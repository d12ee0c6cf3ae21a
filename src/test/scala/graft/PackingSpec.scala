package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Packing}

/** Sequence packing (greedy bin fill) and incremental ingestion
  * dedup, checked against plain-Scala references and planted
  * duplicates. */
class PackingSpec extends AnyFunSuite {
  import TestSession._

  private def docsDf(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.map { case (id, src, n) => (id, src, n, s"text$id") }
      .toDF("doc_id", "source", "n_chars", "text")
  }

  /** Plain-Scala greedy packer (the spec), single shard. */
  private def packRef(sizes: Seq[(Long, Long)], cap: Long)
      : Map[Long, Long] = {
    var bin = 0L; var used = 0L; var first = true
    sizes.sortBy(_._1).map { case (id, n) =>
      if (first) { used = n; first = false }
      else if (used + n > cap) { bin += 1; used = n }
      else used += n
      id -> bin
    }.toMap
  }

  test("packGreedy matches the sequential reference per shard") {
    val sizes = Seq.tabulate(40)(i => (i.toLong, (i % 7) * 50L + 30L))
    val df = docsDf(sizes.map { case (id, n) => (id, "s", n) })
    val out = Packing.packGreedy(df, capacity = 300L, shards = 1)
      .collect()
    val ref = packRef(sizes, 300L)
    // reconstruct per-doc assignment from bin [first_doc, last_doc]
    // ranges: ranges must be disjoint and ordered, covering all docs
    val bins = out.sortBy(_.getAs[Long]("bin_id"))
    assert(bins.map(_.getAs[Long]("n_docs")).sum === 40L)
    bins.foreach { r =>
      val first = r.getAs[Long]("first_doc")
      val last = r.getAs[Long]("last_doc")
      assert(ref(first) === ref(last), "bin spans a reference boundary")
      assert(r.getAs[Long]("bin_chars") ===
        sizes.filter(t => t._1 >= first && t._1 <= last).map(_._2).sum)
      assert(r.getAs[Long]("bin_chars") <= 300L ||
        r.getAs[Long]("n_docs") === 1L)
    }
    // same number of bins as the reference
    assert(bins.length === ref.values.max.toInt + 1)
  }

  test("packGreedy gives an oversized doc its own bin") {
    val df = docsDf(Seq((1L, "s", 100L), (2L, "s", 900L), (3L, "s", 100L)))
    val out = Packing.packGreedy(df, capacity = 300L, shards = 1)
      .collect().sortBy(_.getAs[Long]("bin_id"))
    assert(out.map(_.getAs[Long]("n_docs")).toSeq === Seq(1L, 1L, 1L))
    assert(out(1).getAs[Long]("bin_chars") === 900L)
  }

  test("packGreedy shards split work but never split a source's shard walk") {
    val sizes = Seq.tabulate(64)(i => (i.toLong, 120L))
    val df = docsDf(sizes.map { case (id, n) => (id, s"s${id % 2}", n) })
    val out = Packing.packGreedy(df, capacity = 400L, shards = 4)
    val grouped = out.collect().groupBy(r =>
      (r.getAs[String]("source"), r.getAs[Int]("shard")))
    // every (source, shard) walk packs exactly floor-fill: 3 docs of
    // 120 chars per 400-char bin
    grouped.values.foreach { bins =>
      bins.sortBy(_.getAs[Long]("bin_id")).init.foreach { b =>
        assert(b.getAs[Long]("n_docs") === 3L)
      }
    }
  }

  test("incrementalNew admits only fingerprints absent from the corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "old", "alpha"), (2L, "old", "beta"),
      (10L, "new", "alpha"),           // dup of corpus -> dropped
      (11L, "new", "gamma"),           // genuinely new -> kept
      (12L, "new", "gamma"),           // batch-internal dup -> dropped
      (13L, "new", "Beta "),           // normalizes to corpus dup
      (14L, "new", "delta")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.incrementalNew(df, Seq("new"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(11L, 14L))
  }
}
