package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only stage timing for the dedup_union_cluster composite:
  * runMain graft.tools.UnionProbe <sfDir>
  */
object UnionProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val dd = graft.sources.Tables.documents(spark, args(0))
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[uc] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    import graft.operators.Dedup
    val sigs = Dedup.pairFeatures(dd, auditable = true)
      .select("doc_id", "sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sigs build")(sigs.count())
    val mh = Dedup.minhashLsh(dd, auditable = true).select("doc1", "doc2")
    t("minhash pairs")(mh.count())
    val sh = Dedup.simhashFrom(sigs, maxHamming = 3, auditable = true)
      .select("doc1", "doc2")
    t("simhash pairs")(sh.count())
    val snm = Dedup.sortedNeighborhood(dd).select("doc1", "doc2")
    t("snm pairs")(snm.count())
    val pairs = t("union distinct") {
      val p = mh.unionByName(sh).unionByName(snm).distinct()
        .localCheckpoint()
      println(s"[uc] n_pairs=${p.count()}")
      p
    }
    t("cc")(Dedup.connectedComponents(pairs, dd).orderBy("doc_id")
      .agg(sum("cluster_id")).head())
    spark.stop()
  }
}
