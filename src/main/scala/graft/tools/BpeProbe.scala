package graft.tools

/** Dev-only timing probe for the BPE multi-merge batching:
  * runMain graft.tools.BpeProbe <sfDir> <rounds> <batch>...
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val rounds = args(1).toInt
    val docs = graft.sources.Tables.documents(spark, d)
    args.drop(2).map(_.toInt).foreach { b =>
      // warm
      graft.operators.TextAnalysis.bpeTrain(docs, 2, b).count()
      val t0 = System.nanoTime()
      val out = graft.operators.TextAnalysis.bpeTrain(docs, rounds, b)
        .collect()
      println(f"[bpe] rounds=$rounds batch=$b: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"merges=${out.length}, first=${out.head.mkString(",")}")
    }
    spark.stop()
  }
}
