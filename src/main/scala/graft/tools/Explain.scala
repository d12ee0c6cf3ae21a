package graft.tools

/** Dump formatted physical plans for selected queries (dev tool). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q6_revenue", "q3_shipping_priority", "q5_local_supplier",
                         "rx_scan", "rx_with_latest_from", "dedup_minhash_lsh",
                         "ann_bruteforce")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, d)
      df.collect()  // let AQE finalize
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
