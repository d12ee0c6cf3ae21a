package graft.tools

/** Dev-only timing probe for the link-prediction prune:
  * runMain graft.tools.LinkProbe <sfDir> <cap>...
  */
object LinkProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val li = graft.sources.Tables.lineitem(spark, d)
    val or = graft.sources.Tables.orders(spark, d)
    args.drop(1).map(_.toInt).foreach { cap =>
      for (pass <- 1 to 2) { // pass 2 is the warm (comparable) number
        var t0 = System.nanoTime()
        val cn = graft.operators.Graph.commonNeighbors(li, or, cap = cap)
          .collect()
        val tCn = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val ra = graft.operators.Graph.resourceAllocation(li, or, cap = cap)
          .collect()
        val tRa = (System.nanoTime() - t0) / 1e9
        println(f"[link] cap=$cap pass=$pass: common_neighbors=$tCn%.1f s " +
          f"(top=${cn.head.getLong(5)}), resource_alloc=$tRa%.1f s " +
          f"(top=${ra.head.getLong(3)})")
      }
    }
    spark.stop()
  }
}
