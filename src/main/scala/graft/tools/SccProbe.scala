package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only round-structure probe for the key-level SCC/SSSP family:
  * reports the repeat-business arc frame size, trim depth, coloring
  * rounds, BW rounds and outer passes at an SF — the numbers that
  * size [[graft.operators.Graph.sccKeysTrade]]'s driver-action
  * budget (each round is one tiny-frame Spark job; rounds, not rows,
  * dominate its wall time at test SFs).
  *
  * runMain graft.tools.SccProbe <sfDir>
  */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    val li = graft.sources.Tables.lineitem(spark, d)
    val or = graft.sources.Tables.orders(spark, d)
    val pair = li.select(col("l_orderkey"), col("l_suppkey"),
        col("l_returnflag"))
      .join(or.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).cast("long").as("c"),
        (col("l_suppkey") * 2 + 1).cast("long").as("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("nr"))
    var edges = pair.filter(col("n") >= 2)
      .select(col("c").as("a"), col("s").as("b"))
      .unionByName(pair.filter(col("nr") >= 2)
        .select(col("s").as("a"), col("c").as("b")))
      .localCheckpoint()
    var nEdges = edges.count()
    println(s"[scc] arcs=$nEdges")
    var outer = 0
    val t0 = System.nanoTime()
    while (nEdges > 0 && outer < 200) {
      var trims = 0
      var trimming = true
      while (trimming && nEdges > 0) {
        val e2 = edges
          .join(edges.select(col("b").as("a")).distinct(), Seq("a"), "left_semi")
          .join(edges.select(col("a").as("b")).distinct(), Seq("b"), "left_semi")
          .localCheckpoint()
        val n2 = e2.count()
        trimming = n2 < nEdges
        edges = e2; nEdges = n2; trims += 1
      }
      println(f"[scc] pass $outer: trim rounds=$trims arcs-left=$nEdges " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.1f")
      if (nEdges > 0) {
        val nodes = edges.select(col("a").as("node"))
          .unionByName(edges.select(col("b").as("node"))).distinct()
        var colors = nodes.withColumn("color", col("node")).localCheckpoint()
        var changed = 1L; var it = 0
        while (changed > 0 && it < 200) {
          val upd = edges.join(colors, edges("a") === colors("node"))
            .select(col("b").as("node"), col("color"))
            .unionByName(colors)
            .groupBy("node").agg(max("color").as("color"))
            .localCheckpoint()
          changed = upd.as("x").join(colors.as("y"), Seq("node"))
            .filter(col("x.color") > col("y.color")).count()
          colors = upd; it += 1
        }
        println(f"[scc] pass $outer: color rounds=$it " +
          f"t=${(System.nanoTime() - t0) / 1e9}%.1f")
        var found = colors.filter(col("color") === col("node"))
          .localCheckpoint()
        var frontier = found
        var fcount = frontier.count()
        var bw = 0
        while (fcount > 0) {
          val nxt = edges.join(frontier, edges("b") === frontier("node"))
            .select(col("a").as("node"), col("color")).distinct()
            .join(colors.withColumnRenamed("color", "ncolor"), Seq("node"))
            .filter(col("color") === col("ncolor"))
            .select("node", "color")
            .join(found, Seq("node"), "left_anti")
            .localCheckpoint()
          found = found.unionByName(nxt).localCheckpoint()
          frontier = nxt; fcount = nxt.count(); bw += 1
        }
        println(f"[scc] pass $outer: bw rounds=$bw found=${found.count()} " +
          f"t=${(System.nanoTime() - t0) / 1e9}%.1f")
        val fa = found.select(col("node").as("a"))
        val fb = found.select(col("node").as("b"))
        edges = edges.join(fa, Seq("a"), "left_anti")
          .join(fb, Seq("b"), "left_anti").localCheckpoint()
        nEdges = edges.count()
      }
      outer += 1
    }
    println(f"[scc] done outer=$outer t=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
