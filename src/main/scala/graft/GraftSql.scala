package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.{CosineArgmaxExpr, DotProductExpr, L2ArgminExpr, CosineSimExpr, Md5MinHashBandsExpr, Md5RhpLshExpr, Md5SimHash60Expr, MinHashBandsExpr, QuantizeAuditExpr, RhpLshExpr, ShinglesExpr, SimHash64Expr, SortedJaccardExpr, SortedJaccardLongExpr}
import graft.sources.Tables

/** SQL surface of the engine: registers the custom Catalyst
  * expressions in the session FunctionRegistry and the star-schema
  * tables as temp views, so every capability is reachable from
  * `spark.sql(...)` as well as the DataFrame API.
  */
object GraftSql {
  /** Register graft's custom functions for SQL use (idempotent). */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64Expr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      es => CosineSimExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProductExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("rhp_lsh",
      es => RhpLshExpr(es(0), intArg(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_bands",
      es => MinHashBandsExpr(es(0), intArg(es(1)), intArg(es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("text_shingles",
      es => ShinglesExpr(es(0), intArg(es(1))), "scala_udf")
    // md5 ("auditable") hash family — buckets/signatures re-derivable
    // in any engine with md5(); the cross-engine oracle family
    reg.createOrReplaceTempFunction("md5_simhash60",
      es => Md5SimHash60Expr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("md5_rhp_lsh",
      es => Md5RhpLshExpr(es(0), intArg(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("md5_minhash_bands",
      es => Md5MinHashBandsExpr(es(0), intArg(es(1)), intArg(es(2))),
      "scala_udf")
    reg.createOrReplaceTempFunction("cosine_argmax",
      es => CosineArgmaxExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("quantize_audit",
      es => QuantizeAuditExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("l2_argmin",
      es => L2ArgminExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_jaccard",
      es => SortedJaccardExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_jaccard_long",
      es => SortedJaccardLongExpr(es(0), es(1)), "scala_udf")
    // aggregate: mergeable KMV distinct sketch over a BIGINT hash
    reg.createOrReplaceTempFunction("kmv_distinct",
      es => graft.functions.KmvDistinctAgg(es(0), intArg(es(1)))
        .toAggregateExpression(), "scala_udf")
  }

  private def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"literal int expected, got $other")
    }

  /** Register every test-data table as a temp view over `dir`. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** One-call setup: functions + views, then free-form SQL. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerFunctions(spark)
    registerTables(spark, dir)
    spark.sql(query)
  }
}
