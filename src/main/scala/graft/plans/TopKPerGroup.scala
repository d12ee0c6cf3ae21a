package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a first-class operator.
  *
  * The compose-first form (`row_number().over(Window...) <= k`)
  * fully SORTS every group before ranking - O(n log n) per group and
  * a full materialization of group data in the sort. This operator
  * keeps a bounded k-element heap per group instead: O(n log k),
  * no sort, grouped state bounded by (#groups x k) rows.
  *
  * Wiring follows Spark's extension points: logical node ->
  * planner Strategy -> UnaryExecNode requiring
  * ClusteredDistribution(groupExprs) (so the planner inserts the
  * single hash Exchange, which AQE can still tune).
  */
case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
                        k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** One hash shuffle on the group keys; within a partition the heap
    * state is all that's held (never the whole group). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expression trees; codegen the
    // projections/orderings executor-side per partition
    val (gExprs, ord, childOutput, kk) = (groupExprs, order, child.output, k)
    child.execute().mapPartitions { rows =>
      val groupProj = UnsafeProjection.create(gExprs, childOutput)
      val rowOrdering = new LazilyGeneratedOrdering(ord, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // group key -> bounded max-heap (worst element on top)
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[UnsafeRow]]()
      val heapCmp = rowOrdering.reverse // evict the worst-ranked row
      rows.foreach { r =>
        val row = r match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk + 1, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (rowOrdering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        // emit in rank order within the group
        h.asScala.toArray.sorted(rowOrdering.asInstanceOf[Ordering[UnsafeRow]])
          .iterator
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groups, order, k, child) =>
      TopKPerGroupExec(groups, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Install the strategy on a live session (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
  }

  /** Top-k rows per group, ascending=false for "largest first".
    *
    * `orderCol` MUST be a total order over each group's rows (e.g.
    * include a unique id as the final tiebreak, as the row_number
    * reference form would): at the k-boundary the heap keeps the
    * first-arrived row among order-ties, so a non-total ordering
    * produces run-dependent output across partitionings/retries.
    * Wrap compound orders as `struct(primary, tiebreak)`. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], orderCol: Column,
                   k: Int, ascending: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    // Let the analyzer resolve the Columns against df (Spark 4 Columns
    // are ColumnNode-backed; a throwaway aliased select is the
    // supported resolution path), then unwrap the alias children.
    val named = groupCols.zipWithIndex.map { case (c, i) => c.as(s"_grp_$i") } :+
      orderCol.as("_ord")
    val proj = df.select(named: _*).queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
    val exprs = proj.projectList.map {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }
    val (groups, ord) = (exprs.init, exprs.last)
    val sortOrder =
      if (ascending) SortOrder(ord, Ascending)
      else SortOrder(ord, org.apache.spark.sql.catalyst.expressions.Descending)
    GraftColumnBridge.ofRows(spark,
      TopKPerGroup(groups, Seq(sortOrder), k, proj.child))
  }
}
