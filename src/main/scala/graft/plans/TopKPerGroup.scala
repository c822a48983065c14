package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator Catalyst extension (the (c) tier of the custom-operator
  * preference order): per-group top-k as a first-class physical operator.
  *
  * The built-in formulation (q08: `row_number() OVER (PARTITION BY g
  * ORDER BY o) <= k`, WindowExec) must FULLY SORT every group before it
  * can number rows — O(n log n) per partition and a complete sort buffer
  * even though only k rows per group survive. This operator keeps a
  * bounded k-element heap per group — O(n log k) time, O(groups·k)
  * memory — the same asymptotic win TakeOrderedAndProject delivers for
  * global top-k (q11), generalized to grouped data.
  *
  * Wiring: logical node → [[TopKPerGroupStrategy]] → [[TopKPerGroupExec]]
  * whose `requiredChildDistribution` is `ClusteredDistribution(group)`,
  * so EnsureRequirements plans exactly one hash shuffle on the group key
  * — the same exchange the window plan needs, minus the sort.
  * Registered per session via `spark.experimental.extraStrategies` (works
  * on any session at runtime) or `spark.sql.extensions` +
  * [[graft.functions.GraftExtensions]].
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // One hash shuffle on the group key; no sort requirement — the heap
  // replaces it.
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE      = groupExprs
    val orderE      = ordering
    val limit       = k
    child.execute().mapPartitions({ rows =>
      val groupProj = UnsafeProjection.create(groupE, childOutput)
      val cmp       = GenerateOrdering.generate(orderE, childOutput)
      // Max-heap of the k smallest-by-ordering rows per group: the head is
      // the WORST retained row, evicted when a better one arrives.
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, JPriorityQueue[UnsafeRow]]
      rows.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.getOrElseUpdate(
          key.copy(),
          new JPriorityQueue[UnsafeRow](limit + 1, cmp.reversed()))
        if (heap.size < limit) {
          heap.add(row.copy().asInstanceOf[UnsafeRow])
        } else if (cmp.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        val buf = new Array[UnsafeRow](heap.size)
        var i   = heap.size - 1
        while (i >= 0) { buf(i) = heap.poll(); i -= 1 } // best-first
        buf.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(group, order, k, child) =>
      TopKPerGroupExec(group, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Per-group top-k over `df`: for each distinct value of `groupCols`,
    * the `k` first rows under `orderCols` (include tie-breaker columns
    * for determinism, exactly as a window formulation would need). */
  def perGroup(
      spark: SparkSession,
      df: DataFrame,
      groupCols: Seq[Column],
      orderCols: Seq[Column],
      k: Int): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    val analyzed = df.queryExecution.analyzed
    val order = orderCols.map(Bridge.expr(spark, _)).map {
      case s: SortOrder => s
      case e            => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    Bridge.ofRows(
      spark,
      TopKPerGroup(groupCols.map(Bridge.expr(spark, _)), order, k, analyzed))
  }
}
