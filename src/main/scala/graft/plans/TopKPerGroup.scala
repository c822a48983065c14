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
  * Wiring: logical node → [[TopKPerGroupStrategy]] → a PARTIAL
  * [[TopKPerGroupExec]] (no distribution requirement: each input
  * partition is reduced to ≤ k rows per group map-side, the top-k analog
  * of partial aggregation — top-k of the union of per-partition top-ks
  * IS the global top-k) feeding a FINAL exec whose
  * `requiredChildDistribution` is `ClusteredDistribution(group)`, so
  * EnsureRequirements plans exactly one hash shuffle — carrying at most
  * partitions·groups·k rows instead of the full input (at 100 TB the
  * difference between shuffling k rows per group per map task and
  * shuffling the dataset).
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
    partial: Boolean,
    child: SparkPlan,
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // Final pass: one hash shuffle on the group key (no sort — the heap
  // replaces it). Partial pass: runs in place on whatever partitioning
  // the child has, shrinking each partition to ≤ k rows per group before
  // the exchange.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else Seq(ClusteredDistribution(groupExprs))

  // The heap filter drops rows but never moves them, so the child's
  // partitioning survives (doExecute's preservesPartitioning at the RDD
  // level). Without this override the partial node would report
  // UnknownPartitioning and force a redundant Exchange even when the
  // input is already hash-partitioned on the group key.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"

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
      // Two-phase: partial (map-side, pre-shuffle) then final (clustered)
      // — selection is monotone, so top-k ∘ union ∘ per-partition-top-k
      // equals global top-k exactly.
      TopKPerGroupExec(group, order, k, partial = false,
        TopKPerGroupExec(group, order, k, partial = true,
          planLater(child))) :: Nil
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
