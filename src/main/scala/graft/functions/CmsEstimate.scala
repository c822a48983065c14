package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query over a serialized count-min sketch — the read side Spark
  * ships only half of: the built-in `count_min_sketch` aggregate BUILDS
  * the sketch (a mergeable binary, the 100 TB frequency-table pattern:
  * store sketches, not counts), but no built-in function can ask one
  * "how often did this value occur?". This expression closes the
  * lifecycle: `cms_estimate(sketch, value)` deserializes the standard
  * `CountMinSketch` wire format and returns the depth-minimum counter.
  *
  * Codegen is a single static call ([[CmsEstimate.estimate]]), so the
  * expression stays inside whole-stage codegen. Deserialization happens
  * per evaluation — acceptable by design: estimates are asked of k-row
  * AGGREGATED frames (one sketch per group × a handful of probe values),
  * never per fact row; a per-fact-row use would hoist the deserialized
  * sketch instead.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(sk: Any, v: Any): Any =
    CmsEstimate.estimate(sk.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, v) =>
      s"${ev.value} = graft.functions.CmsEstimate.estimate($sk, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  /** Deserialize-and-query; called from generated code via the static
    * forwarder. Long values hash exactly as the building aggregate
    * hashed the input column, so estimates match the write side. */
  def estimate(sketch: Array[Byte], value: Long): Long =
    CountMinSketch.readFrom(sketch).estimateCount(java.lang.Long.valueOf(value))
}
