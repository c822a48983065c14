package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd 60-bit SimHash over an array of 60-bit word-hash
  * values — the custom-Expression tier of the operator preference order
  * (SURVEY §4.2), fusing what the built-in HOF formulation spends 60
  * separate interpreted `aggregate()` folds on (one per signature bit,
  * each walking the whole array under CodegenFallback) into a single
  * two-level loop inside whole-stage codegen.
  *
  * Semantics — identical to the HOF formulation the DuckDB oracle mirrors:
  * signature bit i is set iff the ±1 vote sum over bit i of every element
  * is strictly positive (vote +1 when the element has bit i set, −1
  * otherwise). Pure integer arithmetic, so fusion cannot change a single
  * bit; the result is order-independent over the input array. Null or
  * empty input arrays yield null / all-zero votes (all bits 0)
  * respectively; element nulls are not expected (the producing transform
  * is a total function over md5 output).
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any = {
    val arr    = input.asInstanceOf[ArrayData]
    val n      = arr.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      var b = 0
      while (b < 60) {
        counts(b) += (if (((v >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b   = 0
    while (b < 60) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n      = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i      = ctx.freshName("i")
      val b      = ctx.freshName("b")
      val v      = ctx.freshName("v")
      val sig    = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  for (int $b = 0; $b < 60; $b++) {
         |    $counts[$b] += ((($v >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($counts[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
