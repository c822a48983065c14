package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd sign-LSH projection: the raw dot products of a 64-d
  * float embedding against the 16 deterministic ±1 hyperplanes used by the
  * embedding-cosine near-dup operator, all computed in one fused pass.
  *
  * The built-in formulation is 16 separate
  * `aggregate(zip_with(embedding, ±1-literal-array, (x,y) -> x*y), 0D,
  * (acc,z) -> acc+z)` folds — each allocates a product array per row and
  * runs interpreted (HOF lambdas are CodegenFallback, evicting the whole
  * projection from whole-stage codegen). This expression returns the 16
  * raw sums as ARRAY<DOUBLE>; the caller applies the same `round(_, 9) > 0`
  * bit logic with built-ins, so the DuckDB oracle stays untouched.
  *
  * Bit-compatibility with the HOF fold (and the oracle's mirrored
  * list_sum): products accumulate LEFT-TO-RIGHT over elements, each
  * product is `CAST(x AS DOUBLE) * (±1.0)` — and IEEE-754 guarantees
  * `x * 1.0 == x` and `x * -1.0 == -x` bitwise, so the branch form below
  * is exact, not approximate. The planes are exactly 64-d, so inputs of
  * any other length (or with null elements) throw rather than silently
  * dotting a prefix — the HOF fold the expression replaced yielded NULL
  * there, and a quiet prefix dot would mask a schema drift.
  *
  * The ±1 plane matrix is the public-domain md5("p:i") top-bit
  * construction (see [[SignDots16.planeSign]]); both this expression and
  * the oracle SQL literals derive from the same matrix.
  */
case class SignDots16(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sign_dots16"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != SignDots16.Dim)
      throw new IllegalArgumentException(
        s"sign_dots16 requires a ${SignDots16.Dim}-element ARRAY<FLOAT>, " +
          s"got ${x.numElements()} elements")
    val out = new Array[Double](SignDots16.NumPlanes)
    var p = 0
    while (p < SignDots16.NumPlanes) {
      var s = 0.0
      var i = 0
      while (i < SignDots16.Dim) {
        if (x.isNullAt(i))
          throw new IllegalArgumentException(
            s"sign_dots16 requires a null-free embedding; element $i is null")
        val v = x.getFloat(i).toDouble
        s += (if (SignDots16.planesFlat((p << 6) | i)) v else -v)
        i += 1
      }
      out(p) = s
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("planesFlat", SignDots16.planesFlat, "boolean[]")
      val out    = ctx.freshName("out")
      val p      = ctx.freshName("p")
      val i      = ctx.freshName("i")
      val s      = ctx.freshName("s")
      val v      = ctx.freshName("v")
      s"""
         |if ($a.numElements() != ${SignDots16.Dim}) {
         |  throw new IllegalArgumentException(
         |    "sign_dots16 requires a ${SignDots16.Dim}-element ARRAY<FLOAT>, got "
         |      + $a.numElements() + " elements");
         |}
         |double[] $out = new double[${SignDots16.NumPlanes}];
         |for (int $p = 0; $p < ${SignDots16.NumPlanes}; $p++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < ${SignDots16.Dim}; $i++) {
         |    if ($a.isNullAt($i)) {
         |      throw new IllegalArgumentException(
         |        "sign_dots16 requires a null-free embedding; element " + $i + " is null");
         |    }
         |    double $v = (double) $a.getFloat($i);
         |    $s += $planes[($p << 6) | $i] ? $v : -$v;
         |  }
         |  $out[$p] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignDots16 {
  val NumPlanes = 16
  val Dim       = 64

  /** Deterministic ±1 from the top bit of md5("p:i") — a public-domain
    * construction both engines can recompute; the oracle SQL bakes the
    * same matrix as literals. */
  def planeSign(p: Int, i: Int): Boolean = {
    val h = java.security.MessageDigest
      .getInstance("MD5").digest(s"$p:$i".getBytes("UTF-8"))
    (h(0) & 0x80) != 0
  }

  /** Row-major [plane << 6 | dim] flattening of the plane matrix. */
  val planesFlat: Array[Boolean] = {
    val a = new Array[Boolean](NumPlanes * Dim)
    for (p <- 0 until NumPlanes; i <- 0 until Dim)
      a((p << 6) | i) = planeSign(p, i)
    a
  }
}
