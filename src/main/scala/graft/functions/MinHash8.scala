package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 8-way MinHash over a shingle array in ONE fused pass — the
  * signature kernel of the MinHash-LSH dedup operator (d02/d07).
  *
  * The built-in formulation is ten interpreted array passes per row:
  * `transform(sh, x -> md5('a:'||x))`, the same for seed 'b', then eight
  * `array_min(transform(src, x -> substring(x, off, 8)))` folds — each a
  * CodegenFallback HOF allocating intermediate string arrays. This
  * expression walks the shingles once, computes the two seeded digests
  * per shingle, and tracks the eight 32-bit quarter minima directly.
  *
  * Bit-compatibility with the built-in chain (and the mirrored DuckDB
  * list_min ∘ list_transform ∘ substr oracle): `substring(md5hex,
  * 4q*8+1, 8)` is exactly the lowercase hex of digest bytes 4q..4q+3,
  * and comparing equal-length lowercase hex strings lexicographically is
  * comparing the 32-bit values unsigned — so tracking unsigned-int
  * minima and formatting `%08x` at the end reproduces the string min
  * exactly. Hash input bytes are the UTF-8 seed prefix ("a:"/"b:")
  * concatenated with the shingle's UTF-8 bytes, identical to
  * `md5('a:' || x)`.
  *
  * Empty input yields null (matching `array_min` over an empty
  * transform); null elements are rejected loudly (the shingle arrays are
  * produced null-free by construction).
  */
case class MinHash8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash8"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHash8.compute(input.asInstanceOf[ArrayData])

  // The md5 work dominates; codegen's job is keeping the row pipeline in
  // whole-stage codegen (no lambda dispatch, no intermediate arrays), so
  // the generated code calls the same static kernel eval uses.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MinHash8.compute($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash8 {
  private val SeedA = "a:".getBytes("UTF-8")
  private val SeedB = "b:".getBytes("UTF-8")

  // One digest per executor thread, reset per update cycle — a
  // per-ROW getInstance would pay a JCA provider lookup and allocation
  // inside the hot kernel this expression exists to streamline.
  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One pass: per shingle, md5("a:"||x) and md5("b:"||x); minima of the
    * four big-endian 32-bit quarters of each digest (8 mins total),
    * formatted as the lowercase 8-hex-char strings the built-in
    * substring chain produces. Null for an empty array. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md   = localMd.get()
    val mins = Array.fill(8)(-1) // 0xffffffff = unsigned max
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"minhash8 requires a null-free shingle array; element $i is null")
      val sh = arr.getUTF8String(i).getBytes
      var seed = 0
      while (seed < 2) {
        md.reset()
        md.update(if (seed == 0) SeedA else SeedB)
        md.update(sh)
        val dig = md.digest()
        var q = 0
        while (q < 4) {
          val v =
            ((dig(4 * q) & 0xff) << 24) |
              ((dig(4 * q + 1) & 0xff) << 16) |
              ((dig(4 * q + 2) & 0xff) << 8) |
              (dig(4 * q + 3) & 0xff)
          val slot = seed * 4 + q
          if (java.lang.Integer.compareUnsigned(v, mins(slot)) < 0)
            mins(slot) = v
          q += 1
        }
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(v => UTF8String.fromString(f"${v & 0xffffffffL}%08x")
        .asInstanceOf[AnyRef]))
  }
}
