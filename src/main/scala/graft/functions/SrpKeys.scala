package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All SrpBands SRP-LSH band keys of one vector as ONE codegen'd
  * expression: `graft_srpkeys(en, planes, r)` → array<string> of Bands
  * '0'/'1' strings of length r.
  *
  * Semantically identical to the 256-column formulation it replaced (a
  * CASE-guarded sign-bit Project per (band, row), concat per band, substr
  * to r): key[b][k] = '1' iff dot(en, planes[planeIdx(b, k)]) >= 0, with
  * the dot the same sequential left fold as graft_dot — but it runs as one
  * primitive loop computing exactly Bands*r dots, instead of a projection
  * whose generated code grew past JIT comfort at 256 columns (the r7 A/B
  * measured the wide Project ~+0.5 s per evaluation at sf0.1).
  *
  * The (band, row) → plane map keeps rows 0-15 on the original 16-aligned
  * layout (band keys bit-identical to the pre-lift engine whenever r ≤ 16)
  * and extends rows 16-31 from the fresh plane block at LegacyBoundary —
  * see `planeIdx`.
  */
case class SrpKeys(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.DoubleType, _),
            ArrayType(ArrayType(org.apache.spark.sql.types.DoubleType, _), _),
            IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_srpkeys expects (array<double>, array<array<double>>, int), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_srpkeys"

  override def nullSafeEval(en: Any, planes: Any, r: Any): Any =
    SrpKeys.compute(en.asInstanceOf[ArrayData],
      planes.asInstanceOf[ArrayData], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (en, planes, r) => s"graft.functions.SrpKeys.compute($en, $planes, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SrpKeys =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SrpKeys {
  /** Bands and the row cap (2^32 buckets/band ≈ O(1) occupancy to ~10^10
    * vectors); rows 0-15 map to the original 16-aligned plane block below
    * LegacyBoundary, rows 16-31 to the fresh block above it. */
  val Bands = 8
  val MaxRows = 32
  val LegacyRows = 16
  val LegacyBoundary: Int = Bands * LegacyRows // 128

  def planeIdx(band: Int, row: Int): Int =
    if (row < LegacyRows) LegacyRows * band + row
    else LegacyBoundary + LegacyRows * band + (row - LegacyRows)

  /** Bands keys of length r; same sign/fold semantics as the declarative
    * twin (dot = sequential left fold, '1' iff >= 0). */
  def compute(en: ArrayData, planes: ArrayData, r: Int): ArrayData = {
    val dim = en.numElements()
    val keys = new Array[UTF8String](Bands)
    val buf = new Array[Byte](r)
    var b = 0
    while (b < Bands) {
      var k = 0
      while (k < r) {
        val p = planes.getArray(planeIdx(b, k))
        var acc = 0.0
        var i = 0
        while (i < dim) {
          acc += en.getDouble(i) * p.getDouble(i)
          i += 1
        }
        buf(k) = if (acc >= 0) '1' else '0'
        k += 1
      }
      keys(b) = UTF8String.fromBytes(java.util.Arrays.copyOf(buf, r))
      b += 1
    }
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }
}
