package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 12-hash MinHash signature of a word array as ONE codegen'd expression.
  *
  * Bit-compatible with the declarative explode→groupBy formulation (and its
  * DuckDB oracle twin): for each 3-word shingle `s` (words joined by ' ',
  * nulls skipped — concat_ws semantics) and each seed i in 0..11, the
  * candidate is the lowercase hex of md5("<i>|<s>"), and slot i of the
  * signature is the lexicographic minimum over shingles. Fewer than 3 words
  * ⇒ an EMPTY array (the caller filters, mirroring the `size(w) >= 3`
  * shingle filter). Duplicate shingles are harmless (min is
  * duplicate-insensitive) — exactly why the signature path never needed a
  * distinct.
  *
  * Why an expression: the declarative path explodes O(words) shingle rows
  * per document and runs them through a hash aggregate just to take 12
  * column-wise mins. This loop computes the same mins in one scan-speed
  * pass — no explode fan-out, no aggregate hash table, and the md5s run on
  * reused digest + byte buffers (digests compared as raw bytes, hexified
  * only for the 12 winners).
  */
case class MinHash12(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash12 expects array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash12"

  override def nullSafeEval(input: Any): Any =
    MinHash12.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash12.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHash12 =
    copy(child = newChild)
}

object MinHash12 {
  val NumHashes = 12
  val ShingleN = 3

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val Prefixes: Array[Array[Byte]] =
    Array.tabulate(NumHashes)(i => (i.toString + "|").getBytes("UTF-8"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** Unsigned byte-wise less-than over equal-length digests — identical
    * order to comparing their lowercase-hex strings. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(h: Array[Byte]): String = {
    val out = new Array[Char](h.length * 2)
    var i = 0
    while (i < h.length) {
      out(2 * i) = HexChars((h(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(h(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val md = digests.get()
    val mins = new Array[Array[Byte]](NumHashes)
    var i = 0
    while (i + ShingleN - 1 < n) {
      // Shingle = words[i..i+2] joined by ' ' with nulls skipped, exactly
      // like the concat_ws in the exploded formulation.
      val sb = new java.lang.StringBuilder
      var first = true
      var t = 0
      while (t < ShingleN) {
        if (!words.isNullAt(i + t)) {
          if (!first) sb.append(' ')
          sb.append(words.getUTF8String(i + t).toString)
          first = false
        }
        t += 1
      }
      val sBytes = sb.toString.getBytes("UTF-8")
      var k = 0
      while (k < NumHashes) {
        md.reset()
        md.update(Prefixes(k))
        md.update(sBytes)
        val h = md.digest()
        if (mins(k) == null || less(h, mins(k))) mins(k) = h
        k += 1
      }
      i += 1
    }
    if (mins(0) == null) return new GenericArrayData(Array.empty[Any])
    new GenericArrayData(
      mins.map(h => UTF8String.fromString(hex(h)): Any))
  }
}
