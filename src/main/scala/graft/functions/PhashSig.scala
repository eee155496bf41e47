package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** q136's perceptual signature of a word array as ONE codegen'd
  * expression, returning the 16-char pixel string (or NULL for inputs
  * under ShingleN words — the caller filters, mirroring the shingle
  * pipeline's `size(w) >= n` gate): a one-permutation binned min-hash
  * (Li/König's one-permutation hashing, public knowledge) — each word
  * 3-gram hashes to a 60-bit h (first 15 md5 hex digits, identical to
  * `conv(substr(md5(s), 1, 15), 16, 10)` and the oracle's nibble fold),
  * bin k ∈ [0,16) takes min(h) over grams with h % 16 = k, and the bin's
  * next nibble ((min div 16) % 16) becomes one hex pixel, '-' for an
  * empty bin.
  *
  * This replaced the explode → 16-conditional-min groupBy(doc_id)
  * aggregation: the signature is a pure per-row reduction, so computing
  * it in-row makes the grid build a NARROW SCAN — the corpus-wide
  * doc_id hash shuffle (the only exchange in the old derivation)
  * disappears entirely, and the streaming twin shares this exact
  * derivation instead of mirroring it. One md5 per gram, one pass.
  */
case class PhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_phashsig expects array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_phashsig"

  override def nullSafeEval(input: Any): Any =
    PhashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PhashSig.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PhashSig =
    copy(child = newChild)
}

object PhashSig {
  val ShingleN = 3
  val Bins = 16

  private val hexd = "0123456789abcdef"

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** 60-bit int from the first 15 hex digits of an md5 digest (the
    * MinHash12.hash60 / WinnowFps derivation — kept locally identical). */
  private def hash60(md: MessageDigest, bytes: Array[Byte]): Long = {
    val d = md.digest(bytes)
    var h = 0L
    var k = 0
    while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    (h << 4) | ((d(7) >> 4) & 0xfL)
  }

  def compute(words: ArrayData): UTF8String = {
    val n = words.numElements()
    if (n < ShingleN) return null
    val strs = new Array[String](n)
    var w = 0
    while (w < n) {
      strs(w) = if (words.isNullAt(w)) null else words.getUTF8String(w).toString
      w += 1
    }
    UTF8String.fromString(computeWords(strs))
  }

  /** Shared core — also the streaming path's in-row derivation
    * (Multimodal.phashSignatureJvm). Null words are skipped inside a gram
    * like concat_ws does. */
  def computeWords(words: Array[String]): String = {
    val md = digests.get()
    val mins = Array.fill(Bins)(Long.MaxValue)
    val nGrams = words.length - ShingleN + 1
    var i = 0
    while (i < nGrams) {
      val sb = new java.lang.StringBuilder
      var first = true
      var t = 0
      while (t < ShingleN) {
        if (words(i + t) != null) {
          if (!first) sb.append(' ')
          sb.append(words(i + t))
          first = false
        }
        t += 1
      }
      val h = hash60(md, sb.toString.getBytes("UTF-8"))
      val b = (h % Bins).toInt
      if (h < mins(b)) mins(b) = h
      i += 1
    }
    val out = new java.lang.StringBuilder(Bins)
    var k = 0
    while (k < Bins) {
      out.append(if (mins(k) == Long.MaxValue) '-'
        else hexd.charAt(((mins(k) / 16) % 16).toInt))
      k += 1
    }
    out.toString
  }
}
