package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass repetition statistics over a word array:
  * `[distinct_words, distinct_bigrams, top_word_count]` as array<bigint>.
  *
  * Semantically identical (for the null-free arrays `split` produces) to the
  * declarative triple
  *   size(array_distinct(ws)),
  *   size(array_distinct(transform(slice(ws,1,n-1), (w,i) -> w || ' ' || ws[i+1]))),
  *   array_max(transform(array_distinct(ws), w -> size(filter(ws, x -> x = w))))
  * — the DuckDB list_distinct/list_filter oracle keeps matching because all
  * three outputs are exact integers. The declarative form runs as nested
  * interpreted HigherOrderFunctions: the top-word count alone is
  * O(distinct × words) with a per-element lambda allocation, which benched
  * q78 at 1.5 s for 5,000 docs (~0.3 ms/doc — pure interpreter overhead).
  * This loop is one hash-map pass per document, O(words), at scan speed.
  *
  * A null element (impossible from `split`) is counted as the empty string.
  */
case class RepStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_repstats expects array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_repstats"

  override def nullSafeEval(input: Any): Any =
    RepStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

object RepStats {
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val counts = new java.util.HashMap[String, Integer](Math.max(16, n * 2))
    val bigrams = new java.util.HashSet[String](Math.max(16, n * 2))
    var topc = 0
    var prev: String = null
    var i = 0
    while (i < n) {
      val w = if (words.isNullAt(i)) "" else words.getUTF8String(i).toString
      val c = counts.merge(w, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
      if (c > topc) topc = c
      if (prev != null) bigrams.add(prev + " " + w)
      prev = w
      i += 1
    }
    new GenericArrayData(
      Array[Any](counts.size.toLong, bigrams.size.toLong, topc.toLong))
  }
}
