package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** L2-normalize an array<double> as ONE codegen'd expression.
  *
  * Bit-identical to the declarative pair it replaces —
  * `transform(e, x -> x / sqrt(graft_dot(e, e)))` — by construction: the
  * norm is the SAME sequential left-fold dot (((0 + x0²) + x1²) + ...)
  * under one `Math.sqrt`, and each element is divided by that double. The
  * DuckDB `[x / nrm for x in e]` oracle twins keep matching unchanged.
  *
  * Why: `transform` is a HigherOrderFunction — interpreted per row with a
  * lambda invocation and array allocation per element. Normalization sits
  * on the hot path of every vector operator (q25/q33/q34/q59); this runs
  * as a primitive loop inside whole-stage codegen.
  *
  * Null semantics match the pair: null input or any null element → null
  * (graft_dot yields a null norm there, which nulls the division);
  * empty array → empty array; an all-zero vector divides by 0.0 and
  * yields IEEE ±NaN/Inf exactly like the declarative form.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_l2norm expects array<double>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2norm"

  override def nullSafeEval(input: Any): Any =
    L2Normalize.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.L2Normalize.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {
  /** Null on any null element (mirrors the graft_dot-based norm). */
  def compute(e: ArrayData): ArrayData = {
    val n = e.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (e.isNullAt(i)) return null
      val x = e.getDouble(i)
      acc += x * x
      i += 1
    }
    val nrm = Math.sqrt(acc)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = e.getDouble(i) / nrm; i += 1 }
    new GenericArrayData(out)
  }
}
