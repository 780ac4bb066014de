package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnBridge

/** Sequential-fold dot product of two numeric arrays, accumulated in
  * double — a native Catalyst expression with whole-stage codegen.
  *
  * This is the hot kernel of the similarity operators: the HOF equivalent
  * (`aggregate(zip_with(...))`) allocates an intermediate array and
  * interprets two lambdas per row; this compiles to a tight primitive
  * loop inside the generated stage. The fold is strictly left-to-right,
  * so results are bit-identical to the HOF form and to the DuckDB oracle
  * (list_dot_product over DOUBLE[]).
  *
  * Accepts float or double element types on either side (embeddings are
  * ARRAY<FLOAT>, hyperplanes ARRAY<DOUBLE>).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elem(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other => other
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product requires ARRAY<FLOAT|DOUBLE>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elem(left) == FloatType
    val rf = elem(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elem(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elem(right) == FloatType) "getFloat" else "getDouble"
    // freshName, NOT fixed locals: two DotProducts in one codegen scope
    // (e.g. the 16-codeword PQ argmax) would otherwise redefine the
    // loop variables — janino rejects the stage and Spark silently
    // falls back to interpreted evaluation, which is exactly the
    // "expression fell out of codegen" cost the PQ rewrite measured.
    val n = ctx.freshName("dpN")
    val s = ctx.freshName("dpS")
    val i = ctx.freshName("dpI")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $n = Math.min($a.numElements(), $b.numElements());
      double $s = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        $s += (double) $a.$lGet($i) * (double) $b.$rGet($i);
      }
      ${ev.value} = $s;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

object DotProduct {
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
