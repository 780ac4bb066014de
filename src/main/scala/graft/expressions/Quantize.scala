package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnBridge

/** Native codegen kernels for the int8-quantization error report
  * (Similarity.quantizationReport). The HOF form — aggregate(zip_with)
  * twice per row — interprets four lambdas per element; these compile to
  * primitive loops inside whole-stage codegen.
  *
  * Arithmetic mirrors Similarity.quantizeInt8 exactly: scale = max|x_i|
  * folded from 0.0; q_i = round(x_i * 127 / scale) using Spark round's
  * decimal HALF_UP (java.math.BigDecimal.valueOf — the shortest decimal
  * representation, identical to the SQL `round(x, 0)` both engines run);
  * error = max_i |x_i - q_i * scale / 127|.
  */
private[expressions] trait ArrayDoubleKernel extends UnaryExpression {
  override def dataType: DataType = DoubleType

  protected def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }
}

/** max(|x_i|) folded from 0.0 — the per-vector symmetric-quantization
  * scale. */
case class ArrayMaxAbs(child: Expression) extends ArrayDoubleKernel {
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val f = isFloat
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      val v = math.abs(if (f) x.getFloat(i).toDouble else x.getDouble(i))
      if (v > s) s = v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    // freshName locals — see DotProduct.doGenCode: fixed names collide
    // across instances in one codegen scope
    val s = ctx.freshName("amaS"); val i = ctx.freshName("amaI")
    val v = ctx.freshName("amaV")
    nullSafeCodeGen(ctx, ev, a => s"""
      double $s = 0.0;
      for (int $i = 0; $i < $a.numElements(); $i++) {
        double $v = Math.abs((double) $a.$get($i));
        if ($v > $s) $s = $v;
      }
      ${ev.value} = $s;""")
  }

  override protected def withNewChildInternal(c: Expression): ArrayMaxAbs =
    copy(child = c)
  override def prettyName: String = "array_max_abs"
}

/** Fused int8 quantize + max reconstruction error: one pass computes the
  * scale, a second quantizes each element with decimal-HALF_UP rounding
  * and folds max |x - q*scale/127|. Replaces two interpreted HOF chains
  * with one codegen'd loop pair. */
case class QuantizeMaxErr(child: Expression) extends ArrayDoubleKernel {
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val f = isFloat
    val n = x.numElements()
    def at(i: Int): Double = if (f) x.getFloat(i).toDouble else x.getDouble(i)
    var scale = 0.0
    var i = 0
    while (i < n) { val v = math.abs(at(i)); if (v > scale) scale = v; i += 1 }
    var err = 0.0
    i = 0
    while (i < n) {
      val v = at(i)
      val q = if (scale == 0.0) 0L
        else java.math.BigDecimal.valueOf(v * 127.0 / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      val e = math.abs(v - q.toDouble * scale / 127.0)
      if (e > err) err = e
      i += 1
    }
    err
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    // freshName locals — see DotProduct.doGenCode
    val n = ctx.freshName("qmeN"); val scale = ctx.freshName("qmeScale")
    val i = ctx.freshName("qmeI"); val v = ctx.freshName("qmeV")
    val err = ctx.freshName("qmeErr"); val i2 = ctx.freshName("qmeI2")
    val v2 = ctx.freshName("qmeV2"); val q = ctx.freshName("qmeQ")
    val e = ctx.freshName("qmeE")
    nullSafeCodeGen(ctx, ev, a => s"""
      int $n = $a.numElements();
      double $scale = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        double $v = Math.abs((double) $a.$get($i));
        if ($v > $scale) $scale = $v;
      }
      double $err = 0.0;
      for (int $i2 = 0; $i2 < $n; $i2++) {
        double $v2 = (double) $a.$get($i2);
        long $q = 0L;
        if ($scale != 0.0) {
          $q = (long) java.math.BigDecimal.valueOf($v2 * 127.0 / $scale)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
        }
        double $e = Math.abs($v2 - (double) $q * $scale / 127.0);
        if ($e > $err) $err = $e;
      }
      ${ev.value} = $err;""")
  }

  override protected def withNewChildInternal(c: Expression): QuantizeMaxErr =
    copy(child = c)
  override def prettyName: String = "quantize_max_err"
}

object Quantize {
  def array_max_abs(a: Column): Column =
    ColumnBridge.column(ArrayMaxAbs(ColumnBridge.expression(a)))
  def quantize_max_err(a: Column): Column =
    ColumnBridge.column(QuantizeMaxErr(ColumnBridge.expression(a)))
}
