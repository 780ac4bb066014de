package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnBridge

/** |a ∩ b| for two SORTED-ASCENDING, DISTINCT bigint arrays as one
  * two-pointer merge — the hot kernel of the minhash-calibration truth
  * join, where each candidate pair intersects two ~1k-element distinct
  * shingle-hash arrays.
  *
  * The `size(array_intersect(a, b))` form this replaces builds a hash
  * set of one side, a distinct-tracking set of the output, AND the
  * intersection array itself per PAIR, only for `size` to throw the
  * array away. With the per-doc arrays sorted once at creation
  * (`sort_array(array_distinct(...))` — n log n per doc, paid per doc
  * not per pair), the count is an allocation-free linear merge.
  *
  * Equivalence to size(array_intersect(distinct_a, distinct_b)): both
  * count the distinct common elements; sorting changes neither the set
  * nor its cardinality. Null elements mirror array_intersect's
  * null-equality: a null present in BOTH arrays contributes 1
  * (sort_array ascending places the at-most-one null of a distinct
  * array first). Inputs MUST be distinct and sorted — the caller owns
  * that contract (CalibrationKernelSpec pins the equivalence over
  * adversarial inputs incl. nulls and empties).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires ARRAY<BIGINT>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    val aNull = na > 0 && a.isNullAt(0)
    val bNull = nb > 0 && b.isNullAt(0)
    if (aNull && bNull) c += 1
    if (aNull) i = 1
    if (bNull) j = 1
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName locals — see DotProduct.doGenCode: fixed names collide
    // across instances in one codegen scope
    val na = ctx.freshName("sicNa"); val nb = ctx.freshName("sicNb")
    val i = ctx.freshName("sicI"); val j = ctx.freshName("sicJ")
    val c = ctx.freshName("sicC"); val x = ctx.freshName("sicX")
    val y = ctx.freshName("sicY")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $na = $a.numElements();
      int $nb = $b.numElements();
      int $i = 0; int $j = 0; long $c = 0L;
      if ($na > 0 && $a.isNullAt(0)) { $i = 1; if ($nb > 0 && $b.isNullAt(0)) $c++; }
      if ($nb > 0 && $b.isNullAt(0)) { $j = 1; }
      while ($i < $na && $j < $nb) {
        long $x = $a.getLong($i);
        long $y = $b.getLong($j);
        if ($x == $y) { $c++; $i++; $j++; }
        else if ($x < $y) { $i++; } else { $j++; }
      }
      ${ev.value} = $c;""")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedIntersectCount = copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

object IntersectCount {
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
