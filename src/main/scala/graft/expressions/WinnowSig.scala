package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints of a document in ONE row-local kernel:
  * byte-window k-gram polyhashes -> sliding-window-of-w minima
  * (monotonic deque, O(len)) -> first-occurrence-distinct set. The MOSS
  * selection scheme: any shared substring of length >= w + k - 1 shares
  * a fingerprint while only ~2/(w+1) of the shingle volume is kept.
  *
  * A kernel rather than nested HOFs for the same reason as MinHashSig —
  * and one more: Catalyst's CollapseProject fuses staged projections, so
  * a lambda `slice(hs, j, w)` re-evaluates the whole O(len) hash
  * sequence per window, making the HOF form O(len^2) per document
  * (measured: 68 s vs ~2 s at sf0.001). The compositional HOF pair
  * (Dedup.shingleHashes / winnowMinima) is kept as the cross-check
  * reference, exactly like the sketch kernels.
  *
  * Values are identical to the HOF/oracle forms: the deque pops on >=,
  * but the reported WINDOW MINIMUM VALUE is tie-invariant.
  */
case class WinnowSig(child: Expression, k: Int = 5, w: Int = 8)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_sig requires STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(WinnowSig.compute(v.asInstanceOf[UTF8String].getBytes, k, w))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.WinnowSig.compute($c.getBytes(), $k, $w))")
  override protected def withNewChildInternal(newChild: Expression): WinnowSig =
    copy(child = newChild)
  override def prettyName: String = "winnow_sig"
}

object WinnowSig {
  private val Empty = Array.emptyLongArray

  def compute(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val nSh = bytes.length - k + 1
    if (nSh < w) return Empty
    val hs = new Array[Long](nSh)
    var pos = 0
    while (pos < nSh) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 31L + (bytes(pos + j) & 0xff)) % PolyHash.Mod; j += 1 }
      hs(pos) = h
      pos += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](nSh)
    var head = 0
    var tail = 0 // deque indices live in [head, tail)
    var i = 0
    while (i < nSh) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hs(deque(head)))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var t = 0
    while (it.hasNext) { arr(t) = it.next(); t += 1 }
    arr
  }

  def winnow_sig(c: Column, k: Int = 5, w: Int = 8): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WinnowSig(org.apache.spark.sql.graft.ColumnBridge.expression(c), k, w))
}
