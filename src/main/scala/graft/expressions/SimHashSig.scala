package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole SimHash fingerprint of a document in ONE row-local kernel:
  * space-split tokens -> 60-bit double-polyhash token hash (identical to
  * graft.functions.Sketches.tokenHash) -> 64 signed bit counters ->
  * majority-vote fingerprint.
  *
  * Replaces explode(tokens) -> udaf(Aggregator): like MinHashSig, the
  * fingerprint is a pure function of one document, so the former shuffle
  * of every token row bought nothing. Token boundaries are every single
  * space byte, including empty tokens at runs — exactly split(text, ' ')
  * / DuckDB string_split semantics, so the oracle mirror is unchanged.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sim_hash_sig requires STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    SimHashSig.compute(v.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.SimHashSig.compute($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
  override def prettyName: String = "sim_hash_sig"
}

object SimHashSig {
  def compute(bytes: Array[Byte]): Long = {
    val counters = new Array[Int](64)
    var start = 0
    var pos = 0
    while (pos <= bytes.length) {
      if (pos == bytes.length || bytes(pos) == ' '.toByte) {
        // token = bytes[start, pos): the same 60-bit combined hash as
        // Sketches.tokenHash (h2 * 2^30 + h1)
        var h1 = 0L
        var h2 = 0L
        var j = start
        while (j < pos) {
          val b = bytes(j) & 0xff
          h1 = (h1 * 31L + b) % PolyHash.Mod
          h2 = (h2 * PolyHash.Base2 + b) % PolyHash.Mod2
          j += 1
        }
        val ch = h2 * (1L << 30) + h1
        var i = 0
        while (i < 64) {
          if (((ch >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
          i += 1
        }
        start = pos + 1
      }
      pos += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counters(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def sim_hash_sig(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SimHashSig(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
