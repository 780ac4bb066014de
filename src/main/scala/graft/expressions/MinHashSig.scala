package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature of a document in ONE row-local kernel:
  * byte-window shingles -> polyhash -> running min under all 64
  * Carter-Wegman permutations (constants from graft.functions.Sketches —
  * the same single source of truth the DuckDB oracle embeds).
  *
  * This replaces an explode(shingles) -> udaf(Aggregator) pipeline: the
  * signature is a pure function of one document, so shipping ~len rows
  * through a hash aggregate bought distribution nothing and cost a full
  * shuffle of the shingle stream. As a native expression the signature
  * materializes inside the scan's generated stage — zero shuffle, and the
  * min over a duplicated shingle equals the min over the distinct set, so
  * set semantics are preserved without an array_distinct.
  *
  * Byte-wise over UTF-8 (= per-character for ASCII corpora, matching the
  * oracle's character slices). Documents shorter than one shingle have no
  * shingle set — callers filter them out rather than hashing a truncated
  * window.
  */
case class MinHashSig(child: Expression, n: Int = 5) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"min_hash_sig requires STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(MinHashSig.compute(v.asInstanceOf[UTF8String].getBytes, n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.MinHashSig.compute($c.getBytes(), $n))")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "min_hash_sig"
}

object MinHashSig {
  import graft.functions.Sketches.{NumHashes, P31, UnivA, UnivB}

  def compute(bytes: Array[Byte], n: Int): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    val a = UnivA
    val b = UnivB
    val last = bytes.length - n
    var pos = 0
    while (pos <= last) {
      var h = 0L
      var j = 0
      while (j < n) {
        h = (h * 31L + (bytes(pos + j) & 0xff)) % PolyHash.Mod
        j += 1
      }
      var i = 0
      while (i < NumHashes) {
        val v = (a(i) * h + b(i)) % P31
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      pos += 1
    }
    sig
  }

  def min_hash_sig(c: Column, n: Int = 5): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graft.ColumnBridge.expression(c), n))
}
