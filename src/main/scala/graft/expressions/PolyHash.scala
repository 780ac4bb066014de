package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial fingerprint of a string:
  * h = fold(chars)(h * base + c) mod `mod` (default 31 / 1e9+7).
  *
  * A native Catalyst expression with whole-stage codegen (no UDF
  * serialization, stays inside the generated loop) — the document-
  * fingerprinting primitive of the training-data pipeline. The modulus
  * keeps every intermediate below 2^35 so the same arithmetic is
  * reproducible in engines without wrapping 64-bit multiply (e.g. a
  * DuckDB list_reduce mirror). A second (base, mod) instantiation gives
  * an independent hash family member — combined they yield the 60-bit
  * oracle-reproducible token hash used by SimHash.
  *
  * Byte-wise over UTF-8; for ASCII corpora this equals the per-character
  * definition.
  */
case class PolyHash(child: Expression, base: Long = 31L,
                    mod: Long = PolyHash.Mod) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyhash requires STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    PolyHash.hash(v.asInstanceOf[UTF8String].getBytes, base, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.PolyHash.hash($c.getBytes(), ${base}L, ${mod}L)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
  override def prettyName: String = "polyhash"
}

object PolyHash {
  final val Mod = 1000000007L
  /** The second family member (SimHash's upper 30 bits). */
  final val Base2 = 131L
  final val Mod2 = 998244353L

  def hash(bytes: Array[Byte]): Long = hash(bytes, 31L, Mod)

  def hash(bytes: Array[Byte], base: Long, mod: Long): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * base + (bytes(i) & 0xff)) % mod
      i += 1
    }
    h
  }

  def polyhash(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PolyHash(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  def polyhashWith(c: Column, base: Long, mod: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PolyHash(org.apache.spark.sql.graft.ColumnBridge.expression(c), base, mod))
}
