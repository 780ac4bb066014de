package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 60-bit hashes of a document's token n-grams in ONE
  * row-local kernel: split-on-space token boundaries, then for each
  * window of n tokens the combined polyhash (h2 * 2^30 + h1,
  * [[PolyHash]]) of the n-gram STRING — computed straight off the
  * document bytes. Because tokens are single-space-delimited, the
  * joined n-gram string ("t1 t2 ... tn") is exactly the substring of
  * the document from the first token's first byte to the last token's
  * last byte, so no n-gram string is ever materialized: values are
  * bit-identical to hash(array_join(slice(tokens, i, n), " ")), which
  * is what the DuckDB oracle computes from the other direction.
  *
  * A kernel rather than transform(sequence, i -> hash(array_join(
  * slice...))) for the WinnowSig reason: HOF lambdas stay interpreted
  * (off the codegen path) and re-slice per window. Returned set is
  * first-occurrence-distinct BY HASH (the downstream df-count key);
  * the oracle mirrors with list_distinct over the hashed list.
  */
case class NgramHashes(child: Expression, n: Int = 5,
                       positional: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, s"ngram_hashes: n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngram_hashes requires STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      if (positional) NgramHashes.computeAll(v.asInstanceOf[UTF8String].getBytes, n)
      else NgramHashes.compute(v.asInstanceOf[UTF8String].getBytes, n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (positional) "computeAll" else "compute"
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.NgramHashes.$m($c.getBytes(), $n))")
  }
  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
  override def prettyName: String =
    if (positional) "ngram_pos_hashes" else "ngram_hashes"
}

object NgramHashes {
  private val Empty = Array.emptyLongArray

  def compute(bytes: Array[Byte], n: Int): Array[Long] = {
    val all = computeAll(bytes, n)
    if (all.length <= 1) return all
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var g = 0
    while (g < all.length) { out.add(all(g)); g += 1 }
    if (out.size == all.length) return all
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }

  /** All window hashes in POSITIONAL order (index i = the n-gram starting
    * at token i), non-distinct — the span-detection input, where repeats
    * and positions both matter. [[compute]] is first-occurrence-distinct
    * over this sequence. */
  def computeAll(bytes: Array[Byte], n: Int): Array[Long] = {
    if (n < 1) return Empty // defense in depth: the expression requires n >= 1
    // token i spans [starts(i), ends(i)); split-on-' ' semantics keep
    // empty tokens, matching split()/string_split on both engines
    var tokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') tokens += 1; i += 1 }
    if (tokens < n) return Empty
    val starts = new Array[Int](tokens)
    val ends = new Array[Int](tokens)
    starts(0) = 0
    var t = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val arr = new Array[Long](tokens - n + 1)
    var g = 0
    while (g <= tokens - n) {
      var h1 = 0L
      var h2 = 0L
      var j = starts(g)
      val hi = ends(g + n - 1)
      while (j < hi) {
        val c = bytes(j) & 0xff
        h1 = (h1 * 31L + c) % PolyHash.Mod
        h2 = (h2 * PolyHash.Base2 + c) % PolyHash.Mod2
        j += 1
      }
      arr(g) = h2 * (1L << 30) + h1
      g += 1
    }
    arr
  }

  def ngram_hashes(c: Column, n: Int = 5): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NgramHashes(org.apache.spark.sql.graft.ColumnBridge.expression(c), n))

  /** Positional (non-distinct) variant: element i is the hash of the
    * n-gram starting at token i. */
  def ngram_pos_hashes(c: Column, n: Int = 5): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NgramHashes(org.apache.spark.sql.graft.ColumnBridge.expression(c), n,
        positional = true))
}
