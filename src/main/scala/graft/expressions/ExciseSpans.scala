package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Row-local duplicated-span EXCISION: rebuild a document's text with
  * every token inside a given set of token-index spans removed — the
  * APPLY half of the ExactSubstr pipeline (Lee et al. 2022) whose
  * DETECT half is [[graft.functions.TextAnalytics.dupSpans]].
  *
  * `spans` is the packed form `[s0,e0,s1,e1,...]` — inclusive 0-based
  * token-index ranges sorted by start (overlaps allowed; the kernel
  * merges them with a running max-end while walking tokens once).
  * Token boundaries are split-on-' ' (empty tokens kept), the corpus
  * tokenization contract shared with [[NgramHashes]]; kept tokens are
  * re-joined with single spaces, so a document with no covered tokens
  * round-trips bit-identically and a fully-covered document becomes
  * the empty string. The output is exactly what the DuckDB mirror
  * computes from the other direction (anti-join covered positions,
  * string_agg ORDER BY position) — O(tokens + spans), no per-token
  * string allocation.
  *
  * A kernel rather than filter(split(...), (tok, i) -> ...) for the
  * [[NgramHashes]] reason: HOF lambdas stay interpreted and would
  * re-scan the span list per token.
  */
case class ExciseSpans(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"excise_spans requires (STRING, ARRAY<BIGINT>), got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ExciseSpans.excise(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.ExciseSpans.excise($a.getBytes(), $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExciseSpans =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "excise_spans"
}

object ExciseSpans {

  /** One pass over the document bytes: token boundaries as in
    * [[NgramHashes.computeAll]], then a merged walk (span pointer +
    * running max covered end) emitting kept tokens ' '-joined.
    *
    * Input contract (r11 ADVICE — enforced, not assumed): `packed` must
    * be even-length `[s0,e0,s1,e1,...]` with starts non-decreasing; the
    * merged walk reads spans in start order, so an unsorted or
    * odd-length array would silently excise the wrong tokens. Both
    * checks are O(spans) against an array the caller already built. */
  def excise(bytes: Array[Byte], packed: ArrayData): UTF8String = {
    require(packed.numElements() % 2 == 0,
      s"excise_spans: packed span array has odd length ${packed.numElements()}")
    val m = packed.numElements() / 2
    if (m == 0) return UTF8String.fromBytes(bytes)
    var chk = 1
    while (chk < m) {
      require(packed.getLong(2 * chk) >= packed.getLong(2 * (chk - 1)),
        s"excise_spans: span starts not sorted at index $chk")
      chk += 1
    }
    var tokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') tokens += 1; i += 1 }
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
    // cleaned text is never longer than the original
    val out = new Array[Byte](bytes.length)
    var w = 0
    var j = 0
    var maxEnd = -1L
    var tok = 0
    // an explicit first-kept flag, NOT w > 0: a kept EMPTY token (split
    // keeps them) contributes zero bytes but still demands a separator
    // before the next kept token
    var first = true
    while (tok < tokens) {
      while (j < m && packed.getLong(2 * j) <= tok) {
        val e = packed.getLong(2 * j + 1)
        if (e > maxEnd) maxEnd = e
        j += 1
      }
      if (tok > maxEnd) {
        if (!first) { out(w) = ' '; w += 1 }
        first = false
        var p = starts(tok)
        while (p < ends(tok)) { out(w) = bytes(p); w += 1; p += 1 }
      }
      tok += 1
    }
    UTF8String.fromBytes(out, 0, w)
  }

  def excise_spans(text: Column, packedSpans: Column): Column =
    ColumnBridge.column(ExciseSpans(
      ColumnBridge.expression(text), ColumnBridge.expression(packedSpans)))
}
