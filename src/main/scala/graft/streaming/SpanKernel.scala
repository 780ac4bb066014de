package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.expressions.ExciseSpans

/** The row-local mirror of the batch islands→pack→excise chain, shared
  * by the streaming apply-half collapses ([[StripStream]],
  * [[ExciseStream]]): sorted n-gram hit positions → maximal consecutive
  * runs → inclusive token spans [p0, pLast + n - 1] → the shared
  * [[ExciseSpans]] kernel, with kept_tokens from the same merged
  * running-max coverage fold `TextAnalytics.exciseSpanFrame` runs.
  * One implementation so the two twins cannot drift from each other
  * (or from the batch arithmetic) independently. */
private[streaming] object SpanKernel {

  /** @param sortedPositions sorted 0-based n-gram start positions with a hit
    * @return (cleaned_text, n_tokens, kept_tokens, bytes_removed) */
  def excise(text: String, sortedPositions: Seq[Long],
             n: Int): (String, Long, Long, Long) = {
    // indexed access: callers hand a List whose apply is O(i) — the
    // nested position loops below would make a heavily-duplicated
    // document O(positions^2) in the streaming hot path
    val positions = sortedPositions.toArray
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < positions.length) {
      var j = i
      while (j + 1 < positions.length && positions(j + 1) == positions(j) + 1)
        j += 1
      spans += ((positions(i), positions(j) + n - 1))
      i = j + 1
    }
    val packed = new GenericArrayData(
      spans.toArray.flatMap(t => Array(t._1, t._2)))
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val cleaned = ExciseSpans.excise(bytes, packed).toString
    // token count by space-byte count: ' ' never occurs inside a UTF-8
    // multi-byte sequence, so this equals the split-on-' ' cardinality
    val nTokens = (bytes.count(_ == ' ') + 1).toLong
    // merged coverage fold (spans are disjoint in position space but can
    // overlap in token coverage when the gap is under n)
    var covered = 0L
    var mx = -1L
    for ((s, e) <- spans) {
      covered += math.max(0L, e - math.max(s, mx + 1) + 1)
      mx = math.max(mx, e)
    }
    (cleaned, nTokens, nTokens - covered,
      (bytes.length - cleaned.getBytes(StandardCharsets.UTF_8).length).toLong)
  }
}
