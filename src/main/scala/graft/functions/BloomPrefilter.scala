package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Fixed-size Bloom prefilter for semi-join shapes where the "small" side
  * is still proportional to the corpus (so a broadcast hash join of it
  * would die at scale, and a plain shuffle join would shuffle the entire
  * big side).
  *
  * The pattern: aggregate the filter side into ONE serialized Bloom filter
  * of a FIXED number of bits (default 2^23 bits = 1 MiB — a constant
  * independent of corpus size, unlike the exploded key set), ship it to
  * the big side as a literal, and keep only keys the filter might contain.
  * The subsequent exact join removes false positives, so the filter is
  * purely a plan-shape optimization: results are bit-identical for ANY
  * filter contents, and fpp merely degrades (more survivors to shuffle)
  * as the filter side grows past `estimatedItems`.
  *
  * Uses Spark's own runtime-filter machinery (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, both codegen'd) over `xxhash64` of the key —
  * the same insert/probe contract Spark's adaptive runtime filtering uses,
  * driven here explicitly because the filter side is an intermediate
  * (exploded n-grams), not a scanned table AQE could see.
  */
object BloomPrefilter {

  /** 1 MiB of bits: at the 4M-item estimate this gives ~1% fpp; past it
    * the filter saturates gracefully (more shuffle, never wrong rows). */
  val DefaultNumBits: Long = 1L << 23
  val DefaultEstimatedItems: Long = 4L * 1000 * 1000

  /** Build the serialized filter over `keys(keyCol)`. One tree-aggregate
    * job; the result is a `numBits/8`-byte blob collected to the driver
    * (fixed-size, like IVF's k x dim centroid collect). None on empty
    * input.
    *
    * Saturation is OBSERVABLE, not silent (r11 ADVICE): the same
    * aggregate job counts the key cardinality, and a count past
    * `estimatedItems` logs the degradation — correctness is unaffected
    * (the exact join removes false positives), but a saturated filter
    * quietly decays toward pass-through shuffle, and the operator's
    * cost story must say so. */
  def build(keys: DataFrame, keyCol: String,
            estimatedItems: Long = DefaultEstimatedItems,
            numBits: Long = DefaultNumBits): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(keyCol))),
      Literal(estimatedItems), Literal(numBits))
    val row = keys.select(
      ColumnBridge.column(agg.toAggregateExpression()).as("bf"),
      count(lit(1)).as("n")).head()
    val n = row.getAs[Long]("n")
    if (n > estimatedItems)
      System.err.println(s"[bloom_prefilter] $keyCol: $n items exceed the " +
        s"$estimatedItems-item estimate for the $numBits-bit filter — " +
        "fpp degrades toward pass-through (more survivors reach the " +
        "exact join; results unchanged)")
    Option(row.getAs[Array[Byte]]("bf"))
  }

  /** Probe column: true iff the filter might contain `key`. Codegen'd;
    * false positives only. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(filter, BinaryType),
      ColumnBridge.expression(xxhash64(key))))
}
