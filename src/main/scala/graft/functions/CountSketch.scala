package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.PolyHash

/** Fixed-memory frequency sketches over the token stream — the two
  * classic structures a 100 TB pipeline uses when exact per-key state
  * no longer fits: a Count-Min sketch (heavy-hitter frequency estimates
  * from Depth x Width = 4096 64-bit counters = 32 KiB of state, Cormode
  * & Muthukrishnan 2005)
  * and a linear-counting distinct sketch (occupancy of a fixed bucket
  * array, Whang et al. 1990).
  *
  * Both are built FROM the exact per-token aggregate here, which is
  * mathematically identical to hashing the raw stream (CMS cells are
  * sums over tokens hashing to the cell; occupancy is a function of the
  * distinct token set) but shuffles each distinct token once instead of
  * every occurrence — on a real cluster the exact aggregate is the
  * expensive path the sketch REPLACES, so the point of these queries is
  * the sketch-vs-exact error report itself: the driver-checkable
  * evidence of how much accuracy 32 KiB of state buys. Hashing is the
  * wrap-free Carter-Wegman family over the 30-bit polyhash shared with
  * MinHash ([[Sketches.UnivA]]) — every bucket id reproduces exactly in
  * the DuckDB oracle from the same constants.
  */
object CountSketch {

  val Depth = 4
  val Width = 1024L
  /** Linear-counter bucket count; occupancy load stays well under the
    * ~0.7 where the estimator degrades (vocab ~ LcBuckets here — the
    * interesting regime for the error report). */
  val LcBuckets = 4096L
  /** Carter-Wegman row used by the linear counter (rows 0..Depth-1
    * belong to the CMS). */
  val LcHashIdx = 4

  /** (a_i * h + b_i) mod p mod buckets — one CMS row hash. h < 2^30 and
    * a_i < 2^31 keep the product below 2^61: wrap-free on any engine. */
  private def bucket(h: Column, i: Int, buckets: Long): Column =
    (lit(Sketches.UnivA(i)) * h + lit(Sketches.UnivB(i))) % lit(Sketches.P31) %
      lit(buckets)

  private def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalytics.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", PolyHash.polyhash(col("token")))

  /** The Depth (row_i, bucket) coordinates of a token hash — the one
    * definition of the sketch geometry, shared by the batch builder,
    * the probe side, and the streaming cells
    * ([[graft.streaming.CmsStream]]). */
  private[graft] def cellStructs(h: Column): Column =
    array((0 until Depth).map(i =>
      struct(lit(i).as("row_i"), bucket(h, i, Width).as("bucket"))): _*)

  private def cellsFrom(counts: DataFrame): DataFrame =
    counts
      .select(explode(cellStructs(col("h"))).as("rb"), col("cnt"))
      .groupBy(col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("cell"))

  /** The materialized sketch: (row_i, bucket) -> cell sums from the
    * exact token aggregate (see the object scaladoc for why that is
    * identical to hashing the raw stream). */
  def cmsCells(docs: DataFrame): DataFrame = cellsFrom(tokenCounts(docs))

  /** Top-k tokens with their exact counts next to the CMS estimate
    * (est = min over rows of the token's cell) and the resulting
    * overestimate. One token shuffle builds both sides; the k-row probe
    * set broadcasts into the <= Depth*Width-cell sketch (both bounded
    * by construction, the IVF-centroid contract). */
  def cmsHeavyHitters(docs: DataFrame, k: Int = 20): DataFrame = {
    val counts = tokenCounts(docs)
    val rows = (0 until Depth).map(i =>
      struct(lit(i).as("row_i"), bucket(col("h"), i, Width).as("bucket")))
    val cells = cellsFrom(counts)
    // global top-k = TakeOrdered (no full sort); re-rank the k survivors
    // with a k-row window for a deterministic output key
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(k)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("token"))).cast("long"))
    val probes = top.select(col("rnk"), col("token"), col("cnt"),
      explode(array(rows: _*)).as("rb"))
      .select(col("rnk"), col("token"), col("cnt"),
        col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
    cells.join(broadcast(probes), Seq("row_i", "bucket"))
      .groupBy(col("rnk"), col("token"), col("cnt"))
      .agg(min(col("cell")).as("est"))
      .select(col("rnk"), col("token"), col("cnt").as("exact_cnt"),
        col("est"), (col("est") - col("cnt")).as("overestimate"))
  }

  /** HyperLogLog precision: p = 9 -> m = 512 registers (~4.6% standard
    * error), the classic Flajolet et al. 2007 estimator. */
  val HllP = 9
  val HllM: Long = 1L << HllP
  /** The rho window is the 51 bits of the 60-bit token hash above the 9
    * bucket bits; rho ranges 1..52 (52 = all-zero window). */
  val HllRhoMax = 52

  /** Per-language HyperLogLog distinct-token estimate next to the exact
    * count — the third member of the fixed-memory family (CMS for
    * frequencies, linear counting for occupancy-regime distincts, HLL
    * for unbounded-cardinality distincts: 512 6-bit registers cover any
    * cardinality the 60-bit hash can express, where the linear counter
    * saturates past its bucket count).
    *
    * Register build: bucket = h mod m (low 9 bits), rho = leading-zero
    * count of the remaining 51-bit window + 1 — computed on BOTH
    * engines as 52 - length(bin(w)) (bin() renders minimal binary, so
    * its length is floor(log2 w) + 1 exactly; w = 0 -> 52). The
    * harmonic mean stays on an integer grid: sum over registers of
    * 2^(52 - M[b]) as exact BIGINT (absent registers contribute 2^52),
    * one trailing IEEE division — bit-identical on any partitioning and
    * in the oracle, the IVF-mean trick applied to HLL.
    *
    * raw_est is the uncorrected estimator alpha_m * m^2 / sum(2^-M);
    * the small-range linear-counting correction needs ln() (libm — not
    * oracle-safe), so the report emits the pieces (zero_registers, the
    * exact count, rel_err) and leaves the correction to the caller.
    *
    * Shape at 100 TB: one hash aggregation to (lang, bucket) registers
    * — at most m rows per language — then a per-language rollup; the
    * exact count lives in the same exploded scan. The sketch side never
    * holds more than m * languages rows. */
  def hllDistinct(docs: DataFrame): DataFrame = {
    val toks = hllTokenUpdates(docs)
    val regs = toks.groupBy(col("lang"), col("bucket"))
      .agg(max(col("rho")).as("m"))
    val exact = toks.groupBy(col("lang"))
      .agg(countDistinct(col("token")).as("distinct_exact"))
    hllEstimate(regs).join(exact, "lang")
      .select(col("lang"), col("distinct_exact"), col("occupied"),
        col("zero_registers"), col("raw_est"))
      .withColumn("rel_err",
        (col("raw_est") - col("distinct_exact").cast("double"))
          / col("distinct_exact").cast("double"))
  }

  /** Per-token (lang, token, bucket, rho) register updates — the one
    * definition of the HLL geometry, shared by the batch builder and
    * the streaming registers ([[graft.streaming.HllStream]]). */
  private[graft] def hllTokenUpdates(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        explode(TextAnalytics.tokens(col("text"))).as("token"))
      .withColumn("h", Sketches.tokenHash(col("token")))
      .withColumn("bucket", col("h") % lit(HllM))
      .withColumn("w", expr(s"h div $HllM"))
      .withColumn("rho",
        when(col("w") === lit(0L), lit(HllRhoMax))
          .otherwise(lit(HllRhoMax) - length(bin(col("w")))))

  /** (lang, bucket, m) registers -> per-lang occupancy + raw estimate,
    * the integer-grid harmonic sum (see [[hllDistinct]]'s scaladoc) —
    * bit-identical however the registers were accumulated, which is
    * what lets a streaming register snapshot reuse it verbatim. */
  private[graft] def hllEstimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("lang"))
      .agg(count(lit(1)).as("occupied"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoMax - m)")).as("s_occ"))
      .withColumn("zero_registers", lit(HllM) - col("occupied"))
      .withColumn("s_int",
        col("s_occ") + col("zero_registers") * lit(1L << HllRhoMax))
      .withColumn("raw_est",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0))
          * lit(262144.0) * lit(4503599627370496.0)
          / col("s_int").cast("double"))
      .drop("s_occ", "s_int")

  /** The linear counter's bucket of one token — the one definition of
    * the LC geometry, shared by the batch sketch and the streaming
    * occupancy ([[graft.streaming.LcStream]]). */
  private[graft] def lcBucket(token: Column): Column =
    bucket(PolyHash.polyhash(token), LcHashIdx, LcBuckets)

  /** Per-language exact distinct-token count next to the linear
    * counter's occupied-bucket count — both order-free distinct
    * aggregates in ONE pass. load_factor = occupied / buckets is an
    * exact IEEE division (power-of-two denominator). */
  def distinctSketch(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        explode(TextAnalytics.tokens(col("text"))).as("token"))
      .withColumn("bucket", lcBucket(col("token")))
      .groupBy(col("lang"))
      .agg(countDistinct(col("token")).as("distinct_exact"),
        countDistinct(col("bucket")).as("occupied"))
      .withColumn("load_factor", col("occupied").cast("double") / lit(LcBuckets.toDouble))
}
