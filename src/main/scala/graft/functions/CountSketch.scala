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

  /** Top-k tokens with their exact counts next to the CMS estimate
    * (est = min over rows of the token's cell) and the resulting
    * overestimate. One token shuffle builds both sides; the k-row probe
    * set broadcasts into the <= Depth*Width-cell sketch (both bounded
    * by construction, the IVF-centroid contract). */
  def cmsHeavyHitters(docs: DataFrame, k: Int = 20): DataFrame = {
    val counts = tokenCounts(docs)
    val rows = (0 until Depth).map(i =>
      struct(lit(i).as("row_i"), bucket(col("h"), i, Width).as("bucket")))
    val cells = counts
      .select(explode(array(rows: _*)).as("rb"), col("cnt"))
      .groupBy(col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("cell"))
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

  /** Per-language exact distinct-token count next to the linear
    * counter's occupied-bucket count — both order-free distinct
    * aggregates in ONE pass. load_factor = occupied / buckets is an
    * exact IEEE division (power-of-two denominator). */
  def distinctSketch(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        explode(TextAnalytics.tokens(col("text"))).as("token"))
      .withColumn("bucket",
        bucket(PolyHash.polyhash(col("token")), LcHashIdx, LcBuckets))
      .groupBy(col("lang"))
      .agg(countDistinct(col("token")).as("distinct_exact"),
        countDistinct(col("bucket")).as("occupied"))
      .withColumn("load_factor", col("occupied").cast("double") / lit(LcBuckets.toDouble))
}
