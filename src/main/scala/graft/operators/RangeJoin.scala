package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join via fixed-width bucket replication —
  * the second join shape Spark lacks natively (Catalyst plans an
  * inequality join as BroadcastNestedLoop or a cartesian product, both
  * O(|P| * |I|) and both dead at 100 TB).
  *
  * The interval side is replicated once per bucket of width W that the
  * interval [lo, hi] overlaps (ceil(span / W) + 1 copies, a small
  * constant when W is chosen near the typical span); each point maps to
  * exactly ONE bucket (pt div W), so the bucket equi-join meets every
  * qualifying (point, interval) pair exactly once and needs no
  * post-join dedup. The residual predicate lo <= pt <= hi runs inside
  * the joined stage. Cost: one shuffle of |P| + (replication * |I|)
  * rows on the bucket key — an equi-join AQE can size, skew-split, or
  * broadcast like any other.
  *
  * Domain contract: pt/lo/hi are non-negative integers (epoch days or
  * seconds) — `div` truncates toward zero, which equals floor division
  * only for non-negative values.
  */
object RangeJoin {

  /** Inner point-in-interval join. `points` carries column `pt`,
    * `intervals` carries `lo` and `hi` (inclusive bounds); all other
    * columns of both inputs survive. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      bucketWidth: Long): DataFrame = {
    val iv = intervals.withColumn("__b",
      explode(sequence(expr(s"lo div $bucketWidth"), expr(s"hi div $bucketWidth"))))
    val pt = points.withColumn("__b", expr(s"pt div $bucketWidth"))
    pt.join(iv, Seq("__b"))
      .filter(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .drop("__b")
  }
}
