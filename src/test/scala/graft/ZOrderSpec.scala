package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.ZOrderLayout

/** Correctness of the Morton interleave against a bit-by-bit reference,
  * and the layout claim itself: files written z-ordered have per-file
  * bounding boxes (the min/max statistics scans prune on) much tighter
  * in BOTH dimensions than a 1-D-sorted layout of the same data. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def orders =
    spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")

  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave31 matches the bit-by-bit reference") {
    val vals = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L), (9131L, 1499L),
      (150000L, 70000L), (2147483647L, 2147483647L)) // > 16-bit domains
    val got = vals.toDF("a", "b")
      .select(ZOrderLayout.interleave31($"a", $"b").as("z"))
      .as[Long].collect()
    assert(got.toSeq === vals.map { case (a, b) => mortonRef(a, b) })
  }

  test("z-ordered files have far tighter bounding boxes than a 1-D sort") {
    val d = orders.select(
      expr("datediff(o_orderdate, DATE '1970-01-01')").cast("long").as("day"),
      $"o_custkey", $"o_orderkey")

    def totalBoxArea(dir: String): Long =
      spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy($"f")
        .agg(((max($"day") - min($"day") + 1L) *
          (max($"o_custkey") - min($"o_custkey") + 1L)).as("area"))
        .agg(sum($"area")).as[Long].head()

    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val naiveDir = java.nio.file.Files.createTempDirectory("naive").toString
    ZOrderLayout.writeZOrdered(d, "day", "o_custkey", zDir, files = 8)
    // the 1-D baseline: clustered by order key (the natural ingest order)
    d.repartitionByRange(8, $"o_orderkey").sortWithinPartitions($"o_orderkey")
      .write.mode("overwrite").parquet(naiveDir)

    val zArea = totalBoxArea(zDir)
    val naiveArea = totalBoxArea(naiveDir)
    // every naive file spans ~the full (day x cust) space; z-ordered files
    // cover disjoint z-ranges, so their summed boxes are a fraction of it
    assert(zArea * 2 < naiveArea,
      s"z-order box area $zArea not smaller than naive $naiveArea")
    // row content is identical — only the layout changed
    assert(spark.read.parquet(zDir).count() === d.count())
    assert(spark.read.parquet(zDir).except(d).isEmpty)
  }
}
