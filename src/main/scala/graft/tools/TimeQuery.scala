package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries (noop sink, two passes — the
  * second isolates the steady-state cost from scan/cache warmup).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.TimeQuery name...
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_ANN_SAMPLE_MOD").foreach(m =>
      spark.conf.set(graft.functions.AtScale.AnnSampleModKey, m))
    sys.env.get("SPARK_GRAFT_LSH_BITS").foreach(m =>
      spark.conf.set(graft.functions.AtScale.LshBitsKey, m))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    args.foreach { n =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $n cold=${times.head}%.2fs warm=${times.last}%.2fs")
    }
    spark.stop()
  }
}
