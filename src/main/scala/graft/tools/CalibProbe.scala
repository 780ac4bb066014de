package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Decompose q_minhash_calibration's wall: the hs build (corpus
  * shingle pass), the candidate set, the truth join, and the final
  * bucket aggregate — each to the noop sink after a warm pass, plus
  * executor CPU attribution per piece (task-time delta from the
  * status API). Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.CalibProbe"
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val taskNanos = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          taskNanos.addAndGet(e.taskMetrics.executorRunTime * 1000000L)
    })
    def taskTimeMs: Long = taskNanos.get / 1000000L

    def time(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()   // warm
      val c0 = taskTimeMs
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[calib] $name%-14s warm=$w%.2fs taskTime=${(taskTimeMs - c0) / 1000.0}%.1fs")
    }

    // mirror the query body (SparkEntry q_minhash_calibration)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val hsOld = docs.select(col("doc_id"),
      array_distinct(Dedup.shingleHashes(col("text"))).as("hs"))
    val hsNew = docs.select(col("doc_id"),
      sort_array(array_distinct(Dedup.shingleHashes(col("text")))).as("hs"))
    time("hs_old")(hsOld)
    time("hs_new")(hsNew)
    val full = graft.SparkEntry.queries("q_minhash_calibration")
    time("full_query")(full(spark, dir))
    spark.stop()
  }
}
