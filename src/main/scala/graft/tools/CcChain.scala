package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r14): dedupClusters round-count on a synthetic path graph
  * (worst-case diameter), to verify the pointer-jump compression is
  * actually compressing. Usage: runMain graft.tools.CcChain [n]
  */
object CcChain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // path 1-2, 2-3, ..., (n-1)-n
    val pairs = spark.range(1, n).select(col("id").as("doc_a"),
      (col("id") + 1).as("doc_b"))
    val t0 = System.nanoTime()
    val labels = graft.functions.Dedup.dedupClusters(pairs, maxIter = 20)
    val bad = labels.filter(col("cluster_id") =!= 1).count()
    println(f"[ccchain] n=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs " +
      s"wrong_labels=$bad")
    spark.stop()
  }
}
