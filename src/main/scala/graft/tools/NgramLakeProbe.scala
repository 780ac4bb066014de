package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics
import graft.operators.IncrementalDedup

/** Measurement probe for the ngram lake's BUCKETED layout (r13 verdict
  * item 2): builds the corpus ngram index from a corpus dir, persists
  * it both ways — plain parquet dir and `ngh`-bucketed table — and
  * times the cross-crawl excision probe (`indexedRunFrame` → noop
  * sink) against each, cold per run. Prints one comparison line per
  * pass; the LADDER_NOTES entry records the numbers. Usage:
  *   SPARK_GRAFT_SF_DIR=<corpus dir> runMain graft.tools.NgramLakeProbe [passes]
  */
object NgramLakeProbe {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-ngram-probe-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val split = IncrementalDedup.splitAt(docs)
    val corpus = docs.filter(col("doc_id") <= split)
    val crawl = docs.filter(col("doc_id") > split)

    val dir = java.nio.file.Files.createTempDirectory("graft-ngram-probe")
      .toString
    val tbl = "graft_ngram_probe_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val t0 = System.nanoTime()
    IncrementalDedup.ngramIndex(corpus).write.parquet(s"$dir/ngrams")
    val tPlain = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    IncrementalDedup.writeNgramBucketed(
      spark.read.parquet(s"$dir/ngrams"), tbl, buckets = 32)
    val tBucket = (System.nanoTime() - t1) / 1e9
    println(f"[ngramlake] index build: plain dir $tPlain%.1fs, " +
      f"bucketed rewrite from dir $tBucket%.1fs")

    def time(idx: => DataFrame): Double = {
      val t = System.nanoTime()
      TextAnalytics.indexedRunFrame(crawl, idx)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    for (p <- 1 to passes) {
      val plain = time(spark.read.parquet(s"$dir/ngrams"))
      val bucketed = time(spark.table(tbl))
      println(f"[ngramlake] pass $p: probe plain $plain%.2fs, " +
        f"bucketed $bucketed%.2fs (${plain / bucketed}%.2fx)")
    }
    spark.sql(s"DROP TABLE $tbl")
    spark.stop()
  }
}
