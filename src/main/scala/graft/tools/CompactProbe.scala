package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.IncrementalDedup

/** Dev tool: measure what [[IncrementalDedup.compactIndex]] buys at a
  * scale rung (the r6 verdict item 5 probe-cost measurement). Builds
  * the corpus index for the first 80% of ids, ingests the rest as N
  * sequential crawl batches (each append leaves one small parquet file
  * per table — the daily-cadence fragmentation compaction exists to
  * fold), then times the admissions probe path against the SAME index
  * content in three physical states: fragmented, compacted, and
  * compacted+ranked. */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf_x64")
    val batches = sys.env.getOrElse("SPARK_GRAFT_COMPACT_BATCHES", "16").toInt
    val work = java.nio.file.Files.createTempDirectory("graft-compact-probe")
      .toFile.getAbsolutePath
    val (exDir, bdDir, sgDir) = (s"$work/exact", s"$work/bands", s"$work/sigs")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val split = IncrementalDedup.splitAt(docs)
    val corpus = docs.filter(col("doc_id") <= split)
    val crawl = docs.filter(col("doc_id") > split)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[compact] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def files(d: String): Int =
      new java.io.File(d).listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

    timed("corpus index build+write") {
      val sigs = IncrementalDedup.sigIndex(corpus)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      IncrementalDedup.exactIndex(corpus).write.parquet(exDir)
      IncrementalDedup.bandRows(sigs).write.parquet(bdDir)
      sigs.write.parquet(sgDir)
      sigs.unpersist()
    }
    // sequential daily crawls: equal id slices of the last 20%
    val step = (maxId - split) / batches + 1
    timed(s"$batches ingestBatch appends") {
      (0 until batches).foreach { b =>
        val lo = split + b * step
        val hi = math.min(split + (b + 1) * step, maxId)
        IncrementalDedup.ingestBatch(
          crawl.filter(col("doc_id") > lo && col("doc_id") <= hi),
          exDir, bdDir, sgDir)
      }
    }
    println(s"[compact] fragmented files: exact=${files(exDir)} " +
      s"bands=${files(bdDir)} sigs=${files(sgDir)}")
    // the re-probed window: the final crawl slice (content already in
    // the index — verdict values don't matter, the probe PLAN does)
    val probe = crawl.filter(col("doc_id") > split + (batches - 1) * step)
    def admit(): Unit =
      IncrementalDedup.admissions(probe, spark.read.parquet(exDir),
          spark.read.parquet(bdDir), spark.read.parquet(sgDir))
        .write.format("noop").mode("overwrite").save()
    (1 to 2).foreach(i => timed(s"admissions fragmented pass$i")(admit()))
    timed("compactIndex(ranked=false)") {
      IncrementalDedup.compactIndex(spark, exDir, bdDir, sgDir)
    }
    println(s"[compact] compacted files: exact=${files(exDir)} " +
      s"bands=${files(bdDir)} sigs=${files(sgDir)}")
    (1 to 2).foreach(i => timed(s"admissions compacted pass$i")(admit()))
    timed("compactIndex(ranked=true)") {
      IncrementalDedup.compactIndex(spark, exDir, bdDir, sgDir, ranked = true)
    }
    (1 to 2).foreach(i => timed(s"admissions ranked pass$i")(admit()))
    spark.stop()
  }
}
