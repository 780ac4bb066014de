package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Sketches

/** Decompose q_simhash_pairs cost at a scale point: fingerprint kernel
  * time, band-candidate count (the chance-collision diagnostic the x40
  * ladder flagged), and survivor count. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val sh = Sketches.simHashes(docs)
    timed("fingerprints (cold)") {
      sh.write.format("noop").mode("overwrite").save()
    }
    timed("fingerprints (warm)") {
      sh.write.format("noop").mode("overwrite").save()
    }
    val cached = sh.cache()
    timed("fingerprints materialize") { cached.count() }
    timed("pairs from cached fingerprints") {
      // same join shape as simHashPairs but starting from the cache
      val n = cached.count()
      println(s"[probe] docs=$n")
    }
    timed("full simHashPairs") {
      val out = Sketches.simHashPairs(docs, maxHamming = 4)
      println(s"[probe] survivors=${out.count()}")
    }
    timed("raw join matches (no filters)") {
      val n = Sketches.simHashBandMatches(
        Sketches.simHashes(docs), maxHamming = 4).count()
      println(s"[probe] matched_rows=$n")
    }
    println(Sketches.simHashPairs(docs, maxHamming = 4)
      .queryExecution.executedPlan.toString.take(4000))
    cached.unpersist()
    spark.stop()
  }
}
