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
    // SPARK_GRAFT_SIMHASH_MIN applies the length-routing token floor
    // up front, so every probe stage below measures the ROUTED corpus —
    // the threshold-selection experiment for Sketches.SimHashMinTokens
    val minTok = sys.env.getOrElse("SPARK_GRAFT_SIMHASH_MIN", "0").toInt
    val allDocs = spark.read.parquet(s"$dir/documents.parquet")
    val docs =
      if (minTok > 0)
        allDocs.filter(length(col("text"))
          - length(translate(col("text"), " ", "")) + 1 >= minTok)
      else allDocs
    println(s"[probe] minTokens=$minTok docs_routed_in=${docs.count()}" +
      s" of ${allDocs.count()}")

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
      val out = Sketches.simHashPairs(docs, maxHamming = 4).localCheckpoint()
      val cross = out.filter(
        expr("doc_a div 100000000 <> doc_b div 100000000")).count()
      println(s"[probe] survivors=${out.count()} cross_replica=$cross")
    }
    timed("raw join matches (no filters)") {
      val n = Sketches.simHashBandMatches(
        Sketches.simHashes(docs), maxHamming = 4).count()
      println(s"[probe] matched_rows=$n")
    }
    // SPARK_GRAFT_SIMHASH_HOT=1: attribute the matched mass — per-bucket
    // occupancy n contributes C(n,2) candidate rows, so the top buckets
    // + the token-count profile of their members names the corner
    if (sys.env.get("SPARK_GRAFT_SIMHASH_HOT").contains("1")) {
      val bands = Sketches.simHashBands(Sketches.simHashes(docs), 4)
        .persist()
      val tc = allDocs.select(col("doc_id"), (length(col("text"))
        - length(translate(col("text"), " ", "")) + 1).as("tc"))
      val occ = bands.groupBy(col("band"), col("band_key"), col("sub_key"))
        .agg(count(lit(1)).as("n")).persist()
      val mass = occ.agg(sum(col("n") * (col("n") - 1) / 2)).first().get(0)
      println(s"[probe] bucket_pair_mass=$mass")
      val top = occ.orderBy(desc("n")).limit(12).collect()
      top.foreach { r =>
        val (b, bk, sk, n) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
        val prof = bands.filter(col("band") === b && col("band_key") === bk &&
            col("sub_key") === sk)
          .join(tc, "doc_id")
          .agg(min(col("tc")), expr("percentile(tc, 0.5)"), max(col("tc")),
            countDistinct(expr("doc_id div 100000000")))
          .first()
        println(s"[probe] hot bucket band=$b key=$bk sub=$sk n=$n " +
          s"tc_min=${prof.get(0)} tc_med=${prof.get(1)} tc_max=${prof.get(2)} " +
          s"replicas=${prof.get(3)}")
      }
      // mass by token-count class of BOTH endpoints: per bucket count
      // members per class, pair mass within/cross class
      val classed = bands.join(tc, "doc_id")
        .withColumn("cls", when(col("tc") < 16, "short")
          .when(col("tc") < 32, "mid").otherwise("long"))
      val byCls = classed.groupBy(col("band"), col("band_key"), col("sub_key"),
          col("cls")).agg(count(lit(1)).as("n"))
      val pivot = byCls.groupBy(col("band"), col("band_key"), col("sub_key"))
        .pivot("cls", Seq("short", "mid", "long")).sum("n").na.fill(0L)
      val m = pivot.agg(
        sum(col("short") * (col("short") - 1) / 2).as("ss"),
        sum(col("mid") * (col("mid") - 1) / 2).as("mm"),
        sum(col("long") * (col("long") - 1) / 2).as("ll"),
        sum(col("short") * col("mid")).as("sm"),
        sum(col("short") * col("long")).as("sl"),
        sum(col("mid") * col("long")).as("ml")).first()
      println(s"[probe] mass short-short=${m.get(0)} mid-mid=${m.get(1)} " +
        s"long-long=${m.get(2)} short-mid=${m.get(3)} short-long=${m.get(4)} " +
        s"mid-long=${m.get(5)}")
      occ.unpersist(); bands.unpersist()
    }
    println(Sketches.simHashPairs(docs, maxHamming = 4)
      .queryExecution.executedPlan.toString.take(4000))
    cached.unpersist()
    spark.stop()
  }
}
