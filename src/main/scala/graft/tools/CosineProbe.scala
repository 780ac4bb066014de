package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** r8 verdict item 6: q_cosine_neardups is the heaviest non-recall
  * query at the x128 rung (~13 s isolated) — attribute its candidate
  * mass the way SimhashProbe attributed the simhash blowup, so "heavy"
  * is either adjudicated content-genuine or traced to a hash-structure
  * defect worth fixing.
  *
  * What it measures on the scoredBucketPairs LSH self-join:
  *  - emitted candidate-pair mass (exact, computed from per-bucket
  *    populations under the anchor cap: an anchor at rank r in a bucket
  *    of n pairs with the n - r rows above it -> sum a*n - a(a+1)/2,
  *    a = min(n, anchors)) — the join's matched-row stream;
  *  - top bucket occupancy per (table, key) — a content-independent
  *    hot bucket (the simhash failure mode) shows up as one key holding
  *    a corpus-scale population;
  *  - REPLICA attribution on BenchAtScale corpora (vec_id div 1e8 is
  *    the replica): the scaled fixture decorrelates replicas by
  *    dimension permutation, so content-genuine candidates should be
  *    overwhelmingly within-replica — a large cross-replica fraction
  *    would mean the hyperplane keys collide structurally, not by
  *    content;
  *  - the deduped candidate count and the thresholded (>= 0.4)
  *    survivor count — output mass vs candidate mass.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf_xK runMain graft.tools.CosineProbe [bits]
  */
object CosineProbe {
  def main(args: Array[String]): Unit = {
    val bits = args.headOption.map(_.toInt)
      .getOrElse(Similarity.BitsPerTable)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVecs = emb.count()
    val anchors = Similarity.BucketAnchors

    val pops = Similarity.bucketed(emb, 64, bits)
      .groupBy(col("table"), col("key")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // a*(a+1) is even so the halving is exact; `div` keeps it integral
    // (long `/` is double division in Spark SQL)
    val emitted = pops.select(
      sum(least(col("n"), lit(anchors.toLong)) * col("n")
        - expr(s"least(n, $anchors) * (least(n, $anchors) + 1) div 2"))
        .as("pairs"))
      .first().getLong(0)
    val top = pops.orderBy(col("n").desc).limit(8).collect()
      .map(r => s"t${r.getInt(0)}/k${r.getLong(1)}:n=${r.getLong(2)}")
      .mkString(" ")
    val stats = pops.agg(max(col("n")).as("mx"),
      avg(col("n")).as("mean"), count(lit(1)).as("buckets")).first()

    val cands = Similarity.scoredBucketPairs(emb, bitsPerTable = bits).localCheckpoint()
    val nCands = cands.count()
    val survivors = cands.filter(col("score") >= 0.4).count()
    // replica attribution (BenchAtScale id stride = 1e8; plain fixtures
    // land everything in replica 0 and cross = 0 trivially)
    val cross = cands.filter(
      expr("vec_a div 100000000 != vec_b div 100000000")).count()

    println(s"[cosprobe] bits=$bits dir=$dir vecs=$nVecs buckets=${stats.getLong(2)} " +
      f"meanPop=${stats.getDouble(1)}%.1f maxPop=${stats.getLong(0)}")
    println(s"[cosprobe] topBuckets: $top")
    println(s"[cosprobe] emittedPairs=$emitted dedupedCands=$nCands " +
      s"survivors(>=0.4)=$survivors crossReplicaCands=$cross " +
      f"candsPerVec=${nCands.toDouble / nVecs}%.2f")
    spark.stop()
  }
}
