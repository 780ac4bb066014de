package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose Dedup.dedupClusters cost on the sf0.1 cosine
  * pair set — cold vs warm wall, per-stage timing of the pipeline
  * around it (pair set, clustering, final projection). Drove the r5
  * pointer-jumping decision (9 rounds -> ~4) and the checkpoint-count
  * cuts; kept for the next time a label-propagation second needs an
  * explanation.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()

    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[cc] $name: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pairs = t("scoredBucketPairs+persist") {
      val p = graft.functions.Similarity.scoredBucketPairs(emb)
        .filter(col("score") >= 0.4)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")).persist()
      System.err.println(s"[cc] pairs = ${p.count()}")
      p
    }
    for (pass <- Seq("cold", "warm")) {
      t(s"dedupClusters $pass") {
        graft.functions.Dedup.dedupClusters(pairs)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
