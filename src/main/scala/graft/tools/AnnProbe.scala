package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.{Pq, Similarity}

/** Decompose q_ann_recall's wall time into its six arms (exact truth +
  * five ANN variants) plus the assembled query, each timed at the noop
  * sink after a warm pass — so the r14 optimization attacks the arm
  * that actually costs, not the one theory points at.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *        sbt "runMain graft.tools.AnnProbe"
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").persist()
    emb.count()
    val cb   = Pq.trainCodebook(emb)
    val sub  = Pq.trainCodebooks(emb)
    val perm = Pq.trainPermutation(emb)
    val opqS = Pq.trainCodebooks(Pq.permute(emb, perm))

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val d = df                             // construction (incl. driver collects)
        val built = System.nanoTime()
        d.queryExecution.executedPlan          // analysis + optimization + physical planning
        val planned = System.nanoTime()
        d.write.format("noop").mode("overwrite").save()
        val done = System.nanoTime()
        ((built - t0) / 1e9, (planned - built) / 1e9, (done - planned) / 1e9)
      }
      val w = ts.drop(1).minBy(t => t._1 + t._2 + t._3)
      println(f"[ann] $name%-12s cold=${ts.head._1 + ts.head._2 + ts.head._3}%.2fs " +
        f"warm: plan=${w._2}%.2fs exec=${w._3}%.2fs")
    }
    time("exact")(Similarity.knnExact(emb))
    time("lsh")(Similarity.knnLsh(emb))
    time("multiprobe")(Similarity.knnLshMultiProbe(emb))
    time("pq")(Pq.knnPqWith(emb, cb))
    time("pqs")(Pq.knnPqSubWith(emb, sub))
    time("opq")(Pq.knnPqSubWith(Pq.permute(emb, perm), opqS))
    time("full")(Similarity.annRecall(emb, cb, sub, opqS, perm))
    spark.stop()
  }
}
