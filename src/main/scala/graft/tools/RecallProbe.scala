package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.{Ivf, Similarity}

/** Measure ANN recall of every index variant against the exact top-k on
  * a scale factor's embeddings table — the quality counterpart of Bench
  * (which measures speed). The NOTES.md ANN table is produced by this.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.RecallProbe"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.knnExact(emb))
    def recall(s: Set[(Long, Long)]): Double =
      exact.count(s.contains).toDouble / exact.size
    println(f"n_vecs=${emb.count()} queries=10 k=10")
    println(f"lsh_single recall=${recall(pairs(Similarity.knnLsh(emb)))}%.3f")
    println(f"lsh_multiprobe recall=${recall(pairs(Similarity.knnLshMultiProbe(emb)))}%.3f")
    println(f"ivf recall=${recall(pairs(Ivf.knnIvf(emb)))}%.3f")
    spark.stop()
  }
}
