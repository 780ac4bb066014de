package graft.tools

import org.apache.spark.sql.SparkSession

object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def t(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[pqprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    var cb: Seq[(Int, Array[Double])] = null
    t("trainCodebook") { cb = graft.functions.Pq.trainCodebook(emb) }
    t("encode count")(println("codes=" + graft.functions.Pq.encode(emb, cb).count()))
    t("encode count 2")(graft.functions.Pq.encode(emb, cb).count())
    t("knnPqWith")(graft.functions.Pq.knnPqWith(emb, cb)
      .write.format("noop").mode("overwrite").save())
    t("knnPqWith 2")(graft.functions.Pq.knnPqWith(emb, cb)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
