package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: true ed<=1 pair count of a corpus (the editdist output
  * mass — what the runtime should track on dense-key fixtures). */
object EdCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val cust = spark.read.parquet(s"$dir/customer.parquet")
      val n = graft.operators.Linkage
        .editDistancePairs(cust, "c_custkey", "c_name", "c_nationkey")
        .count()
      println(s"[edcount] $dir pairs=$n")
    }
    spark.stop()
  }
}
