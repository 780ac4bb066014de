package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r15, verdict item 7): execute a query and print the FINAL
  * adaptive plan, so runtime exchange/stage REUSE — invisible in the
  * pre-execution explain — can be checked. Target: bigramRarity's cbg
  * aggregate, whose four consumers (cctx, cug, tot margins and the
  * scored join) rely on AQE stage reuse instead of an explicit
  * checkpoint. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ReuseProbe <query>..."
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // execute THIS QueryExecution (a .write would spawn its own), so
      // the AdaptiveSparkPlan below prints isFinalPlan=true with the
      // runtime stage-reuse nodes visible
      df.queryExecution.toRdd.foreach(_ => ())
      val plan = df.queryExecution.executedPlan.toString
      val reused = "ReusedExchange|ReusedQueryStage|ReusedSubquery".r
        .findAllIn(plan).size
      val exchanges = "Exchange".r.findAllIn(plan).size
      println(s"\n================ $n (final plan) ================")
      println(s"[reuse] $n: reused_nodes=$reused exchange_lines=$exchanges")
      println(plan)
    }
    spark.stop()
  }
}
