package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale proof for the non-equi join shapes: grow the events table
  * K-fold (user-offset replicas — per-replica join structure identical,
  * no cross-replica matches) and record that the as-of join and the
  * anomaly window scale ~linearly. As-of output rows are exactly K x
  * the base (replicas never cross); anomaly ROWS stay constant by
  * construction (replicas share the minute grid, so per-minute totals
  * scale by K and the z-scores keep the same shape) while its input
  * scales K x. Pass a repeated first k (e.g. "1,1,4,16") — the first
  * iteration absorbs JVM/scan warmup.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.JoinScaleProof"
  */
object JoinScaleProof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.operators.Relational.eventsWithEpoch(spark, sfDir)

    println(f"${"k"}%3s ${"events"}%9s ${"asof_rows"}%10s ${"asof_s"}%7s " +
      f"${"anom_rows"}%10s ${"anom_s"}%7s")
    args.headOption.getOrElse("1,1,4,16").split(",").map(_.trim.toInt).foreach { k =>
      val corpus = ScaleProof.scaledEvents(ev, k).localCheckpoint()
      val t0 = System.nanoTime()
      val asofRows = graft.operators.Relational.purchaseClickAsof(corpus).count()
      val t1 = System.nanoTime()
      val anomRows = graft.operators.Relational.eventAnomalies(corpus).count()
      val t2 = System.nanoTime()
      println(f"$k%3d ${corpus.count()}%9d $asofRows%10d ${(t1 - t0) / 1e9}%7.2f " +
        f"$anomRows%10d ${(t2 - t1) / 1e9}%7.2f")
    }
    spark.stop()
  }
}
