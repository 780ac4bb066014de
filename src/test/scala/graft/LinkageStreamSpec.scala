package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.LinkageStream

/** Streaming linkage == batch linkage against the same static index,
  * including multiplicity, across arbitrary micro-batch splits. */
class LinkageStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference = spark.read
    .parquet(s"${TestSpark.Sf0001}/customer.parquet")

  test("streamed ed<=1 matches == batch join vs the same index") {
    implicit val sq = spark.sqlContext
    val index = LinkageStream.variantIndex(reference, "c_custkey", "c_name")
    // probes: near-misses of real names (one digit off), one exact-width
    // mistype, one clean miss, one digit-less name (no variants)
    val probes = Seq(
      (900001L, "Customer#000000013"), // in-registry id -> ed-0 vs itself? no: ids differ, name equal -> dist 0 row? lev=0 <= 1, counts
      (900002L, "Customer#000000913"), // one substitution away from 000000013? depends; still a probe
      (900003L, "Customer#100000013"), // leading digit change
      (900004L, "Customer#0000000131"), // one insertion (10 digits)
      (900005L, "NoDigitsHere"))
      .toDF("id", "name")
    val batch = LinkageStream.matches(probes, index).collect()
      .map(_.toString).sorted.toSeq

    val input = MemoryStream[(Long, String)]
    val q = LinkageStream.matches(input.toDF().toDF("id", "name"), index)
      .writeStream.format("memory").queryName("linkage_stream")
      .outputMode("append").start()
    try {
      val rows = probes.as[(Long, String)].collect().toSeq
      val (b1, b2) = rows.splitAt(2)
      Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("linkage_stream").collect()
        .map(_.toString).sorted.toSeq
      assert(streamed == batch)
      assert(batch.nonEmpty)
      // the exact-name probe matched its registry twin at distance 0
      val hit = spark.table("linkage_stream")
        .filter($"id" === 900001L && $"dist" === 0L).count()
      assert(hit >= 1L)
    } finally q.stop()
  }
}
