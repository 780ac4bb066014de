package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{DocStream, TransitionStream}

/** Dev probe: sustained micro-batch throughput of the stateful
  * streaming paths (MemoryStream -> noop sink, local[32]) with the
  * final state-row count — the numbers that justify "this ingest edge
  * keeps up" next to the batch bench. Usage:
  *   runMain graft.tools.StreamBench [batches] [batchSize]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(20)
    val batchSize = args.lift(1).map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sq = spark.sqlContext
    import spark.implicits._

    // --- TransitionStream: user-keyed LastSeen state, 100k-user
    // population. Each batch SPANS 60 s of event time (not one instant),
    // and ttl=30 s is UNDER that span: a user touched in the first half
    // of batch b's span times out during batch b+1 (where it has no
    // data — timeouts only fire for data-less keys), then re-enters at
    // its next touch. The reported state-row plateau therefore sits
    // BELOW the 100k population, which is the live-eviction evidence
    // the earlier same-instant timestamps (max span 200 s vs ttl
    // 3600 s) never actually exercised.
    locally {
      val input = MemoryStream[TransitionStream.Ev]
      val q = TransitionStream.transitions(input.toDS(), ttlSeconds = 30L,
          watermarkDelay = "0 seconds")
        .writeStream.format("noop").outputMode("append").start()
      try {
        val types = Array("click", "view", "purchase", "signup", "refund")
        var eid = 0L
        val t0 = System.nanoTime()
        for (b <- 0 until batches) {
          val rows = (0 until batchSize).map { i =>
            val uid = (b * batchSize + i) % 100000L
            eid += 1
            TransitionStream.Ev(uid, b * 60L + i.toLong * 60L / batchSize, eid,
              types(i % types.length))
          }
          input.addData(rows)
          q.processAllAvailable()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val n = batches.toLong * batchSize
        val state = Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
        println(f"[streambench] transitions: $n events in $sec%.1fs = " +
          f"${n / sec}%.0f ev/s, state rows $state")
      } finally q.stop()
    }

    // --- DocStream curate: content-hash dedup state + quality scoring
    locally {
      val input = MemoryStream[DocStream.DocIngest]
      // dedup-hash TTL 300 s against a 60 s/batch event-time span: docs
      // older than 5 batches evict, so state is the TTL window, not the
      // full history
      val q = DocStream.curate(input.toDS(), minQuality = 0.2,
          watermarkDelay = "0 seconds", ttlSeconds = 300L)
        .writeStream.format("noop").outputMode("append").start()
      try {
        val docBatch = batchSize / 5
        var id = 0L
        val t0 = System.nanoTime()
        for (b <- 0 until batches) {
          val rows = (0 until docBatch).map { i =>
            id += 1
            DocStream.DocIngest(id,
              s"batch $b doc $i the quick brown fox jumps over a lazy dog " +
                s"while unique token ${id % 9973} keeps hashes distinct",
              "en", "web",
              new Timestamp((b * 60L + i.toLong * 60L / docBatch) * 1000L))
          }
          input.addData(rows)
          q.processAllAvailable()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val n = batches.toLong * docBatch
        val state = Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
        println(f"[streambench] curate: $n docs in $sec%.1fs = " +
          f"${n / sec}%.0f docs/s, state rows $state")
      } finally q.stop()
    }
    spark.stop()
  }
}
