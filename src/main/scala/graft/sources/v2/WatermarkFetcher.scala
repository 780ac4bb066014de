package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.MessageType
import scala.collection.mutable

import graft.sources.Snapshots

/** The collector seam of the kafka-metadata source.
  *
  * The DRIVER calls only `listTopics()` (the cheap metadata RPC of a live
  * AdminClient, kafka_overwatch/kafka_resources/topics.py:134-156); each
  * EXECUTOR calls `fetch(topic)` inside its PartitionReader (the
  * consumer.get_watermark_offsets loop, topics.py:168-209). A live
  * deployment swaps in an AdminClient-backed implementation; nothing else
  * in the source changes.
  */
trait WatermarkFetcher extends Serializable {
  /** Driver-side: the topic list only — no row data. */
  def listTopics(): Seq[String]
  /** Driver-side: the consumer-group name list only. */
  def listGroups(): Seq[String]
  /** Executor-side: all watermark rows of one topic. */
  def fetch(topic: String): Array[WmRow]
  /** Executor-side: all committed-offset rows of one topic
    * (kafka_resources/groups.py:149-170). */
  def fetchGroupOffsets(topic: String): Array[GoRow]
  /** Executor-side: the describe-history of one consumer group
    * (kafka_resources/groups.py:74-108). */
  def fetchGroup(grp: String): Array[GdRow]
}

/** Collector fetch policy — the reference's watermark-fetch retry is
  * 10 tries, 5 s delay, x2 backoff with jitter
  * (kafka_overwatch/kafka_resources/topics.py:168 retry decorator;
  * topics.py:95-131 re-queues failed batches, groups.py:23-52 recurses
  * on the failed remainder). Attempts include the first try; tests
  * inject a small baseMs and a recording sleeper. */
case class FetchPolicy(attempts: Int = 10, baseMs: Long = 5000L,
                       requestTimeoutMs: Long = 60000L) {
  /** The reference floors the admin RPC timeout at 60 s regardless of
    * config (kafka_overwatch/kafka_resources/__init__.py:37-44); a live
    * AdminClient fetcher reads this, the fixture one has no RPCs. */
  def effectiveTimeoutMs: Long = math.max(requestTimeoutMs, 60000L)
}

/** Decorator adding the retry policy to ANY WatermarkFetcher — the
  * fixture one here, an AdminClient-backed one in a live deployment.
  * Runs wherever the wrapped call runs: listTopics/listGroups retry on
  * the driver at planning, fetch* retries inside the executor's
  * PartitionReader — so one flaky broker RPC fails a single input
  * partition's attempt, not the whole scan. Backoff schedule is
  * graft.report.RemotePut.backoffMs (exponential + deterministic
  * jitter); `sleeper` is injectable so tests assert the schedule. */
class RetryingFetcher(inner: WatermarkFetcher, policy: FetchPolicy,
                      sleeper: Long => Unit = Thread.sleep(_))
    extends WatermarkFetcher {
  private def withRetry[T](body: => T): T =
    graft.report.RemotePut.retrying(policy.attempts, policy.baseMs, sleeper)(() => body)
  override def listTopics(): Seq[String] = withRetry(inner.listTopics())
  override def listGroups(): Seq[String] = withRetry(inner.listGroups())
  override def fetch(topic: String): Array[WmRow] = withRetry(inner.fetch(topic))
  override def fetchGroupOffsets(topic: String): Array[GoRow] =
    withRetry(inner.fetchGroupOffsets(topic))
  override def fetchGroup(grp: String): Array[GdRow] = withRetry(inner.fetchGroup(grp))
}

/** Deterministic fixture implementation: derives the same rows as
  * Snapshots.watermarks, but WITHOUT a SparkSession — events.parquet is
  * read through parquet-hadoop directly, so `fetch` genuinely runs on
  * executors (each executor JVM derives the per-topic map once from
  * shared storage and serves every fetch from that cache).
  */
class FixtureFetcher(dir: String) extends WatermarkFetcher {
  override def listTopics(): Seq[String] =
    (FixtureFetcher.distinctTopics(dir) ++ Snapshots.InjectedTopics).distinct.sorted

  override def listGroups(): Seq[String] =
    Snapshots.GroupDimRows.map(_._1).distinct.sorted

  override def fetch(topic: String): Array[WmRow] =
    FixtureFetcher.rowsByTopic(dir).getOrElse(topic, Array.empty)

  /** Mirror of Snapshots.groupOffsetsUncached, per topic: the derived
    * g_active/g_empty committed offsets ride the topic's own watermark
    * rows; injected-offset rows attach to their injected topics. */
  override def fetchGroupOffsets(topic: String): Array[GoRow] = {
    val derived =
      if (Snapshots.InjectedTopics.contains(topic)) Array.empty[GoRow]
      else fetch(topic).flatMap { w =>
        Seq(
          GoRow(w.cluster, "g_active", w.topic, w.partitionId,
            w.high * 3 / 4, w.scanTs, w.s),
          GoRow(w.cluster, "g_empty", w.topic, w.partitionId,
            w.high / 2, w.scanTs, w.s))
      }
    val injected = Snapshots.InjectedGroupOffsetRows
      .filter(_._2 == topic)
      .map { case (g, t, p, c, s) =>
        GoRow(Snapshots.clusterOfName(t), g, t, p, c,
          Snapshots.Epoch0 + Snapshots.Step * s, s)
      }
    derived ++ injected
  }

  override def fetchGroup(grp: String): Array[GdRow] =
    Snapshots.Clusters.flatMap(c =>
      Snapshots.GroupDimRows.filter(_._1 == grp).map { case (g, st, m, s) =>
        GdRow(c, g, st, m, Snapshots.Epoch0 + Snapshots.Step * s, s)
      }).toArray
}

object FixtureFetcher {
  private val topicsCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[String]]
  private val rowsCache =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, Array[WmRow]]]

  /** Stream the projected columns of a single parquet file through `f`. */
  private def readParquet(path: String, columns: Seq[String])(
      f: org.apache.parquet.example.data.Group => Unit): Unit = {
    val in = HadoopInputFile.fromPath(new Path(path), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val fileSchema = reader.getFooter.getFileMetaData.getSchema
      val projection = new MessageType("projection",
        columns.map(c => fileSchema.getType(Seq(c): _*)): _*)
      reader.setRequestedSchema(projection)
      val columnIO = new ColumnIOFactory().getColumnIO(projection)
      var pages = reader.readNextRowGroup()
      while (pages != null) {
        val recordReader =
          columnIO.getRecordReader(pages, new GroupRecordConverter(projection))
        var i = 0L
        while (i < pages.getRowCount) { f(recordReader.read()); i += 1 }
        pages = reader.readNextRowGroup()
      }
    } finally reader.close()
  }

  /** Driver-side topic listing: reads ONLY the event_type column. */
  def distinctTopics(dir: String): Seq[String] =
    topicsCache.getOrElseUpdate(dir, {
      val seen = mutable.LinkedHashSet.empty[String]
      readParquet(s"$dir/events.parquet", Seq("event_type")) { g =>
        seen += g.getString("event_type", 0)
      }
      seen.toSeq
    })

  /** Executor-side derivation, once per JVM per dir — the exact arithmetic
    * of Snapshots.watermarksUncached (kept in sync; DataSourceV2Spec
    * asserts row-set equality against the Spark derivation). */
  def rowsByTopic(dir: String): Map[String, Array[WmRow]] =
    rowsCache.getOrElseUpdate(dir, {
      val events = mutable.ArrayBuffer.empty[(Long, String, Long)]
      readParquet(s"$dir/events.parquet", Seq("event_id", "event_type", "user_id")) { g =>
        events += ((g.getLong("event_id", 0), g.getString("event_type", 0),
          g.getLong("user_id", 0)))
      }
      val maxId = events.iterator.map(_._1).max
      val pairs = events.iterator.map(e => (e._2, e._3 % 4)).to(mutable.LinkedHashSet)
      val derived = (1 to Snapshots.NumScans).flatMap { s =>
        val threshold = maxId * s / Snapshots.NumScans
        val counts = mutable.HashMap.empty[(String, Long), Long]
        events.foreach { case (id, t, u) =>
          if (id <= threshold) {
            val k = (t, u % 4)
            counts(k) = counts.getOrElse(k, 0L) + 1L
          }
        }
        pairs.iterator.map { case (t, p) =>
          val high = counts.getOrElse((t, p), 0L)
          WmRow(Snapshots.clusterOfName(t), t, p, high / 8, high,
            Snapshots.Epoch0 + Snapshots.Step * s, s.toLong)
        }
      }
      val injected = Snapshots.InjectedWatermarkRows.map { case (t, p, s, lo, hi) =>
        WmRow(Snapshots.clusterOfName(t), t, p, lo, hi,
          Snapshots.Epoch0 + Snapshots.Step * s, s)
      }
      (derived ++ injected).groupBy(_.topic).map { case (t, rs) => t -> rs.toArray }
    })
}
