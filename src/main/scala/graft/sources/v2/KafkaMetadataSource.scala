package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSourceV2 `kafka-metadata` batch source (SURVEY §4.2 candidate #1):
  * `spark.read.format("kafka-metadata").option("dir", ...).load()` surfaces
  * the partition-watermark snapshot as a first-class table.
  *
  * Planning mirrors a production AdminClient collector: the DRIVER holds
  * only the topic LIST (WatermarkFetcher.listTopics — a cheap metadata
  * RPC) and plans one input partition per topic; row data is fetched by
  * EXECUTORS inside PartitionReader (WatermarkFetcher.fetch — the
  * get_watermark_offsets loop, kafka_overwatch/kafka_resources/topics.py:134-209).
  * No watermark row ever materializes on the driver.
  *
  * Pushdown: cluster/topic EqualTo and In filters prune input partitions
  * at the source — the reference's declared-but-unused
  * topic_include/exclude regexes (quirk Q7) get their intended effect
  * here, before any row is produced.
  */
class KafkaMetadataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka-metadata"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaMetadataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MetadataTable(properties.get("dir"))
}

object KafkaMetadataSource {
  val Schema: StructType = StructType(Seq(
    StructField("cluster", StringType), StructField("topic", StringType),
    StructField("partition_id", LongType), StructField("low", LongType),
    StructField("high", LongType), StructField("scan_ts", LongType),
    StructField("s", LongType)))
}

case class WmRow(cluster: String, topic: String, partitionId: Long, low: Long,
                 high: Long, scanTs: Long, s: Long)

class MetadataTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"kafka_metadata($dir)"
  override def schema(): StructType = KafkaMetadataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MetadataScanBuilder(new FixtureFetcher(dir))
}

class MetadataScanBuilder(fetcher: WatermarkFetcher)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = KafkaMetadataSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("topic" | "cluster", _) => true
      case In("topic" | "cluster", _) => true
      case _ => false
    }
    pushed = supported
    rest // Spark re-applies the rest post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new MetadataScan(fetcher, pushed, required)
}

class MetadataScan(fetcher: WatermarkFetcher, filters: Array[Filter],
                   required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new MetadataMicroBatchStream(fetcher, this, required)

  private[v2] def topicAllowed(t: String): Boolean = filters.forall {
    case EqualTo("topic", v) => t == v
    case In("topic", vs) => vs.contains(t)
    case _ => true
  }
  /** Cluster values allowed by pushed filters; None = all. Evaluated
    * driver-side into plain data so partitions stay small and
    * serializable. */
  private[v2] def allowedClusters: Option[Set[String]] = {
    val sets = filters.collect {
      case EqualTo("cluster", v) => Set(v.toString)
      case In("cluster", vs) => vs.map(_.toString).toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  /** One partition per allowed topic — built from the topic list alone. */
  override def planInputPartitions(): Array[InputPartition] =
    fetcher.listTopics()
      .filter(topicAllowed)                                 // partition pruning
      .map(t => MetadataInputPartition(fetcher, t, allowedClusters,
        0L, Long.MaxValue): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new MetadataReaderFactory(required.fieldNames)
}

/** A planned unit of work: fetch one topic's rows on the executor,
  * keeping scans in (minS, maxS] and rows of the allowed clusters. */
case class MetadataInputPartition(fetcher: WatermarkFetcher, topic: String,
                                  clusters: Option[Set[String]],
                                  minS: Long, maxS: Long) extends InputPartition

/** Streaming offset = scan ordinal: micro-batch (start, end] delivers the
  * rows of scans start+1..end, the way each poll of a live cluster
  * delivers one new snapshot. latestOffset advances one scan per trigger
  * (a live source would return "now"); the fixture history is finite so
  * the stream drains after NumScans micro-batches. */
case class ScanOffset(s: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s.toString
}

class MetadataMicroBatchStream(fetcher: WatermarkFetcher, scan: MetadataScan,
                               required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private var emitted = 0L

  override def initialOffset(): Offset = ScanOffset(0L)

  /** Admission-controlled latest offset: receives the RESTORED start
    * offset, so a restarted query resumes after the committed scan instead
    * of replaying from a fresh counter (which would regress the offset and
    * re-serve scans as new batches). One scan per trigger, like a poll. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s0 = math.max(start.asInstanceOf[ScanOffset].s, emitted)
    emitted = math.min(s0 + 1, graft.sources.Snapshots.NumScans.toLong)
    ScanOffset(emitted)
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def deserializeOffset(json: String): Offset = ScanOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[ScanOffset].s
    val s1 = end.asInstanceOf[ScanOffset].s
    fetcher.listTopics()
      .filter(scan.topicAllowed)
      .map(t => MetadataInputPartition(fetcher, t, scan.allowedClusters, s0, s1)
        : InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MetadataReaderFactory(required.fieldNames)
}

class MetadataReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[MetadataInputPartition]
    new PartitionReader[InternalRow] {
      // executor-side fetch: rows first materialize here, not at planning
      private lazy val rows: Array[WmRow] = part.fetcher.fetch(part.topic)
        .filter(r => part.clusters.forall(_.contains(r.cluster)) &&
          r.s > part.minS && r.s <= part.maxS)
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val r = rows(i)
        InternalRow.fromSeq(fields.toSeq.map {
          case "cluster" => UTF8String.fromString(r.cluster)
          case "topic" => UTF8String.fromString(r.topic)
          case "partition_id" => r.partitionId
          case "low" => r.low
          case "high" => r.high
          case "scan_ts" => r.scanTs
          case "s" => r.s
        })
      }
      override def close(): Unit = ()
    }
  }
}
