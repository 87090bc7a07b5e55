package graft.source

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import TradeLogFormat.BlockMeta

/** DataSource V2 connector for the [[TradeLogFormat]] binary event log —
  * the complete source/sink contract built on the SAME interfaces the
  * Kafka connector implements (the sandbox has no spark-sql-kafka jar and
  * no egress, so this is how the repo exercises those engine paths for
  * real — reference `main.py:77-87`, `main.py:208-217`):
  *
  *   - BATCH_READ: [[TradeLogScanBuilder]] with column pruning
  *     (`SupportsPushDownRequiredColumns` — pruned columns are never
  *     DECODED, not just dropped) and ts-filter pushdown
  *     (`SupportsPushDownFilters` — per-block min/max ts stats skip
  *     whole blocks at plan time; every filter is also handed back to
  *     Spark as residual, the parquet stats-pruning contract, so the
  *     skip is purely an optimization and can never change results).
  *   - MICRO_BATCH_READ: [[TradeLogMicroBatchStream]] — JSON-serialized
  *     block offsets, `SupportsAdmissionControl` rate limiting
  *     (`maxBlocksPerTrigger`, the maxOffsetsPerTrigger idea) and
  *     `SupportsTriggerAvailableNow`, so a finite log replays as a
  *     multi-micro-batch stream with real offset tracking — what
  *     `startingOffsets=earliest` + rate limits do on a broker.
  *   - BATCH_WRITE + TRUNCATE: [[TradeLogWriteBuilder]] — distributed
  *     writers emit uniquely-named files and per-block stats as commit
  *     messages; the driver publishes the manifest atomically on job
  *     commit, so retried/speculative tasks and aborted jobs are
  *     invisible to readers (exactly-once batch write).
  *
  * Registered via META-INF/services as `graft-tradelog`, and usable by
  * class name: `spark.read.format("graft-tradelog").load(dir)`.
  */
final class TradeLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tradelog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TradeLogFormat.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TradeLogTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("graft-tradelog requires a path")))
}

final class TradeLogTable(path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-tradelog `$path`"
  override def schema(): StructType = TradeLogFormat.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TradeLogScanBuilder(path, options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new TradeLogWriteBuilder(path, info)
}

/** Scan builder: collects the pruned schema and the pushable ts bounds.
  * Filter contract — `pushFilters` RETURNS every input filter (all stay
  * residual: Spark re-evaluates them exactly), while `pushedFilters`
  * reports the ts bounds the scan will use for block skipping, which is
  * how they surface in `.explain` (the parquet PushedFilters pattern). */
final class TradeLogScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = TradeLogFormat.schema
  private var accepted: Array[Filter] = Array.empty
  private var tsLo: Long = Long.MinValue
  private var tsHi: Long = Long.MaxValue

  /** V1 filter values for TimestampType arrive as java.sql.Timestamp or
    * java.time.Instant depending on the session's datetime-java8 conf;
    * both convert exactly to epoch micros. */
  private def tsMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(Math.addExact(Math.multiplyExact(t.getTime / 1000L, 1000000L),
        (t.getNanos / 1000).toLong))
    case i: java.time.Instant =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong))
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.flatMap {
      case f @ sources.GreaterThan("ts", v) =>
        tsMicros(v).map { m => tsLo = tsLo.max(m + 1); f }
      case f @ sources.GreaterThanOrEqual("ts", v) =>
        tsMicros(v).map { m => tsLo = tsLo.max(m); f }
      case f @ sources.LessThan("ts", v) =>
        tsMicros(v).map { m => tsHi = tsHi.min(m - 1); f }
      case f @ sources.LessThanOrEqual("ts", v) =>
        tsMicros(v).map { m => tsHi = tsHi.min(m); f }
      case f @ sources.EqualTo("ts", v) =>
        tsMicros(v).map { m => tsLo = tsLo.max(m); tsHi = tsHi.min(m); f }
      case _ => None
    }
    filters // everything stays residual — skipping is advisory-only
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new TradeLogScan(path, required, tsLo, tsHi, options)
}

final class TradeLogScan(path: String, required: StructType,
    tsLo: Long, tsHi: Long, options: CaseInsensitiveStringMap) extends Scan {

  /** Ordinals (into [[TradeLogFormat.schema]]) the reader materializes,
    * in pruned-schema order. */
  private[source] val wanted: Array[Int] =
    required.fieldNames.map(TradeLogFormat.schema.fieldIndex)

  private[source] lazy val allBlocks: Seq[BlockMeta] =
    TradeLogFormat.readManifest(path)

  /** Block-stats skip: keep a block unless its ts span provably misses
    * the pushed conjunction (blocks with no non-null ts always survive —
    * minTs of Long.MinValue encodes "unknown"). */
  private[source] lazy val selectedBlocks: Seq[BlockMeta] =
    allBlocks.filter(b =>
      b.minTsUs == Long.MinValue || (b.minTsUs <= tsHi && b.maxTsUs >= tsLo))

  override def readSchema(): StructType = required
  override def description(): String = {
    val sel = if (tsLo == Long.MinValue && tsHi == Long.MaxValue) "all"
    else s"${selectedBlocks.size}/${allBlocks.size}"
    s"GraftTradeLog path=$path, ReadSchema=${required.simpleString}, " +
      s"PushedTsBounds=[$tsLo,$tsHi], blocks=$sel"
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      // one partition per data file (its surviving blocks read
      // sequentially): parallelism == layout, the file-source shape
      selectedBlocks.groupBy(_.file).toSeq.sortBy(_._1).map {
        case (_, blocks) => TradeLogPartition(path, blocks.sortBy(_.offset))
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new TradeLogReaderFactory(wanted)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TradeLogMicroBatchStream(path, wanted,
      Option(options.get("maxBlocksPerTrigger")).map(_.toInt))
}

/** One read split: a run of blocks within one data file. */
final case class TradeLogPartition(dir: String, blocks: Seq[BlockMeta])
    extends InputPartition

final class TradeLogReaderFactory(wanted: Array[Int])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TradeLogPartition]
    new TradeLogPartitionReader(p.dir, p.blocks, wanted)
  }
}

/** Streams the partition's blocks: seek to each committed offset, read
  * the framed payload, decode only the wanted ordinals. */
final class TradeLogPartitionReader(dir: String, blocks: Seq[BlockMeta],
    wanted: Array[Int]) extends PartitionReader[InternalRow] {
  private val (filesystem, root) = TradeLogFormat.fs(dir)
  private val blockIt = blocks.iterator
  private var rows: Iterator[InternalRow] = Iterator.empty

  private def loadNextBlock(): Boolean = {
    if (!blockIt.hasNext) return false
    val b = blockIt.next()
    val in = filesystem.open(new org.apache.hadoop.fs.Path(root, b.file))
    val payload = new Array[Byte](b.payloadLen)
    try {
      in.seek(b.offset + 8L) // skip the [nRows][payloadLen] frame header
      in.readFully(payload)
    } finally in.close()
    val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    // decodeBlock allocates a fresh values array per row — safe to wrap
    TradeLogFormat.decodeBlock(payload, b.nRows, wanted)(v =>
      buf += new GenericInternalRow(v))
    rows = buf.iterator
    true
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    while (!rows.hasNext) if (!loadNextBlock()) return false
    current = rows.next()
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
