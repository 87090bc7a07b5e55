package graft.source

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming._

/** Offset into the committed global block sequence (manifest order):
  * `block` = number of blocks fully consumed. JSON round-trips through
  * the checkpoint's offset log exactly like Kafka's partition-offset
  * maps — restart resumes from the last committed block.
  *
  * OFFSET STABILITY CONTRACT: offsets index the manifest's block order,
  * which appends only EXTEND — so offsets are stable under any sequence
  * of appends/epoch commits. A retention PURGE removes blocks and shifts
  * the indices of survivors: purging data an ACTIVE stream's checkpoint
  * still indexes is therefore out of contract (retention must trail the
  * slowest consumer, the Kafka retention-vs-consumer-lag rule). A
  * production evolution would stamp each block with a monotone sequence
  * id at commit so offsets survive compaction/purge — the same family of
  * change as sharding the manifest per day-partition. */
final case class TradeLogOffset(block: Int) extends Offset {
  override def json(): String = s"""{"block":$block}"""
}

object TradeLogOffset {
  def fromJson(json: String): TradeLogOffset = {
    val m = """\{\s*"block"\s*:\s*(\d+)\s*\}""".r
    json.trim match {
      case m(n) => TradeLogOffset(n.toInt)
      case _ => throw new IllegalArgumentException(s"bad tradelog offset: $json")
    }
  }
}

/** Micro-batch read over a committed tradelog: the manifest's block list
  * is the topic, a block index is the offset. `SupportsAdmissionControl`
  * applies `maxBlocksPerTrigger` per batch (the Kafka
  * maxOffsetsPerTrigger idea — rate limiting lives in latestOffset, not
  * in planInputPartitions), and `SupportsTriggerAvailableNow` pins the
  * end target when the trigger starts, so AvailableNow drains exactly
  * the blocks committed at start time across however many rate-limited
  * batches that takes. Each batch's partitions regroup its block range
  * by file — the same split shape as the batch scan. */
final class TradeLogMicroBatchStream(path: String, wanted: Array[Int],
    xtypes: Array[org.apache.spark.sql.types.DataType],
    maxBlocksPerTrigger: Option[Int],
    startingGeneration: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private lazy val blocks = TradeLogFormat.readManifest(path).toIndexedSeq
  @volatile private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(blocks.size)

  /** Fresh streams may start past a generation sync point
    * (`startingGeneration`): generation N's blocks must be a PREFIX of
    * the head sequence (pure appends) or positioning fails loudly — a
    * purge/truncate in between would otherwise silently mis-position the
    * stream. Resumed streams never call this (the checkpoint's offset
    * log owns the position), so a sync point outdated by a later purge
    * can never break a legitimate resume (r16 review follow-up). */
  override def initialOffset(): Offset = TradeLogOffset(
    startingGeneration.fold(0) { g =>
      val snap = TradeLogFormat.readManifestInfoAt(path, g).blocks
      require(blocks.take(snap.size).map(b => (b.file, b.offset))
          == snap.map(b => (b.file, b.offset)),
        s"graft-tradelog: generation $g is not a prefix of the head " +
          "block sequence (a purge/truncate intervened) — " +
          "startingGeneration cannot position this stream")
      snap.size
    })
  override def deserializeOffset(json: String): Offset =
    TradeLogOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    maxBlocksPerTrigger.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  /** Rate-limited advance: at most `maxBlocksPerTrigger` blocks per
    * batch, never past the AvailableNow snapshot target. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[TradeLogOffset].block
    val end = availableNowTarget.getOrElse(blocks.size)
    val step = maxBlocksPerTrigger.getOrElse(Int.MaxValue).toLong
    TradeLogOffset(math.min(end.toLong, from.toLong + step).toInt)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = TradeLogOffset(blocks.size)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val a = start.asInstanceOf[TradeLogOffset].block
    val b = end.asInstanceOf[TradeLogOffset].block
    blocks.slice(a, b).groupBy(_.file).toSeq.sortBy(_._1).map {
      case (_, bs) => TradeLogPartition(path, bs.sortBy(_.offset))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TradeLogReaderFactory(wanted, xtypes, HadoopConfBox.active())

  override def commit(end: Offset): Unit = () // the offset log is the commit
  override def stop(): Unit = ()
}
