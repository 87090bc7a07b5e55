package graft.source

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.expressions.filter.Predicate
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
  /** The table schema of THIS read: base prefix + whatever extra columns
    * the governing manifest records (schema evolution — a widened log
    * reads back with its union schema, old blocks null-filling the
    * tail). TIME TRAVEL resolves against the PINNED generation's own
    * header, so `atGeneration`/`asOfEpoch` serve the schema a reader saw
    * THEN — a pre-widening snapshot comes back without the later columns
    * (the Delta/Iceberg snapshot-schema rule; r16 review finding).
    * Changes-since reads use the head schema (delta blocks are the
    * newest). Header-only reads — no block CSV is parsed for inference.
    * A fresh directory (no manifest yet — the first write) is
    * base-schema; widened FIRST writes are admitted by ACCEPT_ANY_SCHEMA
    * + the write builder's own prefix validation, not by inference. */
  /** asOfEpoch resolved ONCE here and threaded through the table to the
    * scan, so an epoch commit landing between schema inference and scan
    * construction can never pin the block list at a different generation
    * than the schema was inferred from (r16 advice). Spark calls
    * inferSchema then getTable on the same provider instance. */
  @volatile private var resolvedPin: Option[Long] = None
  /** `option("ref", name)` resolved ONCE at schema inference, like the
    * generation pin: a tag (or an unwritten branch) resolves to its main
    * generation through [[resolvedPin]]; a written branch resolves to an
    * exact (name, branch-local gen) snapshot pin, so a branch commit
    * landing between inference and scan can never split the read. */
  @volatile private var resolvedBranch: Option[(String, Long)] = None

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-tradelog requires a path"))
    Option(options.get("ref")) match {
      case Some(name) =>
        require(options.get("atGeneration") == null &&
          options.get("asOfEpoch") == null,
          "graft-tradelog: a ref read is already pinned — it cannot " +
            "combine with atGeneration/asOfEpoch")
        val r = TradeLogRefs.readRef(path, name)
        if (r.gen == 0L) {
          resolvedPin = Some(r.base)
          TradeLogFormat.readManifestInfoAt(path, r.base, headerOnly = true)
            .tableSchema
        } else {
          resolvedBranch = Some((name, r.gen))
          TradeLogRefs.snapshotInfo(path, name, r.gen, headerOnly = true)
            .tableSchema
        }
      case None =>
        val pinnedGen = Option(options.get("atGeneration")).map(_.toLong)
          .orElse(Option(options.get("asOfEpoch")).map(e =>
            TradeLogFormat.resolveEpochGen(path, e.toLong)))
        resolvedPin = pinnedGen
        pinnedGen match {
          case Some(g) =>
            TradeLogFormat.readManifestInfoAt(path, g, headerOnly = true)
              .tableSchema
          case None =>
            val (filesystem, root) = TradeLogFormat.fs(path)
            if (filesystem.exists(new org.apache.hadoop.fs.Path(root,
                TradeLogFormat.ManifestName)))
              TradeLogFormat.readManifestHeader(path).tableSchema
            else TradeLogFormat.schema
        }
    }
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TradeLogTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("graft-tradelog requires a path")),
      schema, resolvedPin, resolvedBranch = resolvedBranch)
}

final class TradeLogTable(path: String,
    tableSchema: StructType = TradeLogFormat.schema,
    resolvedPin: Option[Long] = None,
    acceptAnySchema: Boolean = true,
    resolvedBranch: Option[(String, Long)] = None)
    extends Table with SupportsRead with SupportsWrite
    with SupportsDeleteV2 with SupportsRowLevelOperations
    with SupportsMetadataColumns {
  override def name(): String = s"graft-tradelog `$path`"
  override def schema(): StructType = tableSchema

  /** `_file` — the data file serving each row (the Iceberg/Delta
    * metadata-column idiom). Besides ad-hoc lineage queries, this is
    * what the GROUP-BASED row-level operations key on: Spark's
    * ReplaceData machinery only routes properly-projected data rows to
    * the writer when the operation declares required metadata
    * attributes, and `_file` is the tradelog's natural group identity.
    *
    * `_boff` / `_brow` — the block offset and row-in-block ordinal: with
    * `_file` they form the ROW ID of the merge-on-read delete lane
    * ([[TradeLogDeltaDeleteOperation]], `SupportsDelta.rowId`) — the
    * Iceberg (_file, _pos) position-delete identity at block granularity.
    * All three are filled from block metadata at zero decode cost. */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = false
      override def comment(): String =
        "tradelog data file this row was read from"
    },
    new MetadataColumn {
      override def name(): String = "_boff"
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "byte offset of this row's block within its data file"
    },
    new MetadataColumn {
      override def name(): String = "_brow"
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.IntegerType
      override def isNullable: Boolean = false
      override def comment(): String =
        "row ordinal within this row's block (the delete-vector bit)"
    },
    new MetadataColumn {
      override def name(): String = "_change_type"
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = false
      override def comment(): String =
        "CDF verb of this row: insert, or delete on a " +
          "withChangeTypes changes-since read (Delta _change_type)"
    })

  // ---- SQL row-level operations (see TradeLogRowLevel.scala) ----------
  /** Metadata-only DELETE feasibility: ts-bounds vocabulary AND every
    * matching block provably fully-covered. A `false` here routes the
    * command to the group-based copy-on-write rewrite below. */
  override def canDeleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions
        .filter.Predicate]): Boolean =
    TradeLogDml.canMetadataDelete(path, predicates)
  override def deleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions
        .filter.Predicate]): Unit =
    TradeLogDml.metadataDelete(path, predicates)
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => {
      // Row-level routing by the table's delmode property (one header
      // line): "mor" → the SupportsDelta lane for ALL THREE verbs —
      // DELETE/UPDATE fold DVs (+ tail-appended new images), and MERGE
      // (r19: the Iceberg write.merge.mode=merge-on-read half) plans as
      // WriteDelta over a full row match: matched DELETE/UPDATE rows
      // become DV bits + tail appends, not-matched inserts are ordinary
      // appends — zero data files rewritten by the matched clauses.
      // Default ("cow") → the group-based copy-on-write rewrite.
      val mor =
        TradeLogFormat.readManifestHeader(path).delMode.contains("mor")
      if (mor) new TradeLogDeltaOperation(path, tableSchema, info.command())
      else new TradeLogRowLevelOperation(path, tableSchema, info.command())
    }
  // ACCEPT_ANY_SCHEMA: schema EVOLUTION means a write's schema may be
  // wider than the inferred table schema (the widening write itself);
  // Spark's by-name reconciliation is therefore deferred to the write
  // builder, whose prefix check rejects anything that is not the base
  // schema plus supported trailing columns. The CATALOG door drops this
  // capability (acceptAnySchema = false): UPDATE/MERGE assignment
  // alignment is skipped for accept-any targets (the Kafka-sink rule),
  // which would break SQL DML resolution — so widening writes go through
  // the path door, and catalog-door writes reconcile by name like any
  // exact-schema table.
  override def capabilities(): util.Set[TableCapability] = {
    val caps = util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
    if (acceptAnySchema) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TradeLogScanBuilder(path, tableSchema, options, resolvedPin,
      resolvedBranch = resolvedBranch)
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
final class TradeLogScanBuilder(path: String, tableSchema: StructType,
    options: CaseInsensitiveStringMap,
    resolvedPin: Option[Long] = None,
    onScan: TradeLogScan => Unit = _ => (),
    resolvedBranch: Option[(String, Long)] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var required: StructType = tableSchema
  private var accepted: Array[Filter] = Array.empty
  private var tsLo: Long = Long.MinValue
  private var tsHi: Long = Long.MaxValue
  private var pushedAgg: Option[Seq[aggregate.AggregateFunc]] = None

  /** V1 filter values for TimestampType arrive as java.sql.Timestamp or
    * java.time.Instant depending on the session's datetime-java8 conf;
    * both convert exactly to epoch micros. Timestamp needs FLOOR
    * division to epoch seconds: `getTime` truncates toward zero while
    * `getNanos` always carries the POSITIVE sub-second, so a plain
    * `/ 1000` would mis-place every pre-1970 instant by up to a second
    * (and the advisory block skip would then drop matching rows). */
  private def tsMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(Math.addExact(
        Math.multiplyExact(Math.floorDiv(t.getTime, 1000L), 1000000L),
        (t.getNanos / 1000).toLong))
    case i: java.time.Instant =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong))
    case _ => None
  }

  private var userIds: Option[Set[Long]] = None
  private def restrictUsers(ids: Set[Long]): Unit =
    userIds = Some(userIds.fold(ids)(_ intersect ids))

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
      // user_id point/set predicates drive the per-block bloom skip
      case f @ sources.EqualTo("user_id", v: Long) =>
        restrictUsers(Set(v)); Some(f)
      case f @ sources.In("user_id", vs) =>
        // Restrict ONLY if every element converts to Long (mirrors the
        // runtime filter() rule): a dropped value would make the bloom
        // skip unsound, because skipped blocks are never re-checked by
        // the residual. Unknown element type ⇒ accept without skipping.
        val asLongs = vs.map {
          case l: Long              => Some(l)
          case i: java.lang.Integer => Some(i.toLong)
          case _                    => None
        }
        if (asLongs.forall(_.isDefined)) restrictUsers(asLongs.flatten.toSet)
        Some(f)
      case _ => None
    }
    filters // everything stays residual — skipping is advisory-only
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COMPLETE aggregate pushdown from block metadata: an unfiltered,
    * ungrouped `count(*)` / `min(ts)` / `max(ts)` is answered from the
    * manifest alone (nRows sums; per-block ts extremes are EXACT, not
    * estimates) — no data file is ever opened. Spark only attempts the
    * push when no filter remained un-pushed below the aggregate, and the
    * guard additionally demands this builder saw no filters at all, so a
    * pushed answer can never silently ignore a predicate. */
  // merge-on-read delete vectors make manifest stats NON-answers: count
  // must exclude masked rows and a deleted row may hold a ts extreme — a
  // DV'd log declines completely. Lazy + checked LAST, so the refs file
  // read runs at most once per builder and only for aggregates every
  // cheap structural check already accepted (r18 review finding: the
  // read used to precede the expression check and ran from both
  // supportCompletePushDown and pushAggregation).
  private lazy val headHasDvDeletes: Boolean =
    TradeLogFormat.readManifestRefs(path).totalDeletes > 0L

  private def manifestAnswerable(agg: aggregate.Aggregation): Boolean = {
    def isTs(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case n: org.apache.spark.sql.connector.expressions.NamedReference =>
          n.fieldNames.sameElements(Array("ts"))
        case _ => false
      }
    agg.groupByExpressions.isEmpty && accepted.isEmpty &&
      tsLo == Long.MinValue && tsHi == Long.MaxValue &&
      // time travel pins a SNAPSHOT manifest (and changes-since diffs
      // against one); the agg scan answers from the head manifest, so
      // those reads must take the normal path
      !options.containsKey("atGeneration") &&
      !options.containsKey("asOfEpoch") &&
      !options.containsKey("changesSinceGeneration") &&
      !options.containsKey("onlyDeleted") &&
      !options.containsKey("optimizeScope") &&
      !options.containsKey("ref") && // ref reads pin a snapshot manifest
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: aggregate.CountStar => true
        case m: aggregate.Min => isTs(m.column)
        case m: aggregate.Max => isTs(m.column)
        case _ => false
      } &&
      !headHasDvDeletes
  }
  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    manifestAnswerable(agg)
  override def pushAggregation(agg: aggregate.Aggregation): Boolean =
    // partial pushdown is declined: either the manifest answers COMPLETELY
    // or the normal scan runs
    manifestAnswerable(agg) && {
      pushedAgg = Some(agg.aggregateExpressions.toSeq); true
    }

  override def build(): Scan = pushedAgg match {
    case Some(aggs) => new TradeLogAggScan(path, aggs)
    case None =>
      val s = new TradeLogScan(path, tableSchema, required, tsLo, tsHi,
        userIds, options, resolvedPin, resolvedBranch)
      // row-level operations register here so their ReplaceData write can
      // learn exactly which blocks this scan planned (the COW group set)
      onScan(s)
      s
  }
}

/** Metadata-only scan for a completely-pushed aggregate: ONE row computed
  * on the driver from the manifest; data files are never opened (spec
  * proves it by deleting them). Blocks with no non-null ts contribute to
  * the count but not the extremes — exactly min/max's null handling. */
final class TradeLogAggScan(path: String,
    aggs: Seq[aggregate.AggregateFunc]) extends Scan with Batch {
  import org.apache.spark.sql.types._

  override def readSchema(): StructType = StructType(aggs.zipWithIndex.map {
    case (_: aggregate.CountStar, i) =>
      StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", TimestampType)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftTradeLog PushedAggregates path=$path " +
      s"[${aggs.map(_.toString).mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val blocks = TradeLogFormat.readManifest(path)
    // the pushdown was accepted when the head carried no delete vectors;
    // this re-read is the head at EXECUTION time — a MoR DELETE landing
    // in between would make raw-nRows sums and ts extremes answers to no
    // committed snapshot, so fail loudly with the remedy (the normal
    // scan masks at read time) instead of serving stale stats (r18
    // review finding)
    require(blocks.forall(_.nDel == 0),
      s"graft-tradelog $path: a merge-on-read DELETE committed between " +
        "aggregate-pushdown planning and execution — re-run the query " +
        "(it will take the normal masked scan)")
    val withTs = blocks.filter(_.minTsUs != Long.MinValue)
    val values: Array[Any] = aggs.map {
      case _: aggregate.CountStar => blocks.map(_.nRows.toLong).sum
      case _: aggregate.Min =>
        if (withTs.isEmpty) null else withTs.map(_.minTsUs).min
      case _ =>
        if (withTs.isEmpty) null else withTs.map(_.maxTsUs).max
    }.toArray
    Array(TradeLogAggRow(values))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val vs = partition.asInstanceOf[TradeLogAggRow].values
      new PartitionReader[InternalRow] {
        private var done = false
        override def next(): Boolean = !done && { done = true; true }
        override def get(): InternalRow = new GenericInternalRow(vs)
        override def close(): Unit = ()
      }
    }
}

final case class TradeLogAggRow(values: Array[Any]) extends InputPartition

final class TradeLogScan(path: String, tableSchema: StructType,
    required: StructType,
    tsLo: Long, tsHi: Long, userIds: Option[Set[Long]],
    options: CaseInsensitiveStringMap,
    resolvedPin: Option[Long] = None,
    resolvedBranch: Option[(String, Long)] = None)
    extends Scan with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {

  /** Output slots in pruned-schema order: a table-schema ordinal, or a
    * negative sentinel for the `_file`/`_boff`/`_brow` metadata columns
    * (filled by the reader from block metadata — no decode). */
  private[source] val outCols: Array[Int] = required.fieldNames.map {
    case "_file" => TradeLogScan.FileCol
    case "_boff" => TradeLogScan.BoffCol
    case "_brow" => TradeLogScan.BrowCol
    case "_change_type" => TradeLogScan.ChangeCol
    case n => tableSchema.fieldIndex(n)
  }

  /** Ordinals (into the widened table schema) the reader materializes,
    * in pruned-schema order (metadata columns excluded). */
  private[source] val wanted: Array[Int] = outCols.filter(_ >= 0)

  /** Extra-column types of the widened table schema (evolution tail). */
  private val xtypes: Array[org.apache.spark.sql.types.DataType] =
    tableSchema.fields.drop(TradeLogFormat.BaseCols).map(_.dataType)

  /** TIME TRAVEL: `atGeneration` pins an exact manifest generation,
    * `asOfEpoch` resolves to the newest generation whose committed
    * streaming epoch is <= the requested one. Either way the scan plans
    * against the PINNED snapshot — concurrent appends/purges publish new
    * head manifests and never disturb it (data-file availability bounds
    * the horizon via the delist-journal grace; see readManifestInfoAt). */
  /** REF read (`option("ref", name)` — branch/tag heads): resolved once
    * at schema inference and threaded here like the generation pin; the
    * orElse leg re-resolves only for scans built directly in specs. A
    * tag / unwritten branch lands in [[travelGen]] instead (its head IS
    * a main generation snapshot). */
  /** A spec-built scan (no inference ran) resolves its own ref once. */
  private val specRef: Option[TradeLogRefs.RefInfo] =
    if (resolvedBranch.isEmpty && resolvedPin.isEmpty)
      Option(options.get("ref")).map(TradeLogRefs.readRef(path, _))
    else None

  private val branchPin: Option[(String, Long)] =
    resolvedBranch.orElse(
      specRef.collect { case r if r.gen > 0L => (r.name, r.gen) })

  private val travelGen: Option[Long] = {
    val g = Option(options.get("atGeneration")).map(_.toLong)
    val e = Option(options.get("asOfEpoch")).map(_.toLong)
    require(g.isEmpty || e.isEmpty,
      "graft-tradelog: set atGeneration OR asOfEpoch, not both")
    require(!options.containsKey("ref") || (g.isEmpty && e.isEmpty),
      "graft-tradelog: a ref read is already pinned — it cannot combine " +
        "with atGeneration/asOfEpoch")
    // asOfEpoch was resolved ONCE at schema inference and threaded here
    // (r16 advice: a second resolution could pin a different generation
    // than the schema came from); the orElse legs only serve scans built
    // directly in specs, where no inference ran (a tag / unwritten
    // branch pins its anchored MAIN generation)
    resolvedPin.orElse(
        g.orElse(e.map(ep => TradeLogFormat.resolveEpochGen(path, ep))))
      .orElse(specRef.collect { case r if r.gen == 0L => r.base })
  }

  /** CHANGES-SINCE read (`option("changesSinceGeneration", N)`) — the
    * incremental-consumer verb (Delta CDF / Iceberg incremental scan for
    * an append log): plan ONLY the blocks present in the head manifest
    * but absent at generation N, i.e. everything committed after the
    * consumer's last sync point. Block identity is (file, offset) —
    * exact under append-only evolution (appends never rewrite committed
    * blocks). A purge interleaved between N and now REMOVES blocks;
    * removals are not change rows (the log has no delete records), so a
    * consumer spanning purges sees only the additions — documented
    * contract, spec-pinned. */
  private val changesSince: Option[Long] =
    Option(options.get("changesSinceGeneration")).map(_.toLong)
  require(changesSince.isEmpty || (travelGen.isEmpty && branchPin.isEmpty),
    "graft-tradelog: changesSinceGeneration cannot combine with a pinned read")

  /** CDF DELETE ROWS (`option("withChangeTypes", true)` on a
    * changes-since read — the Delta readChangeFeed verb): besides the
    * additions ('insert'), emit every row whose DELETE-VECTOR bit was
    * set since the sync point as a 'delete' row (`_change_type`
    * metadata column). Exact for the MoR tier by construction: a DV
    * change rewrites the block's manifest shard, so both versions of
    * the block resolve in the diff and the delta mask (new & ~old) IS
    * the deleted-row set; a MoR UPDATE surfaces as delete + insert
    * (the Delta pre/post-image pair collapsed). A MoR DELETE that masks
    * EVERY row of a block reports identically: the block is retained in
    * the manifest (liveRows 0) precisely so this pairing resolves it —
    * delete tracking never depends on how the statement's rows align
    * with block boundaries (r19 advice, medium). Boundary, documented:
    * whole-BLOCK removals (metadata-tier/COW deletes, retention purges)
    * follow the existing restatement contract
    * — the log keeps no tombstones for them; and a compaction that
    * folded PRE-sync content destroys the delta, so withChangeTypes
    * REFUSES such folds loudly instead of under-reporting (sync before
    * compacting, the Delta CDF-retention rule re-expressed). */
  private val withChangeTypes: Boolean =
    Option(options.get("withChangeTypes")).exists(_.toBoolean)
  require(!withChangeTypes || changesSince.isDefined,
    "graft-tradelog: withChangeTypes qualifies a changes-since read — " +
      "set changesSinceGeneration")

  /** Maintenance read (`option("onlyDeleted", true)`): plan ONLY blocks
    * carrying a delete vector — what [[TradeLogMaintenance
    * .compactDeletes]] rewrites. Shard pruning comes free from the refs'
    * nDel tier in [[pruneShards]]. Head-only by contract: a pinned or
    * incremental onlyDeleted read would hand the compaction a STALE DV
    * state to fold against the head's conflict token. Declared BEFORE
    * pruneShards/selectedBlocks, which read it — their laziness made a
    * later declaration work, but only by initialization-order accident
    * (r18 advice). */
  private val onlyDeleted: Boolean =
    Option(options.get("onlyDeleted")).exists(_.toBoolean)
  require(!onlyDeleted ||
    (travelGen.isEmpty && changesSince.isEmpty && branchPin.isEmpty),
    "graft-tradelog: onlyDeleted is a head-only maintenance read — it " +
      "cannot combine with time travel, ref, or changes-since options")

  /** Maintenance read (`option("optimizeScope", "lo:hi")`, µs): plan
    * ONLY blocks whose KNOWN ts span sits fully inside [lo, hi] — the
    * read half of a scoped OPTIMIZE ([[TradeLogMaintenance
    * .optimizeRange]]). Block-exact by construction: a ts PREDICATE
    * would also read straddling blocks and then residual-drop their
    * out-of-range rows, while the paired commit drops whole blocks —
    * data loss; this option's containment rule and the commit's use the
    * same span test, so the read covers exactly what the commit
    * replaces. Head-only like onlyDeleted. */
  private val optimizeScope: Option[(Long, Long)] =
    Option(options.get("optimizeScope")).map { s =>
      val a = s.split(":", 2)
      require(a.length == 2, s"optimizeScope must be loUs:hiUs, got $s")
      (a(0).toLong, a(1).toLong)
    }
  require(optimizeScope.isEmpty ||
    (travelGen.isEmpty && changesSince.isEmpty && branchPin.isEmpty &&
      !onlyDeleted),
    "graft-tradelog: optimizeScope is a head-only maintenance read — it " +
      "cannot combine with other read modes")

  /** Fully-contained-in-scope test shared by the read and (via
    * [[TradeLogOptimizeWrite]]) the commit: unknown spans never qualify
    * — a block whose ts range is unknown cannot be proven inside. */
  private def inScope(b: BlockMeta): Boolean = optimizeScope.forall {
    case (lo, hi) =>
      b.minTsUs != Long.MinValue && b.minTsUs >= lo && b.maxTsUs <= hi
  }

  /** Shard-level planning: resolve ONLY the shards whose ts span / user
    * range intersects the pushed bounds — the two-level-manifest payoff
    * (a narrow time slice over a years-deep log reads a handful of shard
    * files, never the whole block ledger). Block-level skipping then
    * refines within the resolved shards; both tiers are advisory (the
    * residual filters keep results exact), and unknown spans stay
    * conservative. Legacy flat manifests resolve inline (one unprunable
    * "shard"). */
  private def pruneShards(info: TradeLogFormat.ManifestInfo)
      : (Seq[BlockMeta], Int, Int) =
    if (info.shards.isEmpty)
      (TradeLogFormat.resolveBlocks(path, info),
        if (info.blocks.isEmpty) 0 else 1, if (info.blocks.isEmpty) 0 else 1)
    else {
      val sel = info.shards.filter(r =>
        r.intersectsTs(tsLo, tsHi) &&
          userIds.forall(ids => r.mightContainAnyUser(ids)) &&
          (!onlyDeleted || r.nDel > 0L) &&
          optimizeScope.forall { case (lo, hi) => r.intersectsTs(lo, hi) })
      (sel.flatMap(TradeLogFormat.readShardBlocks(path, _)).sortBy(_.seq),
        sel.size, info.shards.size)
    }

  /** Replace-commit triage for the changes-since diff (the CDF face of
    * the stream's rule, r18 advice): a block written by a DV compaction /
    * OPTIMIZE restates rows whose source seqs span [srcMin, srcMax].
    * Sources all at-or-below the sync point's max seq → their content was
    * visible at the sync point, the restatement is not a change — skip.
    * Sources all after → the originals were post-sync changes the rewrite
    * then removed from the head, so this block is their only carrier —
    * emit. Straddling → no exact answer exists; fail loudly. */
  private def dropConsumedReplacements(bs: Seq[BlockMeta], baseMax: Long)
      : Seq[BlockMeta] =
    bs.filter { b =>
      // (withChangeTypes diffs that cross a fold of pre-sync content
      // never reach here — changesPlan routes them through
      // foldCrossingPlan, which serves from the retention sidecar)
      if (!b.isReplace) true
      else if (b.srcMaxSeq <= baseMax) false
      else if (b.srcMinSeq > baseMax) true
      else throw new IllegalStateException(
        s"graft-tradelog $path: block ${b.file}@${b.offset} was written " +
          s"by a replace commit folding seqs [${b.srcMinSeq}," +
          s"${b.srcMaxSeq}], which straddles the sync point's max seq " +
          s"($baseMax) — the diff cannot be answered exactly; re-sync " +
          "from the current head")
    }

  /** The delete-rows half of a withChangeTypes diff: for a block present
    * on BOTH sides of the sync point with a changed delete vector,
    * synthesize a read of EXACTLY the newly-masked ordinals — the block
    * meta re-masked so the reader (which skips set bits) emits the
    * delta and nothing else. None when the vector is unchanged. */
  private def dvDeltaBlock(head: BlockMeta, base: BlockMeta)
      : Option[BlockMeta] = {
    if (head.dvHex == base.dvHex) return None
    val nw = (head.nRows + 63) >>> 6
    val newDv = TradeLogFormat.dvWords(head.dvHex)
    val oldDv = TradeLogFormat.dvWords(base.dvHex)
    def word(a: Array[Long], i: Int): Long =
      if (a == null || i >= a.length) 0L else a(i)
    var delta = 0
    val mask = new Array[Long](nw)
    var i = 0
    while (i < nw) {
      var d = word(newDv, i) & ~word(oldDv, i)
      if (i == nw - 1 && (head.nRows & 63) != 0)
        d &= (1L << (head.nRows & 63)) - 1 // ignore stray beyond-nRows bits
      delta += java.lang.Long.bitCount(d)
      // emit-mask: every ordinal NOT in the delta is masked out (bits
      // beyond nRows left clear — the reader never consults them and
      // nDel must equal nRows - |delta| for liveRows)
      mask(i) = ~d
      if (i == nw - 1 && (head.nRows & 63) != 0)
        mask(i) &= (1L << (head.nRows & 63)) - 1
      i += 1
    }
    if (delta == 0) None
    else Some(head.copy(dvHex = TradeLogFormat.dvHexOf(mask),
      nDel = head.nRows - delta))
  }

  /** The changes-since diff: (additions, DV-delta delete blocks). The
    * second element is empty unless withChangeTypes. Incremental diff at
    * SHARD granularity: shard files are immutable and carried by ref, so
    * shared refs contribute no candidates — only shards added (or
    * rewritten) after the sync point resolve, and only sync-point shards
    * the head dropped resolve for identity subtraction / DV-delta
    * pairing. Legacy flat manifests on either side fall back to the full
    * identity diff. */
  private lazy val changesPlan: (Seq[BlockMeta], Seq[BlockMeta]) =
    changesSince match {
      case None => (Seq.empty, Seq.empty)
      case Some(n) =>
        val headI = TradeLogFormat.readManifestRefs(path)
        val snapI = TradeLogFormat.readManifestInfoAt(path, n, refsOnly = true)
        val (headCand, basePool, baseMax) =
          if (headI.shards.isEmpty || snapI.shards.isEmpty) {
            val baseBlocks = TradeLogFormat.resolveBlocks(path, snapI)
            (TradeLogFormat.resolveBlocks(path, headI), baseBlocks,
              math.max(snapI.maxSeq,
                baseBlocks.foldLeft(-1L)((a, b) => math.max(a, b.seq))))
          } else {
            val snapFiles = snapI.shards.map(_.file).toSet
            val headFiles = headI.shards.map(_.file).toSet
            (headI.shards.filterNot(r => snapFiles(r.file))
              .flatMap(TradeLogFormat.readShardBlocks(path, _)),
              snapI.shards.filterNot(r => headFiles(r.file))
                .flatMap(TradeLogFormat.readShardBlocks(path, _)),
              math.max(snapI.maxSeq,
                snapI.shards.foldLeft(-1L)((a, r) => math.max(a, r.maxSeq))))
          }
        val baseByKey = basePool.map(b => (b.file, b.offset) -> b).toMap
        val newInHead =
          headCand.filterNot(b => baseByKey.contains((b.file, b.offset)))
        // a DELETE-tracking diff whose window crosses ANY fold of
        // pre-sync content routes through the retention sidecar (r19
        // verdict #3); a PLAIN diff's replace triage is exact without it
        // except on a STRADDLING fold — there the sidecar serves the
        // post-sync additions from the dropped copies instead of
        // refusing (r20: within retention, every diff is answerable
        // across maintenance)
        if ((withChangeTypes &&
              newInHead.exists(b => b.isReplace && b.srcMinSeq <= baseMax))
            || newInHead.exists(b => b.isReplace &&
              b.srcMinSeq <= baseMax && b.srcMaxSeq > baseMax))
          foldCrossingPlan(n, headCand, newInHead, basePool, baseByKey,
            baseMax)
        else {
          val additions =
            dropConsumedReplacements(newInHead, baseMax).sortBy(_.seq)
          val deletes =
            if (!withChangeTypes) Seq.empty
            else headCand.flatMap(b =>
              baseByKey.get((b.file, b.offset)).flatMap(dvDeltaBlock(b, _)))
              .sortBy(_.seq)
          (additions, deletes)
        }
    }

  /** A withChangeTypes diff ACROSS a rewrite of pre-sync content —
    * Delta's CDF-retention semantics (r19 verdict #3). The fold
    * destroyed the dropped blocks' DV history and merged pre- and
    * post-sync rows into restatements; the retention sidecar
    * ([[TradeLogFormat.writeFoldSidecar]]) holds the dropped blocks'
    * FINAL pre-fold state, which is exactly enough to serve the diff:
    *
    *   - head replace blocks restating ONLY pre-sync content: skipped
    *     for additions (known at sync); their own accrued DV = post-fold
    *     deletes of pre-sync rows — emitted as a full-DV delta;
    *   - STRADDLING restatements: served from the dropped copies — the
    *     post-sync dropped blocks emit (with their final masks) as
    *     additions, the pre-sync dropped blocks pair for DV deltas; the
    *     restatement itself contributes nothing. Exact because a fold is
    *     content-preserving: restated rows ≡ dropped live rows (a
    *     per-span row-count equation verifies the sidecar is complete);
    *   - vanished pre-sync base blocks pair against their sidecar
    *     entry for the delta accrued between sync and fold.
    *
    * Refusals (loud, never silent under-report): sidecar missing or
    * incomplete (retention passed — expireSnapshots swept the fold's
    * generation), a dropped data file already vacuumed (the data half of
    * the retention window), post-fold deletes on a straddling
    * restatement (row identity across a fold is untracked), or a
    * CHAINED straddling fold inside the window. */
  private def foldCrossingPlan(syncGen: Long, headCand: Seq[BlockMeta],
      newInHead: Seq[BlockMeta], basePool: Seq[BlockMeta],
      baseByKey: Map[(String, Long), BlockMeta], baseMax: Long)
      : (Seq[BlockMeta], Seq[BlockMeta]) = {
    val sidecarGroups = TradeLogFormat.readFoldSidecars(path, syncGen)
    val sidecars: Map[(String, Long), BlockMeta] = sidecarGroups
      .flatMap(_._2).map(b => (b.file, b.offset) -> b).toMap
    def refuse(msg: String): Nothing = throw new IllegalStateException(
      s"graft-tradelog $path: $msg — consume changes before the fold " +
        "passes retention, or re-sync from the current head")
    def fullDvDelta(b: BlockMeta): Option[BlockMeta] =
      dvDeltaBlock(b, b.copy(nDel = 0, dvHex = ""))
    val additions = scala.collection.mutable.ArrayBuffer.empty[BlockMeta]
    val deletes = scala.collection.mutable.ArrayBuffer.empty[BlockMeta]
    // 1. head-side new blocks
    newInHead.foreach { b =>
      if (!b.isReplace) additions += b
      else if (b.srcMinSeq > baseMax) additions += b // only carrier
      else if (b.srcMaxSeq <= baseMax) {
        if (withChangeTypes) fullDvDelta(b).foreach(deletes += _)
      }
      else if (b.nDel > 0) refuse(
        s"block ${b.file}@${b.offset} restates a fold straddling the " +
          s"sync point (seqs [${b.srcMinSeq},${b.srcMaxSeq}]) and carries " +
          "post-fold deletes — row identity across the fold is untracked")
      // else: straddling, clean — content served from the sidecar below
    }
    // 2. per-straddling-span completeness: the head's restated rows must
    // equal some fold group's dropped live rows — matched by the span
    // the group's content RE-DERIVES (raw span membership over-counts
    // under chains: an earlier lineage copy's seq can sit inside a later
    // fold's transitive span without belonging to that fold)
    newInHead.filter(b => b.isReplace && b.srcMinSeq <= baseMax &&
        b.srcMaxSeq > baseMax)
      .groupBy(b => (b.srcMinSeq, b.srcMaxSeq)).foreach {
        case ((lo, hi), bs) =>
          val restated = bs.map(_.nRows.toLong).sum
          val matched = sidecarGroups.exists { case (_, g) =>
            g.nonEmpty &&
              TradeLogFormat.replaceProvenance(g) == ((lo, hi)) &&
              g.map(_.liveRows.toLong).sum == restated
          }
          if (!matched) refuse(
            s"the fold of seqs [$lo,$hi] restates $restated rows but no " +
              "retention sidecar resolves that span and count — the " +
              "sidecar was swept or the fold predates it")
      }
    // 3. sidecar blocks: recover what the folds destroyed. Content
    // LINEAGE rule for chains (fold of a fold): each post-sync row must
    // emit from the LATEST dropped copy of its lineage — a sidecar block
    // is SUPERSEDED (and skipped) when a later restatement of it is
    // itself servable: a head post-sync-only replace, or another sidecar
    // replace whose span covers its seq. A head STRADDLING replace never
    // supersedes — serving from the dropped copies IS its route.
    val sideBlocks = sidecars.values.toSeq.sortBy(_.seq)
    def superseded(d: BlockMeta): Boolean =
      newInHead.exists(h => h.isReplace && h.srcMinSeq > baseMax &&
        d.seq >= h.srcMinSeq && d.seq <= h.srcMaxSeq) ||
      sideBlocks.exists(r => r.isReplace && (r ne d) &&
        d.seq >= r.srcMinSeq && d.seq <= r.srcMaxSeq)
    sideBlocks.foreach { d =>
      if (d.isReplace && d.srcMinSeq <= baseMax && d.srcMaxSeq > baseMax)
        refuse(s"block ${d.file}@${d.offset} is a straddling restatement " +
          "that was itself folded again (chained folds inside the diff " +
          "window)")
      else if (baseByKey.contains((d.file, d.offset))) {
        // vanished pre-sync base block: the delta accrued sync→fold
        if (withChangeTypes) dvDeltaBlock(d, baseByKey((d.file, d.offset)))
          .foreach(deletes += _)
      }
      else if (d.isReplace && d.srcMaxSeq <= baseMax) {
        // intermediate pre-sync restatement dropped by a later fold: its
        // whole DV accrued post-sync
        if (withChangeTypes) fullDvDelta(d).foreach(deletes += _)
      }
      else if (d.seq > baseMax && (!d.isReplace || d.srcMinSeq > baseMax)) {
        // post-sync content (original or an entirely-post-sync
        // restatement of it) folded away — the dropped copy carries it
        // unless a later servable restatement supersedes it
        if (!superseded(d) && d.liveRows > 0) additions += d
      }
      // pre-sync non-replace sidecar blocks absent from basePool cannot
      // arise (their sync-point shard would have resolved them)
    }
    // 4. completeness for VANISHED pre-sync base blocks (delete-tracking
    // only — a plain diff's removals are not change rows): one that was
    // folded (covered by a replace span) but has no sidecar entry means
    // the sidecar was swept — refusing here is what keeps "no silent
    // under-report" when no straddling span exists to catch it
    val headKeys = headCand.map(b => (b.file, b.offset)).toSet
    val spans = (newInHead ++ sidecars.values).filter(_.isReplace)
      .map(b => (b.srcMinSeq, b.srcMaxSeq))
    if (withChangeTypes)
    basePool.filterNot(b => headKeys((b.file, b.offset))).foreach { b =>
      if (!sidecars.contains((b.file, b.offset)) &&
          spans.exists(s => b.seq >= s._1 && b.seq <= s._2)) refuse(
        s"block ${b.file}@${b.offset} (seq ${b.seq}) was folded but its " +
          "retention sidecar was swept — its DV delta is unrecoverable")
      // not covered by any fold: a retention purge — removals are not
      // change rows (the documented contract), skip silently
    }
    // 5. the data half of retention: every sidecar-served block's file
    // must still exist (the DML vacuum grace) — check at plan time so the
    // failure is a clean refusal, not a mid-scan FileNotFound
    val (fsys, root) = TradeLogFormat.fs(path)
    val sidecarKeys = sidecars.keySet
    (additions ++ deletes).filter(b => sidecarKeys((b.file, b.offset)))
      .map(_.file).distinct.foreach { f =>
        if (!fsys.exists(new org.apache.hadoop.fs.Path(root, f))) refuse(
          s"data file $f of a folded block was already vacuumed " +
            "(graft.tradelog.dml.vacuum.grace.ms bounds the data half " +
            "of CDF retention)")
      }
    // existing both-sides DV pairing still applies untouched
    if (withChangeTypes)
      headCand.foreach(b => baseByKey.get((b.file, b.offset))
        .flatMap(dvDeltaBlock(b, _)).foreach(deletes += _))
    (additions.sortBy(_.seq).toSeq, deletes.sortBy(_.seq).toSeq)
  }

  private lazy val shardPlan: (Seq[BlockMeta], Int, Int) = changesSince match {
    case Some(_) => (changesPlan._1, -1, -1)
    case None =>
      pruneShards(branchPin match {
        case Some((name, bg)) =>
          TradeLogRefs.snapshotInfo(path, name, bg, refsOnly = true)
        case None => travelGen match {
          case Some(g) =>
            TradeLogFormat.readManifestInfoAt(path, g, refsOnly = true)
          case None => TradeLogFormat.readManifestRefs(path)
        }
      })
  }

  private[source] lazy val allBlocks: Seq[BlockMeta] = shardPlan._1
  /** Shards this plan resolved / the manifest's total (-1 = diff read). */
  private[source] def shardsRead: Int = shardPlan._2
  private[source] def shardsTotal: Int = shardPlan._3

  /** Block-stats skip: keep a block unless its ts span provably misses
    * the pushed conjunction (blocks with no non-null ts always survive —
    * minTs of Long.MinValue encodes "unknown") or its user_id bloom
    * provably misses every requested id (legacy bloom-less blocks always
    * survive). */
  private def passesSkips(b: BlockMeta): Boolean =
    (b.minTsUs == Long.MinValue || (b.minTsUs <= tsHi && b.maxTsUs >= tsLo)) &&
      userIds.forall(_.exists(b.mightContainUser)) &&
      (!onlyDeleted || b.nDel > 0) &&
      // a fully-masked retained block (MoR DELETE of every row — kept in
      // the manifest so CDF diffs resolve it) emits nothing: skip its
      // file read entirely except on the maintenance lane that rewrites
      // it away
      (onlyDeleted || b.liveRows > 0) &&
      inScope(b)

  private[source] lazy val selectedBlocks: Seq[BlockMeta] =
    allBlocks.filter(passesSkips)

  /** withChangeTypes delete-rows blocks after the same advisory skips
    * (their spans/blooms describe the original rows, so pushed ts/user
    * bounds prune them identically; residuals re-apply exactly). */
  private[source] lazy val deleteEmitBlocks: Seq[BlockMeta] =
    changesPlan._2.filter(passesSkips)

  // ---- runtime (join-driven) filtering --------------------------------
  // The DPP surface: a broadcast join on user_id hands the build side's
  // id set to the scan AT EXECUTION TIME, and the bloom index drops
  // blocks before any partition is planned — dynamic partition pruning
  // re-expressed over block metadata. Purely advisory, like the static
  // skip: Spark re-applies the join itself. `_file` is the second filter
  // attribute — the group-filter lane row-level operations use (Spark's
  // RowLevelOperationRuntimeGroupFiltering computes the DISTINCT `_file`
  // of condition-matching rows and hands it here, so a straddling
  // ts-range DELETE's copy-on-write rewrites only the files that hold
  // matches, never the whole log — the Iceberg _file group idiom).
  @volatile private var runtimeIds: Option[Set[Long]] = None
  @volatile private var runtimeFiles: Option[Set[String]] = None

  /** Only attributes the scan actually OUTPUTS: Spark's pruning rules
    * resolve these against the relation output and fail on absent ones
    * (a pruned-away user_id or an unrequested _file must not be
    * advertised). */
  override def filterAttributes(): Array[NamedReference] = {
    val names = required.fieldNames.toSet
    (if (names("user_id")) Seq(Expressions.column("user_id")) else Nil) ++
      (if (names("_file")) Seq(Expressions.column("_file")) else Nil)
  }.toArray

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      def idOf(e: org.apache.spark.sql.connector.expressions.Expression)
          : Option[Long] = e match {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          l.value match {
          case v: java.lang.Long => Some(v)
          case v: java.lang.Integer => Some(v.toLong)
          case _ => None
        }
        case _ => None
      }
      def isRef(e: org.apache.spark.sql.connector.expressions.Expression,
          name: String) =
        e match {
          case n: NamedReference => n.fieldNames.sameElements(Array(name))
          case _ => false
        }
      def fileOf(e: org.apache.spark.sql.connector.expressions.Expression)
          : Option[String] = e match {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          l.value match {
            case s: org.apache.spark.unsafe.types.UTF8String =>
              Some(s.toString)
            case s: String => Some(s)
            case _ => None
          }
        case _ => None
      }
      val ids: Option[Set[Long]] = p.name() match {
        case "IN" if p.children().nonEmpty &&
            isRef(p.children()(0), "user_id") =>
          val vs = p.children().drop(1).map(idOf)
          if (vs.forall(_.isDefined)) Some(vs.flatten.toSet) else None
        case "=" if p.children().length == 2 &&
            isRef(p.children()(0), "user_id") =>
          idOf(p.children()(1)).map(Set(_))
        case _ => None // unknown predicate: no restriction (advisory)
      }
      ids.foreach(s =>
        runtimeIds = Some(runtimeIds.fold(s)(_ intersect s)))
      val files: Option[Set[String]] = p.name() match {
        case "IN" if p.children().nonEmpty &&
            isRef(p.children()(0), "_file") =>
          val vs = p.children().drop(1).map(fileOf)
          if (vs.forall(_.isDefined)) Some(vs.flatten.toSet) else None
        case "=" if p.children().length == 2 &&
            isRef(p.children()(0), "_file") =>
          fileOf(p.children()(1)).map(Set(_))
        case _ => None
      }
      files.foreach(s =>
        runtimeFiles = Some(runtimeFiles.fold(s)(_ intersect s)))
    }

  /** Blocks after BOTH plan-time and runtime skipping. */
  private[source] def effectiveBlocks: Seq[BlockMeta] = {
    val byUser = runtimeIds.fold(selectedBlocks)(ids =>
      selectedBlocks.filter(b => ids.exists(b.mightContainUser)))
    runtimeFiles.fold(byUser)(fs => byUser.filter(b => fs(b.file)))
  }

  override def readSchema(): StructType = required

  /** Post-skip manifest stats (EXACT pre-residual-filter figures, the
    * estimate contract) — what lets Catalyst cost a tradelog side small
    * enough to broadcast after a time-slice, instead of defaulting to a
    * shuffle join on an unknown-size custom source. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(
        (selectedBlocks ++ deleteEmitBlocks).map(_.payloadLen.toLong).sum)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(
        (selectedBlocks ++ deleteEmitBlocks).map(_.liveRows.toLong).sum)
  }

  override def description(): String = {
    val sel =
      if (tsLo == Long.MinValue && tsHi == Long.MaxValue && userIds.isEmpty)
        "all"
      else s"${selectedBlocks.size}/${allBlocks.size}"
    val users = userIds.fold("")(ids => s", PushedUserIds=${ids.toSeq.sorted
      .mkString("[", ",", "]")}")
    // surface the time-travel pin / delta sync point in .explain so a
    // plan audit can tell a pinned or incremental read from a head read
    val travel = travelGen.map(g => s", AtGeneration=$g").getOrElse("") +
      branchPin.map { case (n, g) => s", AtRef=$n@$g" }.getOrElse("") +
      changesSince.map(n => s", ChangesSinceGeneration=$n").getOrElse("") +
      (if (withChangeTypes) ", WithChangeTypes" else "")
    // the maintenance read surfaces likewise (r19 verdict #2: the plan
    // audit greps for them)
    val maint = optimizeScope.map { case (lo, hi) =>
        s", OptimizeScope=[$lo,$hi]" }.getOrElse("") +
      (if (onlyDeleted) ", OnlyDeleted" else "")
    val shards =
      if (shardsTotal > 0) s", shards=$shardsRead/$shardsTotal" else ""
    s"GraftTradeLog path=$path, ReadSchema=${required.simpleString}, " +
      s"PushedTsBounds=[$tsLo,$tsHi]$users$travel$maint$shards, blocks=$sel"
  }

  /** The blocks the batch ACTUALLY planned (set at planInputPartitions
    * time, after both plan-time and runtime skipping) — what a row-level
    * operation's ReplaceData write must replace, exactly: rows in any
    * other block were never read, so their blocks must survive the
    * commit untouched. Null until a batch was planned. */
  @volatile private[source] var plannedBlocks: Seq[BlockMeta] = null

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val eff = effectiveBlocks
      plannedBlocks = eff
      // one partition per data file (its surviving blocks read
      // sequentially): parallelism == layout, the file-source shape.
      // withChangeTypes adds per-file DELETE-rows partitions (the DV
      // delta re-masked to emit exactly the newly-deleted ordinals).
      (eff.groupBy(_.file).toSeq.sortBy(_._1).map {
        case (_, blocks) => TradeLogPartition(path, blocks.sortBy(_.offset))
      } ++ deleteEmitBlocks.groupBy(_.file).toSeq.sortBy(_._1).map {
        case (_, blocks) => TradeLogPartition(path, blocks.sortBy(_.offset),
          changeType = "delete")
      }).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new TradeLogReaderFactory(outCols, xtypes, HadoopConfBox.active())
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // a REF stream is allowed (r19 verdict #5 — the WAP validation
    // consumer: audit a staged branch with a streaming query before
    // publish); the travelGen/branchPin that ref resolution populates
    // are the stream's own head then, not a batch-only pin
    val streamRef = Option(options.get("ref"))
    require(changesSince.isEmpty && !onlyDeleted && optimizeScope.isEmpty &&
      (streamRef.nonEmpty || (travelGen.isEmpty && branchPin.isEmpty)),
      "graft-tradelog: time travel (atGeneration/asOfEpoch/" +
        "changesSinceGeneration) and the maintenance reads " +
        "(onlyDeleted/optimizeScope) are batch-only — a stream's offsets " +
        "already pin its own position in the block sequence")
    // the micro-batch reader materializes DATA ordinals only (`wanted`);
    // a resolved metadata column would silently misalign emitted rows
    // with the declared readSchema — fail cleanly instead (r17 advice)
    require(outCols.forall(_ >= 0),
      "graft-tradelog: metadata columns (_file/_boff/_brow) are " +
        "batch-only — a streaming read cannot resolve them")
    // startingGeneration: begin a FRESH stream after the blocks committed
    // at generation N — the Kafka startingOffsets analogue composed with
    // the generation ledger ("resume from my last batch sync point").
    // Resolution and the prefix-soundness check live in the stream's
    // initialOffset(), which only FRESH streams call — a checkpoint
    // resume (whose offset log owns the position) must not re-validate a
    // sync point that a later purge legitimately outdated.
    new TradeLogMicroBatchStream(path, wanted, xtypes,
      Option(options.get("maxBlocksPerTrigger")).map(_.toInt),
      Option(options.get("startingGeneration")).map(_.toLong),
      refName = streamRef)
  }
}

object TradeLogScan {
  /** Sentinel ordinals for the metadata columns in [[TradeLogScan
    * .outCols]]: filled from block metadata, never decoded. */
  val FileCol: Int = -1
  val BoffCol: Int = -2
  val BrowCol: Int = -3
  val ChangeCol: Int = -4
}

/** One read split: a run of blocks within one data file. `changeType`
  * fills the `_change_type` metadata slot ("insert" everywhere except a
  * withChangeTypes diff's delete-rows partitions). */
final case class TradeLogPartition(dir: String, blocks: Seq[BlockMeta],
    changeType: String = "insert") extends InputPartition

final class TradeLogReaderFactory(outCols: Array[Int],
    xtypes: Array[org.apache.spark.sql.types.DataType],
    confBox: HadoopConfBox) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TradeLogPartition]
    new TradeLogPartitionReader(p.dir, p.blocks, outCols, xtypes, confBox,
      p.changeType)
  }
}

/** Streams the partition's blocks: seek to each committed offset, read
  * the framed payload, decode only the wanted ordinals. The filesystem
  * resolves from the DRIVER's conf (shipped in the factory's
  * [[HadoopConfBox]]), so spark.hadoop.* settings apply on executors.
  * Schema evolution: `xtypes` is the table's extra-column tail; a block
  * narrower than every wanted ordinal (old blocks under a new-only
  * projection) emits its row count of all-null rows WITHOUT opening the
  * file — old data pays zero decode for new-column scans. `outCols` may
  * carry [[TradeLogScan.FileCol]] slots for the `_file` metadata column,
  * filled from block metadata at zero decode cost. */
final class TradeLogPartitionReader(dir: String, blocks: Seq[BlockMeta],
    outCols: Array[Int],
    xtypes: Array[org.apache.spark.sql.types.DataType] = Array.empty,
    confBox: HadoopConfBox = HadoopConfBox.active(),
    changeType: String = "insert")
    extends PartitionReader[InternalRow] {
  private val wanted: Array[Int] = outCols.filter(_ >= 0)
  private val hasMeta: Boolean = wanted.length != outCols.length
  private val changeU8 =
    org.apache.spark.unsafe.types.UTF8String.fromString(changeType)
  private val (filesystem, root) = TradeLogFormat.fs(dir, confBox.conf)
  private val blockIt = blocks.iterator
  private var rows: Iterator[InternalRow] = Iterator.empty

  // the current block's file name, encoded ONCE per block (not per row —
  // the decode loop runs millions of times under a COW rewrite)
  private var fileU8: org.apache.spark.unsafe.types.UTF8String = null
  private var fileU8For: String = null
  private def fileNameU8(file: String)
      : org.apache.spark.unsafe.types.UTF8String = {
    if (fileU8For != file) {
      fileU8 = org.apache.spark.unsafe.types.UTF8String.fromString(file)
      fileU8For = file
    }
    fileU8
  }

  /** Wrap decoded data values into the output slot layout, filling the
    * `_file`/`_boff`/`_brow` metadata slots from block metadata;
    * identity (zero-cost) when no metadata was asked. */
  private def mkRow(data: Array[Any], b: BlockMeta, rowIdx: Int)
      : InternalRow =
    if (!hasMeta) new GenericInternalRow(data)
    else {
      val out = new Array[Any](outCols.length)
      var i = 0
      var di = 0
      while (i < outCols.length) {
        outCols(i) match {
          case TradeLogScan.FileCol => out(i) = fileNameU8(b.file)
          case TradeLogScan.BoffCol =>
            out(i) = java.lang.Long.valueOf(b.offset)
          case TradeLogScan.BrowCol =>
            out(i) = java.lang.Integer.valueOf(rowIdx)
          case TradeLogScan.ChangeCol => out(i) = changeU8
          case _ => out(i) = data(di); di += 1
        }
        i += 1
      }
      new GenericInternalRow(out)
    }

  // One open stream per data FILE, not per block: a partition's blocks are
  // grouped by file and sorted by offset, so the run reads as forward
  // seeks on a single stream (an O(blocks)-opens pattern is costly on
  // object stores). Keyed by file name so a mixed-file partition — not
  // produced today — would still read correctly via reopen-on-change.
  private var openFile: String = null
  private var in: org.apache.hadoop.fs.FSDataInputStream = null
  private def streamFor(file: String)
      : org.apache.hadoop.fs.FSDataInputStream = {
    if (openFile != file) {
      if (in != null) in.close()
      in = filesystem.open(new org.apache.hadoop.fs.Path(root, file))
      openFile = file
    }
    in
  }

  private def loadNextBlock(): Boolean = {
    if (!blockIt.hasNext) return false
    val b = blockIt.next()
    // merge-on-read delete vector: masked ordinals are never emitted —
    // the scan-time application that lets a k-row DELETE rewrite zero
    // data files (decoded once per block, tested per ordinal)
    val dv = TradeLogFormat.dvWords(b.dvHex)
    if (wanted.forall(_ >= b.nCols)) {
      // every requested column postdates this block's schema (or the
      // projection is empty — a count-style read): the manifest's row
      // count IS the answer, all values null — no byte of the payload is
      // fetched or decoded (the old-block zero-cost rule for new-column
      // scans; also why a purge-surviving block whose file was GC'd can
      // still serve a new-only projection)
      rows = (0 until b.nRows).iterator
        .filter(i => !TradeLogFormat.dvDeleted(dv, i))
        .map(i => mkRow(new Array[Any](wanted.length), b, i))
      return true
    }
    val payload = new Array[Byte](b.payloadLen)
    val s = streamFor(b.file)
    s.seek(b.offset + 8L) // skip the [nRows][payloadLen] frame header
    s.readFully(payload)
    val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    // decodeBlock allocates a fresh values array per row — safe to wrap.
    // Deleted rows still DECODE (the byte walk is sequential) but are
    // dropped here, pre-materialization — the Delta DV read shape.
    var ri = 0
    TradeLogFormat.decodeBlock(payload, b.nRows, wanted, b.nCols, xtypes) {
      v =>
        if (!TradeLogFormat.dvDeleted(dv, ri)) buf += mkRow(v, b, ri)
        ri += 1
    }
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
  override def close(): Unit = {
    if (in != null) { in.close(); in = null; openFile = null }
  }
}
