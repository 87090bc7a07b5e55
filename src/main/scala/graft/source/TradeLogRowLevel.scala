package graft.source

import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import TradeLogFormat.BlockMeta

/** SQL row-level operations for the tradelog — DELETE / UPDATE / MERGE
  * applied THROUGH the connector with the optimistic-commit semantics
  * (VERDICT r16 #5), split the lakehouse way into two tiers:
  *
  *   - **Metadata-only DELETE** ([[TradeLogDml]], `SupportsDeleteV2`):
  *     a ts-range predicate whose matching blocks are FULLY covered
  *     drops them from the manifest without reading a byte — Spark's
  *     `OptimizeMetadataOnlyDeleteFromTable` turns the row-level plan
  *     back into this fast path whenever `canDeleteWhere` proves it
  *     exact (block span inside the range, zero null-ts rows).
  *
  *   - **Group-based copy-on-write** ([[TradeLogRowLevelOperation]],
  *     `SupportsRowLevelOperations`): everything else — user-targeted
  *     deletes, UPDATE, MERGE INTO. Spark rewrites the command into a
  *     ReplaceData plan over this operation's OWN scan: the scan's
  *     pushed/runtime filters (ts spans, user_id blooms, the
  *     DPP-style `SupportsRuntimeV2Filtering` group filter a MERGE's
  *     source keys drive) select the affected blocks, the engine
  *     recomputes those blocks' surviving/updated/inserted rows, and
  *     the write commits new-files + manifest-replace: the SCANNED
  *     blocks drop, every other block survives untouched, the fresh
  *     blocks append at the sequence tail. Exactly the
  *     Iceberg/Delta COW granularity with the tradelog's block as the
  *     group.
  *
  * Commit semantics: the replace runs under [[TradeLogFormat
  * .commitManifest]]'s optimistic protocol, and the update closure
  * re-verifies ON EVERY RETRY that each replaced block is still present
  * at the head — a concurrent purge/compaction that removed one fails
  * the operation loudly (the Iceberg validation-exception behavior)
  * instead of resurrecting deleted rows. Concurrent APPENDS interleave
  * safely: their blocks are disjoint from the replaced set by
  * construction (writers never touch committed blocks).
  *
  * Stream-offset contract (documented restatement): replaced blocks'
  * seqs vanish and their surviving rows re-enter at tail seqs, so a
  * streaming consumer positioned mid-log re-receives restated rows —
  * the Delta CDF restatement caveat, never data loss.
  *
  * 100 TB shape: the COW cost is O(affected blocks) read+rewrite, with
  * affection bounded by the same two skip tiers every read uses (shard
  * ts spans, block blooms + runtime group filtering); the metadata tier
  * costs no data I/O at all. Nothing is ever driver-materialized — the
  * rewrite is a distributed Spark job through the normal write path. */
final class TradeLogRowLevelOperation(path: String, tableSchema: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** The scan this operation configured — Spark builds exactly one scan
    * per row-level command (the runtime group-filter subquery plans
    * against the ORIGINAL table, not this operation), and the write's
    * commit consults its planned block set. */
  @volatile private var configuredScan: TradeLogScan = null

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TradeLogScanBuilder(path, tableSchema, options,
      onScan = s => configuredScan = s)

  /** `_file` — the group identity. Declaring it is also LOAD-BEARING for
    * the engine contract: Spark's ReplaceData machinery routes rows to
    * the writer through its data projection only when the operation
    * requires metadata attributes (with none, the writer would receive
    * the raw [operation, data…] plan rows). */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("_file"))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        val xcols = TradeLogFormat.requireWriteSchema(info.schema())
        val blockRows = Option(info.options().get("blockRows")).map(_.toInt)
          .getOrElse(TradeLogFormat.DefaultBlockRows)
        new Write {
          override def toBatch: BatchWrite = new TradeLogReplaceDataWrite(
            path, blockRows, xcols, () => {
              val s = configuredScan
              require(s != null,
                "graft-tradelog row-level write committed before its scan " +
                  "was configured")
              // plannedBlocks is null when the ReplaceData query never
              // planned the scan (statically empty side) — nothing read,
              // nothing to replace
              Option(s.plannedBlocks).getOrElse(Seq.empty)
            })
          override def description(): String =
            s"GraftTradeLog $cmd COW write path=$path"
        }
      }
    }

  override def description(): String = s"GraftTradeLog $cmd path=$path"
}

/** The ReplaceData commit: drop exactly the scanned blocks, append the
  * rewritten rows' fresh blocks at the sequence tail, carry everything
  * else forward — re-validated against the head inside every optimistic
  * retry. Writers are the normal distributed tradelog writers. */
final class TradeLogReplaceDataWrite(path: String, blockRows: Int,
    xcols: Seq[org.apache.spark.sql.types.StructField],
    replacedBlocks: () => Seq[BlockMeta]) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new TradeLogWriterFactory(path, blockRows,
      xcols.map(_.dataType).toArray, HadoopConfBox.active())

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fresh = messages.flatMap { case m: TradeLogCommit => m.blocks }
      .sortBy(b => (b.file, b.offset)).toIndexedSeq
    val replaced = replacedBlocks()
    val replacedKeys = replaced.map(b => (b.file, b.offset)).toSet
    if (replaced.isEmpty && fresh.isEmpty) return // nothing read or written
    TradeLogFormat.commitManifest(path) { prevOpt =>
      val prev = prevOpt.getOrElse(throw new IllegalStateException(
        s"graft-tradelog $path lost its manifest during a row-level write"))
      val reuse = scala.collection.mutable.ArrayBuffer.empty[
        TradeLogFormat.ShardRef]
      val rewrite = scala.collection.mutable.ArrayBuffer.empty[Seq[BlockMeta]]
      var seen = 0
      // a block's ts span is contained in its shard's span (ShardRef.of),
      // so only shards intersecting some replaced block's span can hold
      // one — the rest carry forward unresolved (O(touched shards) work)
      def mightHold(r: TradeLogFormat.ShardRef): Boolean =
        replaced.exists(b => b.minTsUs == Long.MinValue ||
          r.intersectsTs(b.minTsUs, b.maxTsUs))
      prev.shards.foreach { r =>
        if (!mightHold(r)) reuse += r
        else {
          val bs = TradeLogFormat.readShardBlocks(path, r)
          val (gone, keep) =
            bs.partition(b => replacedKeys((b.file, b.offset)))
          seen += gone.size
          if (gone.isEmpty) reuse += r
          else if (keep.nonEmpty) rewrite += keep
        }
      }
      // conflict validation (re-runs on every optimistic retry): every
      // scanned block must still be committed — a concurrent rewrite that
      // removed one invalidates this operation's read snapshot
      if (seen != replacedKeys.size) throw new IllegalStateException(
        s"graft-tradelog $path: ${replacedKeys.size - seen} of the blocks " +
          "this row-level operation read were removed by a concurrent " +
          "commit — the operation's snapshot is stale; re-run it")
      Some(TradeLogFormat.CommitSpec(reuse = reuse.toSeq,
        rewrite = rewrite.toSeq, fresh = fresh,
        epoch = prev.epoch, qid = prev.qid,
        xcols = TradeLogFormat.mergeXcols(prev.xcols, xcols)))
    }
    // fully-dereferenced data files are reclaimed by vacuum's journal
    // ADOPTION (a file may keep live blocks inside shards this commit
    // never resolved, so provable delisting would cost O(all shards);
    // adoption is the designed self-healing lane and age-gates the
    // unlink past any in-flight writer)
    TradeLogFormat.vacuum(path)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val (fs, root) = TradeLogFormat.fs(path)
    messages.foreach {
      case m: TradeLogCommit => m.blocks.map(_.file).distinct.foreach(f =>
        fs.delete(new org.apache.hadoop.fs.Path(root, f), false))
      case _ => ()
    }
  }
}

/** V2-predicate vocabulary for the metadata-only DELETE tier: a
  * conjunction of ts comparisons (plus ALWAYS_TRUE / the empty
  * conjunction = delete everything). Anything else — user_id targets,
  * OR trees, non-literal operands — returns None and the command takes
  * the copy-on-write path instead. */
private[source] object TradeLogDml {

  /** Parse predicates to inclusive µs bounds. Returns (lo, hi, all);
    * None = outside the metadata vocabulary. */
  def tsBounds(preds: Array[Predicate]): Option[(Long, Long, Boolean)] = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var sawBound = false
    def leaf(p: Predicate): Boolean = p.name() match {
      case "ALWAYS_TRUE" => true
      case "AND" =>
        // children are Predicates for a real And node; anything else is
        // outside the vocabulary (refuse, never throw — the COW path is
        // the fallback, not an error)
        p.children().length == 2 && p.children().forall {
          case c: Predicate => leaf(c)
          case _ => false
        }
      case op @ ("<" | "<=" | ">" | ">=" | "=") =>
        val cs = p.children()
        if (cs.length != 2) return false
        (tsRef(cs(0)), usLit(cs(1)), tsRef(cs(1)), usLit(cs(0))) match {
          case (true, Some(m), _, _) => bound(op, m); sawBound = true; true
          case (_, _, true, Some(m)) => bound(flip(op), m); sawBound = true
            true
          case _ => false
        }
      case _ => false
    }
    def bound(op: String, m: Long): Unit = op match {
      // strict forms at the Long µs extremes are unsatisfiable — encode
      // the EMPTY range (lo > hi; the triage treats it as an exact no-op)
      // instead of letting ±1 wrap to the other end of time
      case "<"  => if (m == Long.MinValue) { lo = 0L; hi = -1L }
                   else hi = hi.min(m - 1)
      case "<=" => hi = hi.min(m)
      case ">"  => if (m == Long.MaxValue) { lo = 0L; hi = -1L }
                   else lo = lo.max(m + 1)
      case ">=" => lo = lo.max(m)
      case "="  => lo = lo.max(m); hi = hi.min(m)
    }
    def flip(op: String): String = op match {
      case "<" => ">"
      case "<=" => ">="
      case ">" => "<"
      case ">=" => "<="
      case other => other
    }
    if (preds.forall(leaf)) Some((lo, hi, !sawBound)) else None
  }

  private def tsRef(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case n: NamedReference => n.fieldNames.sameElements(Array("ts"))
      case _ => false
    }

  /** Timestamp literals carry epoch µs as their internal Long value. */
  private def usLit(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[Long] = e match {
    case l: Literal[_] if l.dataType == TimestampType =>
      l.value match {
        case v: java.lang.Long => Some(v.longValue())
        case _ => None
      }
    case _ => None
  }

  /** Feasibility gate for `canDeleteWhere`: vocabulary parses AND the
    * triage finds no straddling block (the delete is provably exact at
    * block granularity). A missing manifest (nothing committed) reports
    * infeasible so the COW path — which handles the empty table as a
    * no-op — answers instead. */
  def canMetadataDelete(dir: String, preds: Array[Predicate]): Boolean =
    tsBounds(preds).exists { case (lo, hi, all) =>
      val (fs, root) = TradeLogFormat.fs(dir)
      fs.exists(new org.apache.hadoop.fs.Path(root,
        TradeLogFormat.ManifestName)) &&
        TradeLogFormat.tsDeleteTriage(dir,
          TradeLogFormat.readManifestRefs(dir), lo, hi, all).isDefined
    }

  def metadataDelete(dir: String, preds: Array[Predicate]): Unit = {
    val (lo, hi, all) = tsBounds(preds).getOrElse(
      throw new UnsupportedOperationException(
        "graft-tradelog metadata DELETE supports conjunctions of ts " +
          "bounds only — this predicate set takes the row-level path"))
    TradeLogFormat.deleteWhereTs(dir, lo, hi, all)
    ()
  }
}
