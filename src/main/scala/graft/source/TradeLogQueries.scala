package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{OracleSql, QueryDef, Tables}
import graft.core.QueryDef.OrderedOut

/** Catalog queries for the DataSource V2 tradelog connector
  * ([[TradeLogProvider]]) — each one puts a different leg of the
  * source/sink contract under the driver's DuckDB hash gate by
  * round-tripping the events table THROUGH the custom format and
  * oracling the result against the original parquet:
  *
  *   - `q_tradelog_agg` — DSv2 write (distributed, manifest-committed)
  *     then DSv2 batch read: per-type counts, exact value sums, ts
  *     extremes. Any encode/decode/commit defect breaks the hash.
  *   - `q_tradelog_digest` — row-level: an order-independent md5 digest
  *     over EVERY column (strings, props JSON, µs timestamps), proving
  *     the codec byte-exact, not just aggregate-exact.
  *   - `q_tradelog_prune` — a 2-day time slice + projection: the scan
  *     plans only manifest blocks whose ts span intersects the pushed
  *     bounds and decodes only the pruned columns (TradeLogSpec pins
  *     selected < total and the ReadSchema; the filters stay residual,
  *     so the result is correct regardless — this query's oracle grades
  *     the VALUES, the spec grades the pruning).
  *   - `q_tradelog_streamed` — 28th batch≡streaming bridge, and the
  *     only one through a CUSTOM MicroBatchStream: offset-tracked
  *     rate-limited micro-batches (`maxBlocksPerTrigger` sized to ~3
  *     batches at any sf) drain the committed block sequence under
  *     AvailableNow, complete-mode aggregate, same SQL as the batch
  *     twin — the Kafka-shaped ingest path with no broker available.
  *
  * Build-once artifact (the candle-tier/IVFPQ lifecycle): the log is
  * written on first use under [[Tables.artifactRoot]], fingerprinted by
  * the events file's (length, mtime) + a version tag; the atomic
  * manifest rename is the success marker. Layout: day-bucketed writer
  * partitions, ts-sorted within each (`sortWithinPartitions`), so block
  * ts spans are tight and time-slice skipping actually bites — the
  * time-partitioned log every production event archive keeps.
  *
  * 100 TB shape: the write is one narrow exchange (day hash) + local
  * sort; reads are manifest-planned splits with no driver materialization
  * (the manifest is block METADATA, ~bytes per 1024 rows — at 100 TB a
  * production deployment would shard the manifest per day-partition, the
  * same evolution parquet took with _metadata sidecars).
  */
object TradeLogQueries {

  private val FormatName = "graft-tradelog"

  /** Fingerprinted artifact path (the candleTierPath rule). */
  private def logPath(s: SparkSession, dir: String): String = {
    val src = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val st = src.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getFileStatus(src)
    val dsafe = dir.replaceAll("[^A-Za-z0-9.]", "_")
    // v4: two-level manifests (per-day shard files under _manifests),
    // optimistic commit claims, per-block commit seq / null-ts count /
    // user range — a format-semantics change is a FRESH artifact path by
    // construction (the build-once rule; v3 added generations, v2 blooms)
    s"${Tables.artifactRoot(s)}/graft_tradelog/" +
      s"v4_${dsafe}_${st.getLen}_${st.getModificationTime}"
  }

  /** Build the log once through the DSv2 WRITE path; the committed
    * manifest is the success marker (its rename is atomic, so a torn
    * build cannot present as complete). Returns the artifact path. */
  def ensureLog(s: SparkSession, dir: String): String = {
    val path = logPath(s, dir)
    val (fs, root) = TradeLogFormat.fs(path)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root,
        TradeLogFormat.ManifestName))) {
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        // RANGE partitioning (not day-hash): contiguous time per writer,
        // so blocks straddle only adjacent days and the per-day manifest
        // shards get tight ts spans — what makes shard-level pruning bite
        .repartitionByRange(8, col("ts"))
        .sortWithinPartitions("ts")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256)
        .save(path)
    }
    path
  }

  /** The committed log through the batch read path. */
  def readLog(s: SparkSession, dir: String): DataFrame =
    s.read.format(FormatName).load(ensureLog(s, dir))

  // ---- q_tradelog_agg -------------------------------------------------

  def tradelogAgg(s: SparkSession, dir: String): DataFrame =
    aggByType(readLog(s, dir)).orderedBy("event_type")

  /** Shared by the batch query and the streaming bridge (one body, one
    * claim): per-type count, exact 6dp-lifted value sum (the q_outliers
    * lane), µs ts extremes. */
  private def aggByType(log: DataFrame): DataFrame =
    log.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(round(col("value") * 1000000).cast("long")).as("sum_v6"),
      min(unix_micros(col("ts"))).as("min_ts"),
      max(unix_micros(col("ts"))).as("max_ts"))

  /** The per-type aggregate oracle with an optional WHERE — the
    * incremental-stream bridge grades its post-sync-point slice against
    * the same text. */
  private def aggOracleWhere(where: String) =
    s"""SELECT event_type, count(*) AS n,
       |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_v6,
       |       min(epoch_us(ts)) AS min_ts, max(epoch_us(ts)) AS max_ts
       |FROM events $where GROUP BY event_type ORDER BY event_type""".stripMargin

  private val tradelogAggOracle = aggOracleWhere("")

  // ---- q_tradelog_digest ----------------------------------------------

  /** Row-level round-trip proof: every column folds into an
    * order-independent content digest per event_type (the q_unpivot
    * hi/lo-lane discipline — sums of 16-bit md5 prefix lanes recombine
    * exactly at any corpus size). `value` canonicalizes through its 2dp
    * stored precision; ts through epoch µs — no cross-engine
    * double-to-string in the hashed text. */
  def tradelogDigest(s: SparkSession, dir: String): DataFrame =
    digestOver(readLog(s, dir))

  /** The digest body, shared with [[tradelogCompact]] (one expression
    * tree, one claim — both logs must reproduce the same oracle hash). */
  private def digestOver(log: DataFrame): DataFrame = {
    val repr = concat_ws("#",
      col("event_id"), unix_micros(col("ts")), col("user_id"),
      col("event_type"), round(col("value") * 100).cast("long"),
      col("props"))
    val h32 = conv(substring(md5(repr.cast("binary")), 1, 8), 16, 10)
      .cast("long")
    log.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(shiftright(h32, 16)).as("hi"),
        sum(h32.bitwiseAND(lit(0xffffL))).as("lo"))
      .select(col("event_type"), col("n"),
        (col("hi").cast("decimal(38,0)") * lit(65536) + col("lo"))
          .cast("string").as("digest"))
      .orderedBy("event_type")
  }

  private val tradelogDigestOracle: String = digestOracleWhere("")

  /** The digest oracle with an optional WHERE — the purge query grades
    * the retained slice against the same text. */
  private def digestOracleWhere(where: String): String =
    digestOracleExpr("value", where)

  /** Digest oracle with a substituted VALUE expression — the UPDATE
    * query grades the post-assignment table by recomputing the
    * assignment declaratively (CASE over the same predicate). */
  private def digestOracleExpr(valueExpr: String, where: String): String = {
    val hv = OracleSql.hexPrefixToLong("h8")
    s"""WITH r AS (
       |  SELECT event_type,
       |         CAST(event_id AS VARCHAR) || '#' ||
       |         CAST(epoch_us(ts) AS VARCHAR) || '#' ||
       |         CAST(user_id AS VARCHAR) || '#' ||
       |         event_type || '#' ||
       |         CAST(CAST(round(($valueExpr) * 100) AS BIGINT) AS VARCHAR) || '#' ||
       |         props AS repr
       |  FROM events $where),
       |h AS (SELECT event_type, substr(md5(repr), 1, 8) AS h8 FROM r),
       |l AS (SELECT event_type, $hv AS hv FROM h)
       |SELECT event_type, count(*) AS n,
       |       CAST(CAST(sum(hv // 65536) AS DECIMAL(38,0)) * 65536
       |            + CAST(sum(hv % 65536) AS DECIMAL(38,0)) AS VARCHAR) AS digest
       |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  // ---- q_tradelog_prune -----------------------------------------------

  private val SliceLo = "2024-01-10 00:00:00"
  private val SliceHi = "2024-01-12 00:00:00"

  /** Time-slice + projection over the log: per-user activity in a 2-day
    * window. The scan receives the ts bounds (block skip) and the 3-col
    * ReadSchema (decode skip); Spark re-applies the filters exactly. */
  def tradelogPrune(s: SparkSession, dir: String): DataFrame =
    pruneSlice(readLog(s, dir))
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 1000000).cast("long")).as("sum_v6"))
      .orderedBy("user_id")

  /** The filtered/projected frame (split out so TradeLogSpec can pin the
    * planned scan's block selection and read schema on exactly the frame
    * the catalog query aggregates). */
  def pruneSlice(log: DataFrame): DataFrame =
    log.filter(col("ts") >= lit(SliceLo).cast("timestamp") &&
        col("ts") < lit(SliceHi).cast("timestamp"))
      .select(col("user_id"), col("value"), col("ts"))

  private val tradelogPruneOracle =
    s"""SELECT user_id, count(*) AS n,
       |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_v6
       |FROM events
       |WHERE ts >= TIMESTAMP '$SliceLo' AND ts < TIMESTAMP '$SliceHi'
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- q_tradelog_append ----------------------------------------------

  /** Batch SaveMode.Append under the hash gate: the log is built in TWO
    * writes — an overwrite with the even event_ids, then an APPEND with
    * the odd ones — and the row-level digest over the result must equal
    * the whole-table oracle, proving append JOINS the committed block
    * set (a manifest replace would halve the digest). Build-once
    * fingerprinted artifact like [[ensureLog]]. */
  def tradelogAppend(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensureAppendLog(s, dir)))

  /** Two-commit artifacts gate on "head generation == 2", not bare
    * manifest existence: the first commit already publishes a manifest,
    * so a crash between the two would otherwise freeze a half-built
    * artifact that every later run silently accepts (r16 advice). A
    * partial build is wiped and rebuilt. */
  private def ensureTwoGen(s: SparkSession, path: String)(
      build: String => Unit): String = {
    val (fs, root) = TradeLogFormat.fs(path)
    val head = new org.apache.hadoop.fs.Path(root, TradeLogFormat.ManifestName)
    val done = fs.exists(head) && TradeLogFormat.readManifestHeader(path).gen == 2
    if (!done) {
      if (fs.exists(root)) fs.delete(root, true)
      build(path)
      require(TradeLogFormat.readManifestHeader(path).gen == 2,
        s"two-commit artifact build left $path at an unexpected generation")
    }
    path
  }

  def ensureAppendLog(s: SparkSession, dir: String): String =
    ensureTwoGen(s, s"${logPath(s, dir)}-append") { path =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      ev.filter(col("event_id") % 2 === 0)
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path)
      ev.filter(col("event_id") % 2 === 1)
        .write.format(FormatName).mode("append")
        .option("blockRows", 256).save(path)
    }

  // ---- q_tradelog_pushdown --------------------------------------------

  /** Complete DSv2 aggregate pushdown: unfiltered count/min-ts/max-ts over
    * the log are answered from the manifest's block metadata alone — the
    * plan's scan is [[TradeLogAggScan]] (TradeLogSpec pins it, and proves
    * the no-data-read claim by deleting every data file and re-running).
    * Output leaves as epoch µs so no timestamp crosses engines. */
  def tradelogPushdown(s: SparkSession, dir: String): DataFrame =
    readLog(s, dir)
      .agg(count(lit(1)).as("n"), min(col("ts")).as("mn"),
        max(col("ts")).as("mx"))
      .select(col("n"), unix_micros(col("mn")).as("min_ts"),
        unix_micros(col("mx")).as("max_ts"))

  private val tradelogPushdownOracle =
    """SELECT count(*) AS n, epoch_us(min(ts)) AS min_ts,
      |       epoch_us(max(ts)) AS max_ts FROM events""".stripMargin

  // ---- q_tradelog_sink_streamed (29th bridge: the STREAMING SINK) -----

  /** The custom STREAMING sink under the batch oracle — the Kafka-sink
    * analogue (reference `main.py:208-217`) with the manifest as the
    * transaction log: events stream in 4 rate-limited micro-batches
    * (maxFilesPerTrigger=1 over the staged 3-file layout) through
    * `writeStream.format("graft-tradelog")`, each epoch appending its
    * blocks to the manifest in one atomic rename; the committed log is
    * then read back through the batch scan and must hash-match the SAME
    * aggregate oracle as the other tradelog queries. TradeLogSpec pins
    * the epoch stamp advanced past batch 0, ≥2 data files landed, and
    * that a replayed epoch commit is dropped (exactly-once). */
  def tradelogSinkStreamed(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    // build-once staged layout (r20 opt, Tables.stageOnce rationale);
    // only the SINK dir below must stay fresh per run
    val stage = Tables.stageOnce(s, "tlog_sink_src3", dir, "events") { p =>
      ev.repartition(3).write.mode("overwrite").parquet(p)
    }
    // fresh sink dir per run: the epoch guard would (correctly) treat a
    // rerun from a fresh checkpoint as a replay of epoch 0 and drop it
    val sinkDir = Tables.stageDir(s,
      s"tlog_sink_out_${java.util.UUID.randomUUID().toString.take(8)}")
    val cs = s.newSession()
    cs.conf.set("spark.sql.shuffle.partitions", "8")
    val q = cs.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .writeStream.format(FormatName)
      .option("checkpointLocation", s"$sinkDir/_ckpt")
      .option("blockRows", 256)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$sinkDir/log")
    q.awaitTermination()
    val out = aggByType(s.read.format(FormatName).load(s"$sinkDir/log"))
      .orderedBy("event_type").localCheckpoint(true)
    val (fs, root) = TradeLogFormat.fs(sinkDir)
    fs.delete(root, true)
    out
  }

  // ---- q_tradelog_streamed (28th bridge) ------------------------------

  /** The custom MicroBatchStream under the batch oracle: the committed
    * block sequence drains in ~3 rate-limited micro-batches (per-sf
    * sizing from the manifest — a fixed trigger size would collapse to
    * one batch at sf0.001 or hundreds at sf0.1), complete-mode
    * aggregation, memory sink, hash-compared against the IDENTICAL SQL
    * as q_tradelog_agg. TradeLogSpec separately pins that >1 micro-batch
    * actually ran and that offsets advanced monotonically. */
  def tradelogStreamed(s: SparkSession, dir: String): DataFrame = {
    val path = ensureLog(s, dir)
    val perTrigger = streamTriggerBlocks(path)
    Tables.runStreamComplete(s, "tradelog_streamed_") { cs =>
      aggByType(cs.readStream.format(FormatName)
        .option("maxBlocksPerTrigger", perTrigger).load(path))
    }.orderedBy("event_type")
  }

  /** ~3 micro-batches at any scale (block count from shard refs alone —
    * O(#shards), no block CSV parse). */
  def streamTriggerBlocks(path: String): Int =
    math.max(1, (TradeLogFormat.countBlocks(path) + 2) / 3)

  // ---- q_tradelog_branch_streamed (45th bridge: the WAP validation stream)

  /** The ref STREAM under the whole-table oracle (r19 verdict #5 — the
    * WAP validation consumer): [[TradeLogMicroBatchStream]] pinned to
    * the `audit` branch head (`option("ref", ...)` on `readStream`)
    * drains base + staged blocks in rate-limited micro-batches; the
    * complete-mode per-type aggregate must equal the whole-table SQL —
    * a streaming audit of staged-plus-base content ≡ the published
    * state, which is exactly what lets a WAP pipeline validate a branch
    * with a streaming consumer BEFORE publish. TradeLogRefsSpec pins
    * the publish interplay: a checkpoint that drained the branch sees
    * the fast-forward as ZERO new blocks (adoption is by reference,
    * seqs unchanged), and post-publish staged commits resume the same
    * checkpoint incrementally. */
  def tradelogBranchStreamed(s: SparkSession, dir: String): DataFrame = {
    val path = ensureBranchLog(s, dir)
    val perTrigger = streamTriggerBlocks(path)
    Tables.runStreamComplete(s, "tradelog_branch_") { cs =>
      aggByType(cs.readStream.format(FormatName)
        .option("ref", "audit")
        .option("maxBlocksPerTrigger", perTrigger).load(path))
    }.orderedBy("event_type")
  }

  // ---- q_tradelog_point -----------------------------------------------

  private val PointUser = 7L // exists at every sf (user_id domain starts at 0)

  /** Point lookup — the needle-in-haystack shape the per-block user_id
    * bloom exists for: one user's full event timeline. The pushed
    * EqualTo(user_id) drops every block whose bloom provably misses the
    * id; Spark re-applies the filter, so false-positive blocks (~3% at a
    * full block) cost only decode, never correctness. How much skips is
    * a LAYOUT property, like ts-locality: the tiny-sf artifacts pack all
    * ~15 users into every block (nothing can skip, oracle still exact),
    * while TradeLogSpec pins ≥75% skipped on a user-clustered log — the
    * sorted/bucketed-by-user layout a production 100 TB archive keeps
    * precisely so point reads touch only a user's own blocks. */
  def tradelogPoint(s: SparkSession, dir: String): DataFrame =
    pointSlice(readLog(s, dir))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderedBy("event_id")

  /** The filtered frame (split out for TradeLogSpec's skip pin). */
  def pointSlice(log: DataFrame): DataFrame =
    log.filter(col("user_id") === PointUser)

  private val tradelogPointOracle =
    s"""SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
       |FROM events WHERE user_id = $PointUser ORDER BY event_id""".stripMargin

  // ---- q_tradelog_semi (runtime join filtering) -----------------------

  /** Join-driven RUNTIME block skipping (`SupportsRuntimeV2Filtering` —
    * dynamic partition pruning re-expressed over block metadata): the
    * log joins a small filtered dim (customers of one nation, broadcast),
    * and at execution time Spark hands the build side's user_id set to
    * the scan, whose bloom index drops non-matching blocks BEFORE
    * planning partitions — the scan never knew the ids at plan time.
    * TradeLogSpec pins the mechanism directly (scan.filter shrinks
    * effectiveBlocks) and that the e2e plan carries the runtime-filter
    * subquery; this oracle grades the joined VALUES. */
  def tradelogSemi(s: SparkSession, dir: String): DataFrame = {
    val log = readLog(s, dir)
    val dim = Tables.customer(s, dir)
      .filter(col("c_nationkey") === 19)
      .select(col("c_custkey"))
    log.join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 1000000).cast("long")).as("sum_v6"))
      .orderedBy("user_id")
  }

  private val tradelogSemiOracle =
    """SELECT user_id, count(*) AS n,
      |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_v6
      |FROM events JOIN customer ON user_id = c_custkey
      |WHERE c_nationkey = 19
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- q_ohlc_tradelog (30th bridge: the reference dataflow, custom source)

  /** The reference's PRODUCTION dataflow end-to-end through the custom
    * connector — the closest this sandbox gets to `main.py`'s
    * Kafka→parse→1-minute-OHLC pipeline (`main.py:77-188`): trades stream
    * out of the tradelog via [[TradeLogMicroBatchStream]] in rate-limited
    * micro-batches, the candle aggregation (custom ordered first/last
    * open/close, exact-decimal volume) folds per-window state across
    * those batches under the StateStore, and the result must hash-match
    * `q_ohlc_1m`'s OWN oracle over the original parquet — custom source,
    * codec, offsets, AND the OHLC engine adjudicated by one gate. */
  def ohlcTradelogStreamed(s: SparkSession, dir: String): DataFrame = {
    val path = ensureLog(s, dir)
    val perTrigger = streamTriggerBlocks(path)
    Tables.runStreamComplete(s, "ohlc_tlog_") { cs =>
      val trades = cs.readStream.format(FormatName)
        .option("maxBlocksPerTrigger", perTrigger).load(path)
      graft.ohlc.OhlcPipeline.candles(
          trades.withColumn("qty_dec", col("value").cast("decimal(20,6)")),
          windowDuration = "1 minute", tsCol = "ts", priceCol = "value",
          qtyCol = "qty_dec", symbolCol = "event_type")
        .select(unix_timestamp(col("start_ts")).as("ws"), col("base"),
          col("open"), col("high"), col("low"), col("close"),
          col("volume").cast("double").as("volume"))
    }.orderedBy("ws", "base")
  }

  // ---- q_tradelog_compact ---------------------------------------------

  /** Log COMPACTION — the OPTIMIZE maintenance op every block format
    * needs once streaming-sink epochs have accumulated small blocks: the
    * committed log rewrites THROUGH the DSv2 write path into 8× larger
    * ts-sorted blocks under a fresh fingerprinted artifact (the
    * build-once rule — source artifact (len, mtime) keys the path), and
    * the atomic manifest publish is the swap. The row-level digest over
    * the COMPACTED log must equal `q_tradelog_digest`'s oracle over the
    * original parquet — compaction preserved every byte of every column —
    * and TradeLogSpec pins the mechanical claim (strictly fewer blocks,
    * fewer files). 100 TB shape: compaction is one narrow day-keyed
    * exchange + local sort, same as the build; at scale it runs
    * per-day-partition, not whole-log. */
  def tradelogCompact(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensureCompacted(s, dir)))

  /** Build-once compacted twin of [[ensureLog]]'s artifact. */
  def ensureCompacted(s: SparkSession, dir: String): String = {
    val src = ensureLog(s, dir)
    val path = s"$src-compacted"
    val (fs, root) = TradeLogFormat.fs(path)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root,
        TradeLogFormat.ManifestName))) {
      s.read.format(FormatName).load(src)
        .repartitionByRange(4, col("ts"))
        .sortWithinPartitions("ts")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 2048)
        .save(path)
    }
    path
  }

  // ---- q_tradelog_purge -------------------------------------------------

  private val PurgeCutoff = "2024-01-15 00:00:00"

  /** RETENTION purge under the digest gate — the time-based DELETE every
    * event archive runs: a copy of the log drops (metadata-only) every
    * block fully below the cutoff and GCs fully-expired files
    * ([[TradeLogFormat.purgeBefore]]); the reader enforces the boundary
    * with the ts predicate (which the same spans turn into block skips),
    * and the row-level digest over the result must equal the oracle over
    * `events WHERE ts >= cutoff` — purge dropped EXACTLY the expired
    * rows' blocks and nothing the boundary still needs. TradeLogSpec
    * pins the mechanics: blocks dropped, fully-expired files unlinked,
    * straddling and unknown-span blocks conservatively kept, the
    * streaming stamp preserved. */
  def tradelogPurge(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensurePurged(s, dir))
      .filter(col("ts") >= lit(PurgeCutoff).cast("timestamp")))

  /** Build-once purged twin of [[ensureLog]]'s artifact. The done marker
    * is a dedicated `_PURGED` file written AFTER purgeBefore — the
    * manifest alone cannot gate this build, because the copy's save()
    * publishes a manifest BEFORE the purge runs, and a crash in between
    * would otherwise freeze an unpurged log that still passes the
    * boundary digest forever (review finding r14: the build-once
    * "_SUCCESS last" rule applies to the WHOLE build). */
  def ensurePurged(s: SparkSession, dir: String): String = {
    val src = ensureLog(s, dir)
    val path = s"$src-purged"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_PURGED")
    if (!fs.exists(done)) {
      s.read.format(FormatName).load(src)
        .repartitionByRange(8, col("ts"))
        .sortWithinPartitions("ts")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256)
        .save(path)
      TradeLogFormat.purgeBefore(path,
        java.sql.Timestamp.valueOf(PurgeCutoff).getTime * 1000L)
      fs.create(done, true).close()
    }
    path
  }

  // ---- q_tradelog_asof (TIME TRAVEL) ------------------------------------

  /** Read-at-version — the Iceberg/Delta snapshot-read verb: the append
    * log ([[ensureAppendLog]]: generation 1 = the even event_ids,
    * generation 2 = the odd append) read with
    * `option("atGeneration", 1)`, whose row-level digest must equal the
    * oracle over ONLY the even half — the pinned snapshot serves the
    * pre-append state exactly while the head manifest already contains
    * everything (q_tradelog_append grades the head read of the SAME
    * artifact against the whole-table digest, so the pair proves both
    * states coexist). Every manifest publish pins its content under
    * `_manifests/gen-N.manifest` BEFORE replacing the head, so any
    * committed state is addressable; data-file availability bounds the
    * horizon via the delist-journal grace (old generations whose files a
    * purge+vacuum GC'd are metadata-only). TradeLogSpec pins the
    * mechanics: pinned plans survive concurrent appends, asOfEpoch
    * resolves streaming-sink epoch stamps, aggregate pushdown declines
    * pinned reads. 100 TB shape: a snapshot is block metadata (~bytes
    * per 1024 rows), so time travel costs one small manifest read — no
    * data is copied, the Delta/Iceberg property. */
  def tradelogAsof(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName)
      .option("atGeneration", 1)
      .load(ensureAppendLog(s, dir)))

  // ---- q_tradelog_changes (INCREMENTAL CONSUMPTION / CDF) ----------------

  /** Changes-since read — the incremental-ETL verb (Delta CDF / Iceberg
    * incremental scan re-expressed for an append log): the append
    * artifact read with `option("changesSinceGeneration", 1)` plans ONLY
    * the blocks committed after generation 1 — the odd-half append — and
    * its row digest must equal the oracle over exactly that slice. With
    * q_tradelog_asof (the even half, at-generation) and
    * q_tradelog_append (the whole log, head read) grading the SAME
    * artifact, the three queries prove snapshot + delta + head are
    * mutually consistent partitions of one committed history. 100 TB
    * shape: the consumer's sync point is a generation number, the delta
    * plan is a block-metadata set difference — no data is diffed, the
    * "what's new since my checkpoint" read every downstream sync job
    * runs. */
  def tradelogChanges(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName)
      .option("changesSinceGeneration", 1)
      .load(ensureAppendLog(s, dir)))

  // ---- q_tradelog_incr_streamed (41st bridge: stream FROM a sync point) --

  /** The incremental CONSUMER as a stream (41st bridge — Kafka's
    * startingOffsets composed with the generation ledger): a fresh
    * streaming query over the append artifact starts AFTER generation
    * 1's blocks (`startingGeneration`), drains only the odd-half append
    * in rate-limited micro-batches, and its complete-mode per-type
    * aggregate must hash-match the batch SQL over exactly that slice —
    * the "catch up from my last batch sync point, then keep streaming"
    * shape every lakehouse-to-stream handoff runs. The option positions
    * only FRESH streams (the checkpoint offset log owns resumes) and
    * fails loudly if a purge broke the prefix property (spec-pinned). */
  def tradelogIncrStreamed(s: SparkSession, dir: String): DataFrame = {
    val path = ensureAppendLog(s, dir)
    val perTrigger = streamTriggerBlocks(path)
    Tables.runStreamComplete(s, "tradelog_incr_") { cs =>
      aggByType(cs.readStream.format(FormatName)
        .option("startingGeneration", 1)
        .option("maxBlocksPerTrigger", perTrigger).load(path))
    }.orderedBy("event_type")
  }

  // ---- q_tradelog_evolve (SCHEMA EVOLUTION) ------------------------------

  /** Widened-schema round-trip — the production "logs grow columns" verb:
    * the log is written in two generations, the even event_ids with the
    * BASE 6-column schema and the odd ones through a WIDENING append
    * carrying three extra columns (xseq long, xtag string — null on every
    * user_id % 3 = 0 row to exercise the tail's null mask — and xval
    * double). The read-back union schema null-fills the extras on old
    * blocks (per-block nCols is the ledger; no rewrite of old data), and
    * a row-level digest over EVERY column, extras null-canonicalized,
    * must equal the oracle that recomputes the mixed-generation table
    * from events.parquet. TradeLogSpec pins the mechanics: old blocks
    * keep nCols=6, conflicting evolutions are rejected, and a new-only
    * projection over old blocks decodes NOTHING (the reader answers from
    * the manifest row count alone). 100 TB shape: widening is an O(1)
    * manifest-header change — the mergeSchema/ADD COLUMN property every
    * lakehouse format keeps. */
  def tradelogEvolve(s: SparkSession, dir: String): DataFrame = {
    val log = s.read.format(FormatName).load(ensureEvolveLog(s, dir))
    val repr = concat_ws("#",
      col("event_id"), unix_micros(col("ts")), col("user_id"),
      col("event_type"), round(col("value") * 100).cast("long"),
      col("props"),
      coalesce(col("xseq").cast("string"), lit("null")),
      coalesce(col("xtag"), lit("null")),
      coalesce(round(col("xval") * 100).cast("long").cast("string"),
        lit("null")))
    val h32 = conv(substring(md5(repr.cast("binary")), 1, 8), 16, 10)
      .cast("long")
    log.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(shiftright(h32, 16)).as("hi"),
        sum(h32.bitwiseAND(lit(0xffffL))).as("lo"))
      .select(col("event_type"), col("n"),
        (col("hi").cast("decimal(38,0)") * lit(65536) + col("lo"))
          .cast("string").as("digest"))
      .orderedBy("event_type")
  }

  /** Build-once mixed-generation artifact: base-schema evens, then a
    * widening append of the odds (gen==2 completion guard — see
    * [[ensureTwoGen]]). */
  def ensureEvolveLog(s: SparkSession, dir: String): String =
    ensureTwoGen(s, s"${logPath(s, dir)}-evolve") { path =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      ev.filter(col("event_id") % 2 === 0)
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path)
      ev.filter(col("event_id") % 2 === 1)
        .withColumn("xseq", col("event_id") * 10)
        .withColumn("xtag",
          when(pmod(col("user_id"), lit(3)) =!= 0, upper(col("event_type"))))
        .withColumn("xval", col("value"))
        .write.format(FormatName).mode("append")
        .option("blockRows", 256).save(path)
    }

  /** The evolve oracle recomputes the mixed-generation table from the
    * parquet: odd event_ids carry the extras, even ones null-fill —
    * byte-for-byte the text the Spark digest hashes. */
  private val tradelogEvolveOracle: String = {
    val hv = OracleSql.hexPrefixToLong("h8")
    """WITH r AS (
      |  SELECT event_type,
      |         CAST(event_id AS VARCHAR) || '#' ||
      |         CAST(epoch_us(ts) AS VARCHAR) || '#' ||
      |         CAST(user_id AS VARCHAR) || '#' ||
      |         event_type || '#' ||
      |         CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) || '#' ||
      |         props || '#' ||
      |         COALESCE(CAST(CASE WHEN event_id % 2 = 1
      |                       THEN event_id * 10 END AS VARCHAR), 'null') || '#' ||
      |         COALESCE(CASE WHEN event_id % 2 = 1 AND user_id % 3 <> 0
      |                       THEN upper(event_type) END, 'null') || '#' ||
      |         COALESCE(CAST(CASE WHEN event_id % 2 = 1
      |                       THEN CAST(round(value * 100) AS BIGINT)
      |                  END AS VARCHAR), 'null') AS repr
      |  FROM events),
      |h AS (SELECT event_type, substr(md5(repr), 1, 8) AS h8 FROM r),
      |l AS (SELECT event_type, HV AS hv FROM h)
      |SELECT event_type, count(*) AS n,
      |       CAST(CAST(sum(hv // 65536) AS DECIMAL(38,0)) * 65536
      |            + CAST(sum(hv % 65536) AS DECIMAL(38,0)) AS VARCHAR) AS digest
      |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin
      .replace("HV", hv)
  }

  // ---- q_tradelog_delete_sql (SQL ROW-LEVEL DELETE) -----------------------

  private val DelCutoff = "2024-01-08 00:00:00"
  private val DelUser = 11L // exists at every sf (user_id domain starts at 0)

  /** SQL `DELETE FROM` THROUGH the connector (TradeLogRowLevel.scala) —
    * both tiers in one artifact: a ts-range delete (straddling blocks →
    * the copy-on-write lane, group-filtered to matching `_file`s) and a
    * user-targeted delete (COW over bloom-hit groups). The survivors'
    * row-level digest must equal the oracle over `events` minus exactly
    * the deleted predicate sets — byte-exact row-level deletion with
    * optimistic-commit semantics, the Iceberg/Delta DML verb. The DML
    * runs once per artifact (done-marker gated); TradeLogDmlSpec pins
    * the mechanics (metadata vs COW tiering, group narrowing, conflict
    * validation). */
  def tradelogDeleteSql(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensureDeleteSqlLog(s, dir)))

  /** Build-once artifact: copy of the log, then the two SQL DELETEs
    * through the path catalog; `_DML_DONE` written last (the whole-build
    * success-marker rule). */
  def ensureDeleteSqlLog(s: SparkSession, dir: String): String = {
    val path = s"${logPath(s, dir)}-delsql"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_DML_DONE")
    if (!fs.exists(done)) {
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartitionByRange(8, col("ts"))
        .sortWithinPartitions("ts")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path)
      val cs = s.newSession()
      cs.conf.set("spark.sql.catalog.graft_tlog",
        classOf[TradeLogCatalog].getName)
      cs.sql(s"DELETE FROM graft_tlog.`$path` " +
        s"WHERE ts < TIMESTAMP '$DelCutoff'")
      cs.sql(s"DELETE FROM graft_tlog.`$path` WHERE user_id = $DelUser")
      fs.create(done, true).close()
    }
    path
  }

  private val tradelogDeleteSqlOracle: String = digestOracleWhere(
    s"""WHERE (ts >= TIMESTAMP '$DelCutoff' OR ts IS NULL)
       |  AND (user_id <> $DelUser OR user_id IS NULL)""".stripMargin)

  // ---- q_tradelog_version_sql (SQL TIME TRAVEL) ---------------------------

  /** `SELECT … FROM t VERSION AS OF 1` through the path catalog — the SQL
    * face of q_tradelog_asof's read option, resolved by the catalog's
    * versioned `loadTable` to the same generation pin: over the append
    * artifact (gen 1 = the even event_ids, gen 2 = the odd append) the
    * pinned SELECT's digest must equal the even-half oracle while the
    * head already holds everything. TradeLogDmlSpec pins the mechanics:
    * a version above head refused, TIMESTAMP AS OF resolving by snapshot
    * publish time (the Delta commit-time rule), pre-publish timestamps
    * failing loudly. */
  def tradelogVersionSql(s: SparkSession, dir: String): DataFrame = {
    val path = ensureAppendLog(s, dir)
    val cs = s.newSession()
    cs.conf.set("spark.sql.catalog.graft_tlog",
      classOf[TradeLogCatalog].getName)
    digestOver(cs.sql(s"SELECT * FROM graft_tlog.`$path` VERSION AS OF 1"))
  }

  // ---- q_tradelog_update_sql (SQL UPDATE) ---------------------------------

  private val UpdUsers = "3, 11, 19" // present at every sf

  /** SQL `UPDATE` THROUGH the connector — the third row-level verb under
    * the hash gate: `SET value = value * 2` for three point users, run by
    * the group-based copy-on-write rewrite over a USER-CLUSTERED log
    * (range-partitioned, sorted by user_id), so the per-block user range
    * + bloom narrow the rewrite to the few groups holding those users.
    * The survivors' digest must equal the oracle that recomputes the
    * assignment declaratively (CASE over the same predicate) — value*2
    * is a single exact IEEE op, the digest's 2dp canonicalization is the
    * established cross-engine discipline. The DML runs once at artifact
    * build (marker-gated: UPDATE is not content-idempotent, unlike the
    * delete/merge artifacts). */
  def tradelogUpdateSql(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensureUpdateSqlLog(s, dir)))

  def ensureUpdateSqlLog(s: SparkSession, dir: String): String = {
    val path = s"${logPath(s, dir)}-updsql"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_DML_DONE")
    if (!fs.exists(done)) {
      // a crash between save and marker rebuilds from the overwrite
      // (truncate-first), so a half-applied UPDATE can never freeze in
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartitionByRange(8, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path)
      val cs = s.newSession()
      cs.conf.set("spark.sql.catalog.graft_tlog",
        classOf[TradeLogCatalog].getName)
      cs.sql(s"UPDATE graft_tlog.`$path` SET value = value * 2 " +
        s"WHERE user_id IN ($UpdUsers)")
      fs.create(done, true).close()
    }
    path
  }

  private val tradelogUpdateSqlOracle: String = digestOracleExpr(
    s"CASE WHEN user_id IN ($UpdUsers) THEN value * 2 ELSE value END", "")

  // ---- q_tradelog_merge_sql (SQL MERGE INTO) ------------------------------

  /** SQL `MERGE INTO` THROUGH the connector — the full CDC verb set
    * (matched-delete / matched-update / not-matched-insert) applied to a
    * tradelog snapshot table by Spark's group-based copy-on-write
    * rewrite, with the manifest replace as the transaction. Target: the
    * latest full row per user of the `event_id % 5 < 3` slice; source:
    * the latest change per user of the complement with q_cdc_apply's op
    * rule (`event_id % 7 = 0` → D). The merged table read back through
    * the connector must match the SAME snapshot⊕changes relational
    * fold q_cdc_apply's oracle adjudicates — MERGE and the declarative
    * CDC apply are two engines for one semantic, and the oracle holds
    * both. Re-merging the same source is a no-op (TradeLogDmlSpec). */
  def tradelogMergeSql(s: SparkSession, dir: String): DataFrame =
    s.read.format(FormatName).load(ensureMergeSqlLog(s, dir))
      .select(col("user_id"), col("value"))
      .orderedBy("user_id")

  def ensureMergeSqlLog(s: SparkSession, dir: String): String = {
    val path = s"${logPath(s, dir)}-mergesql"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_DML_DONE")
    if (!fs.exists(done)) {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      ev.filter(pmod(col("event_id"), lit(5)) < 3)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn")
        .repartitionByRange(4, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 64).save(path)
      val cs = s.newSession()
      cs.conf.set("spark.sql.catalog.graft_tlog",
        classOf[TradeLogCatalog].getName)
      Tables.events(cs, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .filter(pmod(col("event_id"), lit(5)) >= 3)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn")
        .withColumn("op",
          when(pmod(col("event_id"), lit(7)) === 0, lit("D")).otherwise("U"))
        .createOrReplaceTempView("graft_tlog_chg")
      cs.sql(
        s"""MERGE INTO graft_tlog.`$path` t USING graft_tlog_chg c
           |ON t.user_id = c.user_id
           |WHEN MATCHED AND c.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET value = c.value
           |WHEN NOT MATCHED AND c.op <> 'D' THEN INSERT
           |  (event_id, ts, user_id, event_type, value, props)
           |  VALUES (c.event_id, c.ts, c.user_id, c.event_type, c.value,
           |          c.props)""".stripMargin)
      fs.create(done, true).close()
    }
    path
  }

  // ---- q_tradelog_delete_mor (MERGE-ON-READ DELETE) -----------------------

  private val MorUser = 11L
  private val MorMod = 3L // event_id % 10 = 3 → ~10% of rows, every block

  /** SQL `DELETE FROM` on a `delmode=mor` table — the merge-on-read tier
    * (VERDICT r17 #2): both deletes route through the `SupportsDelta`
    * lane ([[TradeLogDeltaDeleteOperation]]), folding row ids into
    * per-block DELETE VECTORS; ZERO data files are rewritten (spec-pinned
    * — the .gtl set is byte-identical before and after) and readers mask
    * at scan time. The user-targeted delete narrows its scan by bloom;
    * the modulo delete scatters DVs across every block — the worst case
    * COW would amplify into a full-log rewrite and MoR commits as pure
    * metadata. Survivors' digest equals the oracle over events minus both
    * predicate sets — the same gate as the COW twin
    * (q_tradelog_delete_sql), two engines for one DELETE semantic. */
  def tradelogDeleteMor(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensureMorLog(s, dir)))

  /** Build-once MoR artifact: ts-sorted copy → delmode=mor → two SQL
    * DELETEs; `_DML_DONE` last (the whole-build marker rule). */
  def ensureMorLog(s: SparkSession, dir: String): String =
    buildMorDeleted(s, dir, "-mor")

  private def buildMorDeleted(s: SparkSession, dir: String,
      suffix: String): String = {
    val path = s"${logPath(s, dir)}$suffix"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_DML_DONE")
    if (!fs.exists(done)) {
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartitionByRange(8, col("ts"))
        .sortWithinPartitions("ts")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path)
      TradeLogFormat.setDeleteMode(path, "mor")
      val cs = s.newSession()
      cs.conf.set("spark.sql.catalog.graft_tlog",
        classOf[TradeLogCatalog].getName)
      cs.sql(s"DELETE FROM graft_tlog.`$path` WHERE user_id = $MorUser")
      cs.sql(s"DELETE FROM graft_tlog.`$path` " +
        s"WHERE event_id % 10 = $MorMod")
      fs.create(done, true).close()
    }
    path
  }

  private val tradelogDeleteMorOracle: String = digestOracleWhere(
    s"""WHERE (user_id <> $MorUser OR user_id IS NULL)
       |  AND (event_id % 10 <> $MorMod OR event_id IS NULL)""".stripMargin)

  // ---- q_tradelog_update_mor (MERGE-ON-READ UPDATE) ------------------------

  /** SQL `UPDATE` on a `delmode=mor` table — represented as DELETE +
    * REINSERT through the `SupportsDelta` lane: the old images become
    * delete-vector bits on their blocks (zero data-file rewrites), the
    * new images append as fresh blocks at the sequence tail — a k-row
    * UPDATE writes O(k) rows where COW rewrites O(touched blocks)
    * (q_tradelog_update_sql is the COW twin under the IDENTICAL oracle:
    * the digest recomputes the assignment as a CASE). Spec pins the
    * mechanics: original files byte-identical, one fresh file, nDel ==
    * rows updated, pre-update time travel serves old values. */
  def tradelogUpdateMor(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensureUpdateMorLog(s, dir)))

  def ensureUpdateMorLog(s: SparkSession, dir: String): String = {
    val path = s"${logPath(s, dir)}-updmor"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_DML_DONE")
    if (!fs.exists(done)) {
      if (fs.exists(root)) fs.delete(root, true)
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartitionByRange(8, col("ts"))
        .sortWithinPartitions("ts")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path)
      TradeLogFormat.setDeleteMode(path, "mor")
      val cs = s.newSession()
      cs.conf.set("spark.sql.catalog.graft_tlog",
        classOf[TradeLogCatalog].getName)
      cs.sql(s"UPDATE graft_tlog.`$path` SET value = value * 2 " +
        s"WHERE user_id IN ($UpdUsers)")
      fs.create(done, true).close()
    }
    path
  }

  // ---- q_tradelog_mor_streamed (43rd bridge: the STREAMED masked read) ----

  /** The MoR mask under the STREAMING engine and the driver gate: the
    * DV'd artifact drains through [[TradeLogMicroBatchStream]] in
    * rate-limited micro-batches — block seqs unchanged by the vectors,
    * masked ordinals never emitted — and the complete-mode per-type
    * aggregate must hash-match the batch SQL over exactly the survivors.
    * With q_tradelog_delete_mor (batch read) on the same artifact, the
    * two doors adjudicate one masked state. */
  def tradelogMorStreamed(s: SparkSession, dir: String): DataFrame = {
    val path = ensureMorLog(s, dir)
    val perTrigger = streamTriggerBlocks(path)
    Tables.runStreamComplete(s, "tradelog_mor_") { cs =>
      aggByType(cs.readStream.format(FormatName)
        .option("maxBlocksPerTrigger", perTrigger).load(path))
    }.orderedBy("event_type")
  }

  private val tradelogMorStreamedOracle: String = aggOracleWhere(
    s"""WHERE (user_id <> $MorUser OR user_id IS NULL)
       |  AND (event_id % 10 <> $MorMod OR event_id IS NULL)""".stripMargin)

  // ---- q_tradelog_mor_compacted (DV COMPACTION ≡ MASKED READ) -------------

  /** Delete-vector COMPACTION under the same oracle: an independently
    * built MoR artifact has its accumulated vectors folded into rewritten
    * blocks ([[TradeLogMaintenance.compactDeletes]] — the `onlyDeleted`
    * masked read feeding one distributed append whose commit replaces
    * exactly the DV-carrying blocks). The compacted log's digest must
    * equal the SAME survivors oracle as q_tradelog_delete_mor: compaction
    * is physically destructive and observationally invisible. Spec pins
    * the mechanics (no DV survives, fresh files landed, fully-
    * dereferenced old files GC'd, a second compaction is a no-op). */
  def tradelogMorCompacted(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensureMorCompacted(s, dir)))

  def ensureMorCompacted(s: SparkSession, dir: String): String = {
    val path = buildMorDeleted(s, dir, "-morc")
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_COMPACTED")
    if (!fs.exists(done)) {
      TradeLogMaintenance.compactDeletes(s, path, blockRows = 256)
      fs.create(done, true).close()
    }
    path
  }

  // ---- q_tradelog_merge_sync (MERGE … NOT MATCHED BY SOURCE) --------------

  /** The full-table-sync CDC verb (VERDICT r17 #3): MERGE with BOTH
    * `WHEN NOT MATCHED BY SOURCE` lanes — target rows absent from the
    * source are deleted (even user_ids) or tombstoned (`value = -1`),
    * on top of the matched-update/-delete and not-matched-insert verbs
    * of q_tradelog_merge_sql. Spark rewrites this as the group-based COW
    * over a FULL-OUTER row match: not-matched-by-source actions widen the
    * touched group set to every group holding a target row the source
    * misses — the documented cost of full-sync semantics. The merged
    * table must match the declarative full-outer fold oracle. */
  def tradelogMergeSync(s: SparkSession, dir: String): DataFrame =
    s.read.format(FormatName).load(ensureMergeSyncLog(s, dir))
      .select(col("user_id"), col("value"))
      .orderedBy("user_id")

  def ensureMergeSyncLog(s: SparkSession, dir: String): String = {
    val path = s"${logPath(s, dir)}-mergesync"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_DML_DONE")
    if (!fs.exists(done)) {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      ev.filter(pmod(col("event_id"), lit(5)) < 3)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn")
        .repartitionByRange(4, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 64).save(path)
      val cs = s.newSession()
      cs.conf.set("spark.sql.catalog.graft_tlog",
        classOf[TradeLogCatalog].getName)
      Tables.events(cs, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .filter(pmod(col("event_id"), lit(5)) >= 3)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn")
        .withColumn("op",
          when(pmod(col("event_id"), lit(7)) === 0, lit("D")).otherwise("U"))
        .createOrReplaceTempView("graft_tlog_sync_chg")
      cs.sql(
        s"""MERGE INTO graft_tlog.`$path` t USING graft_tlog_sync_chg c
           |ON t.user_id = c.user_id
           |WHEN MATCHED AND c.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET value = c.value
           |WHEN NOT MATCHED AND c.op <> 'D' THEN INSERT
           |  (event_id, ts, user_id, event_type, value, props)
           |  VALUES (c.event_id, c.ts, c.user_id, c.event_type, c.value,
           |          c.props)
           |WHEN NOT MATCHED BY SOURCE AND t.user_id % 2 = 0 THEN DELETE
           |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET value = -1
           |""".stripMargin)
      fs.create(done, true).close()
    }
    path
  }

  // ---- q_tradelog_merge_mor (MERGE-ON-READ MERGE INTO) ---------------------

  /** MERGE INTO through the `SupportsDelta` lane (VERDICT r18 #2 — the
    * Iceberg `write.merge.mode=merge-on-read` half): the IDENTICAL
    * full-sync MERGE as q_tradelog_merge_sync, run on a `delmode=mor`
    * table — matched UPDATE/DELETE rows (and the NOT-MATCHED-BY-SOURCE
    * verbs) become delete-vector bits plus tail-appended new images,
    * not-matched inserts are ordinary appends; ZERO data files are
    * rewritten by the matched clauses (TradeLogMorSpec pins the .gtl set
    * byte-identical plus fresh tail files). Same full-outer fold oracle
    * as the COW twin: two write amplifications, one MERGE semantic. */
  def tradelogMergeMor(s: SparkSession, dir: String): DataFrame =
    s.read.format(FormatName).load(ensureMergeMorLog(s, dir))
      .select(col("user_id"), col("value"))
      .orderedBy("user_id")

  def ensureMergeMorLog(s: SparkSession, dir: String): String = {
    val path = s"${logPath(s, dir)}-mergemor"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_DML_DONE")
    if (!fs.exists(done)) {
      if (fs.exists(root)) fs.delete(root, true)
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      ev.filter(pmod(col("event_id"), lit(5)) < 3)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn")
        .repartitionByRange(4, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 64).save(path)
      TradeLogFormat.setDeleteMode(path, "mor")
      val cs = s.newSession()
      cs.conf.set("spark.sql.catalog.graft_tlog",
        classOf[TradeLogCatalog].getName)
      Tables.events(cs, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .filter(pmod(col("event_id"), lit(5)) >= 3)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn")
        .withColumn("op",
          when(pmod(col("event_id"), lit(7)) === 0, lit("D")).otherwise("U"))
        .createOrReplaceTempView("graft_tlog_mor_chg")
      cs.sql(
        s"""MERGE INTO graft_tlog.`$path` t USING graft_tlog_mor_chg c
           |ON t.user_id = c.user_id
           |WHEN MATCHED AND c.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET value = c.value
           |WHEN NOT MATCHED AND c.op <> 'D' THEN INSERT
           |  (event_id, ts, user_id, event_type, value, props)
           |  VALUES (c.event_id, c.ts, c.user_id, c.event_type, c.value,
           |          c.props)
           |WHEN NOT MATCHED BY SOURCE AND t.user_id % 2 = 0 THEN DELETE
           |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET value = -1
           |""".stripMargin)
      fs.create(done, true).close()
    }
    path
  }

  // ---- q_tradelog_merge_evolve (MERGE × SCHEMA EVOLUTION) ------------------

  /** MERGE INTO against an EVOLVED table with a source carrying the added
    * column, in BOTH write lanes (r19 verdict #4): the table commits
    * with the base 6-column schema, `ALTER TABLE … ADD COLUMNS (xnote
    * STRING)` widens it in one header-only commit, and the full-sync
    * MERGE then drives the new column — matched UPDATEs SET it from the
    * source, inserts carry it, NOT-MATCHED-BY-SOURCE survivors keep the
    * old-block NULL fill (their blocks are never rewritten in the MoR
    * lane; the COW lane's rewrite re-emits them with the union schema's
    * null). The query unions the COW (`delmode` default) and MoR
    * (`delmode=mor`) lanes under one oracle — the identical fold with a
    * lane literal — so the digest proves evolution composes with BOTH
    * merge write amplifications. TradeLogMorSpec pins the mechanics
    * (old blocks keep nCols=6 in the MoR lane; only new images/inserts
    * carry the widened width). */
  def tradelogMergeEvolve(s: SparkSession, dir: String): DataFrame = {
    val cow = s.read.format(FormatName)
      .load(ensureMergeEvolveLog(s, dir, mor = false))
      .select(lit("cow").as("lane"), col("user_id"), col("value"),
        col("xnote"))
    val morL = s.read.format(FormatName)
      .load(ensureMergeEvolveLog(s, dir, mor = true))
      .select(lit("mor").as("lane"), col("user_id"), col("value"),
        col("xnote"))
    cow.unionByName(morL).orderedBy("lane", "user_id")
  }

  def ensureMergeEvolveLog(s: SparkSession, dir: String,
      mor: Boolean): String = {
    val lane = if (mor) "mor" else "cow"
    val path = s"${logPath(s, dir)}-mergeevolve-$lane"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_DML_DONE")
    if (!fs.exists(done)) {
      if (fs.exists(root)) fs.delete(root, true)
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      ev.filter(pmod(col("event_id"), lit(5)) < 3)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn")
        .repartitionByRange(4, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 64).save(path)
      if (mor) TradeLogFormat.setDeleteMode(path, "mor")
      val cs = s.newSession()
      cs.conf.set("spark.sql.catalog.graft_tlog",
        classOf[TradeLogCatalog].getName)
      // the evolution: one header-only commit widens the table
      cs.sql(s"ALTER TABLE graft_tlog.`$path` ADD COLUMNS (xnote STRING)")
      Tables.events(cs, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .filter(pmod(col("event_id"), lit(5)) >= 3)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn")
        .withColumn("op",
          when(pmod(col("event_id"), lit(7)) === 0, lit("D")).otherwise("U"))
        // the added column from the SOURCE side; nulls on every
        // event_id % 3 = 0 row exercise the tail null mask
        .withColumn("xnote",
          when(pmod(col("event_id"), lit(3)) === 0, lit(null).cast("string"))
            .otherwise(concat(lit("n"), col("event_id").cast("string"))))
        .createOrReplaceTempView(s"graft_tlog_evolve_chg_$lane")
      cs.sql(
        s"""MERGE INTO graft_tlog.`$path` t USING graft_tlog_evolve_chg_$lane c
           |ON t.user_id = c.user_id
           |WHEN MATCHED AND c.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET value = c.value, xnote = c.xnote
           |WHEN NOT MATCHED AND c.op <> 'D' THEN INSERT
           |  (event_id, ts, user_id, event_type, value, props, xnote)
           |  VALUES (c.event_id, c.ts, c.user_id, c.event_type, c.value,
           |          c.props, c.xnote)
           |WHEN NOT MATCHED BY SOURCE AND t.user_id % 2 = 0 THEN DELETE
           |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET value = -1
           |""".stripMargin)
      fs.create(done, true).close()
    }
    path
  }

  /** [[tradelogMergeSyncOracle]]'s fold extended with the evolved
    * column (matched U → source xnote, survivors → the old-block NULL
    * fill, inserts → source xnote), emitted once per write lane. */
  private val tradelogMergeEvolveOracle: String =
    """WITH snap AS (
      |  SELECT user_id, value AS snap_value FROM (
      |    SELECT user_id, value,
      |           row_number() OVER (PARTITION BY user_id
      |             ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_id % 5 < 3)
      |  WHERE rn = 1),
      |chg AS (
      |  SELECT user_id, op, value AS chg_value, chg_xnote FROM (
      |    SELECT user_id, value,
      |           CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END AS op,
      |           CASE WHEN event_id % 3 = 0 THEN NULL
      |                ELSE 'n' || CAST(event_id AS VARCHAR) END AS chg_xnote,
      |           row_number() OVER (PARTITION BY user_id
      |             ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_id % 5 >= 3)
      |  WHERE rn = 1),
      |fold AS (
      |  SELECT COALESCE(s.user_id, c.user_id) AS user_id,
      |         CASE WHEN op IS NOT NULL THEN chg_value ELSE -1 END AS value,
      |         CASE WHEN op IS NOT NULL THEN chg_xnote ELSE NULL END AS xnote
      |  FROM snap s FULL OUTER JOIN chg c ON s.user_id = c.user_id
      |  WHERE (op IS NOT NULL AND op <> 'D')
      |     OR (op IS NULL AND (s.user_id % 2 <> 0 OR s.user_id IS NULL)))
      |SELECT lane, user_id, value, xnote
      |FROM (SELECT 'cow' AS lane UNION ALL SELECT 'mor') lanes
      |CROSS JOIN fold
      |ORDER BY lane, user_id""".stripMargin

  /** The full-outer fold: both-sides rows follow the matched verbs,
    * source-only rows insert (unless D), target-only rows delete (even
    * user) or tombstone to -1 — exactly the SQL's clause set. */
  private val tradelogMergeSyncOracle: String =
    """WITH snap AS (
      |  SELECT user_id, value AS snap_value FROM (
      |    SELECT user_id, value,
      |           row_number() OVER (PARTITION BY user_id
      |             ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_id % 5 < 3)
      |  WHERE rn = 1),
      |chg AS (
      |  SELECT user_id, op, value AS chg_value FROM (
      |    SELECT user_id, value,
      |           CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END AS op,
      |           row_number() OVER (PARTITION BY user_id
      |             ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_id % 5 >= 3)
      |  WHERE rn = 1)
      |SELECT COALESCE(s.user_id, c.user_id) AS user_id,
      |       CASE WHEN op IS NOT NULL THEN chg_value ELSE -1 END AS value
      |FROM snap s FULL OUTER JOIN chg c ON s.user_id = c.user_id
      |-- op marks source presence (never null inside chg; a NULL user_id
      |-- never matches ON, on either engine). Target-only survival is the
      |-- SQL's clause order: the even-user DELETE fires only when its
      |-- condition is TRUE (a NULL user_id falls through to the
      |-- unconditional tombstone UPDATE), hence the IS NULL leg.
      |WHERE (op IS NOT NULL AND op <> 'D')
      |   OR (op IS NULL AND (s.user_id % 2 <> 0 OR s.user_id IS NULL))
      |ORDER BY user_id""".stripMargin

  // ---- q_tradelog_restore (SNAPSHOT ROLLBACK) ------------------------------

  /** RESTORE-to-generation (VERDICT r17 #4) under the digest gate: the
    * two-generation append artifact pattern (gen 1 = even event_ids,
    * gen 2 = the odd append) rolled back with
    * [[TradeLogMaintenance.restoreTo]] — a THIRD commit whose block set
    * equals generation 1's (history preserved, the Iceberg rollback
    * contract; nothing rewritten, the commit re-references gen 1's
    * immutable shards). The head read's digest must equal the even-half
    * oracle — the same text q_tradelog_asof pins for the PINNED read, now
    * holding for the restored HEAD. Spec pins the rest: head gen == 3,
    * time travel to gen 2 still serves the full table, post-restore
    * appends work, changes-since-2 shows the restatement. */
  def tradelogRestore(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensureRestoredLog(s, dir)))

  def ensureRestoredLog(s: SparkSession, dir: String): String = {
    val path = s"${logPath(s, dir)}-restore"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_RESTORED")
    if (!fs.exists(done)) {
      if (fs.exists(root)) fs.delete(root, true)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      ev.filter(col("event_id") % 2 === 0)
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path)
      ev.filter(col("event_id") % 2 === 1)
        .write.format(FormatName).mode("append")
        .option("blockRows", 256).save(path)
      val gen = TradeLogMaintenance.restoreTo(path, 1L)
      require(gen == 3L, s"restore artifact expected generation 3, got $gen")
      fs.create(done, true).close()
    }
    path
  }

  // ---- q_tradelog_optimize_z (OPTIMIZE with Z-ORDER clustering) -----------

  /** OPTIMIZE ZORDER (VERDICT r17 #5, commit-shaped since r19 — VERDICT
    * r18 #4): the log re-clustered IN PLACE by the Morton interleave of
    * (hour-of-corpus, user_id) — [[graft.core.Layout.zorderKey]] driven
    * through [[TradeLogMaintenance.optimize]]'s history-preserving
    * replace commit (generation-exact conflict validation, replace
    * provenance for streams, graced GC) — so per-block min/max ts AND
    * user range/bloom BOTH stay tight and a 2-dimensional predicate
    * (time slice × user) skips on both axes, where the ts-sorted layout
    * only serves its leading column. The digest gate proves the rewrite
    * byte-preserving (same oracle as q_tradelog_digest); TradeLogSpec
    * measures the 2-D skip fraction z-order wins over the ts-sort and
    * TradeLogLifecycleSpec pins the commit mechanics (time travel spans
    * the OPTIMIZE, appends continue after it). */
  def tradelogOptimizeZ(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensureZordered(s, dir)))

  /** Epoch hours of 2024-01-01T00:00Z — the corpus-local origin of the
    * z-key's time dimension (events testdata spans January 2024). */
  private val ZHourBase = 1704067200L / 3600L

  /** The z-order clustering pass [[TradeLogMaintenance.optimize]] runs:
    * Morton key → range partitions → local sort (one narrow exchange). */
  def zorderCluster(log: DataFrame): DataFrame = {
    val zkey = graft.core.Layout.zorderKey(
      // hour index within the corpus (null ts → 0, its own leading
      // cluster) × user id; both fit 16 bits at every sf
      coalesce((unix_micros(col("ts")) / lit(3600000000L))
        .cast("long") - lit(ZHourBase), lit(0L)),
      pmod(coalesce(col("user_id"), lit(0L)), lit(65536L)))
    log.withColumn("__z", zkey)
      .repartitionByRange(4, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  def ensureZordered(s: SparkSession, dir: String): String = {
    val src = ensureLog(s, dir)
    val path = s"$src-zorder"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_OPTIMIZED")
    if (!fs.exists(done)) {
      if (fs.exists(root)) fs.delete(root, true)
      // gen 1: the table as it lived before maintenance (ts-sorted copy);
      // gen 2: OPTIMIZE ZORDER as a commit on the SAME path — history
      // spans the rewrite instead of being orphaned at an old path
      s.read.format(FormatName).load(src)
        .repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path)
      val gen = TradeLogMaintenance.optimize(s, path, blockRows = 256)(
        zorderCluster)
      require(gen == 2L, s"optimize artifact expected generation 2, got $gen")
      fs.create(done, true).close()
    }
    path
  }

  // ---- q_tradelog_optimize_mor (OPTIMIZE × DELETE VECTORS) -----------------

  /** OPTIMIZE over a DV'd log (VERDICT r18 #5 — the Z-order × MoR
    * composition): an independently built merge-on-read artifact (same
    * two scattered DELETEs as q_tradelog_delete_mor) is re-clustered by
    * [[TradeLogMaintenance.optimize]] — the masked head read feeds the
    * z-ordered rewrite, so the accumulated vectors FOLD (no DV survives)
    * while the survivors digest stays byte-identical to the SAME oracle
    * as the masked read. One commit compacts and clusters. */
  def tradelogOptimizeMor(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensureMorOptimized(s, dir)))

  def ensureMorOptimized(s: SparkSession, dir: String): String = {
    val path = buildMorDeleted(s, dir, "-morz")
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_OPTIMIZED")
    if (!fs.exists(done)) {
      TradeLogMaintenance.optimize(s, path, blockRows = 256)(zorderCluster)
      require(TradeLogFormat.readManifestRefs(path).totalDeletes == 0L,
        "OPTIMIZE over a MoR log must fold every delete vector")
      fs.create(done, true).close()
    }
    path
  }

  // ---- q_tradelog_optimize_scoped (PER-PARTITION OPTIMIZE) -----------------

  /** SCOPED OPTIMIZE — the maintenance shape a 100 TB archive actually
    * schedules (Iceberg rewrite_data_files with a partition filter /
    * Delta `OPTIMIZE WHERE`): on an independently built MoR artifact
    * (same scattered deletes), [[TradeLogMaintenance.optimizeRange]]
    * re-clusters ONLY the blocks fully inside a mid-corpus week —
    * O(scope) read/write/commit work, untouched day shards carried by
    * reference, in-scope vectors folded, out-of-scope vectors left for a
    * later pass. The whole-table digest must still equal the SAME
    * survivors oracle as the masked read: a partial maintenance pass is
    * observationally invisible. */
  def tradelogOptimizeScoped(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName).load(ensureMorScoped(s, dir)))

  private def usOf(t: String): Long =
    java.sql.Timestamp.valueOf(t).getTime * 1000L

  def ensureMorScoped(s: SparkSession, dir: String): String = {
    val path = buildMorDeleted(s, dir, "-mors")
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_OPTIMIZED")
    if (!fs.exists(done)) {
      val before = TradeLogFormat.readManifestRefs(path).totalDeletes
      TradeLogMaintenance.optimizeRange(s, path,
        usOf("2024-01-08 00:00:00"), usOf("2024-01-18 00:00:00"),
        blockRows = 256)(zorderCluster)
      val after = TradeLogFormat.readManifestRefs(path).totalDeletes
      require(after < before && after > 0L,
        s"scoped optimize must fold in-scope vectors only ($before -> $after)")
      fs.create(done, true).close()
    }
    path
  }

  // ---- q_tradelog_cdf (CHANGE DATA FEED WITH DELETE ROWS) ------------------

  /** Changes-since with DELETE TRACKING (the Delta readChangeFeed verb,
    * r19): over an artifact whose base generation holds the even
    * event_ids, the odd half is appended and `user_id = 11` is
    * MoR-deleted across BOTH halves; the `withChangeTypes` diff must
    * emit exactly (a) the surviving odd rows as `_change_type='insert'`
    * and (b) the even rows of user 11 as `'delete'` — the DV delta read
    * back from the original blocks, no tombstone rows stored anywhere.
    * Rows both inserted AND deleted since the sync point (odd user-11
    * rows) net to NOTHING, the CDF collapse rule. Digest grouped by
    * (change_type, event_type) against the declarative two-branch
    * oracle. */
  def tradelogCdf(s: SparkSession, dir: String): DataFrame = {
    val log = s.read.format(FormatName)
      .option("changesSinceGeneration", 1)
      .option("withChangeTypes", "true")
      .load(ensureCdfLog(s, dir))
      .select(col("_change_type").as("change_type"), col("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"),
        col("props"))
    val repr = concat_ws("#",
      col("change_type"), col("event_id"), unix_micros(col("ts")),
      col("user_id"), col("event_type"),
      round(col("value") * 100).cast("long"), col("props"))
    val h32 = conv(substring(md5(repr.cast("binary")), 1, 8), 16, 10)
      .cast("long")
    log.groupBy(col("change_type"), col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(shiftright(h32, 16)).as("hi"),
        sum(h32.bitwiseAND(lit(0xffffL))).as("lo"))
      .select(col("change_type"), col("event_type"), col("n"),
        (col("hi").cast("decimal(38,0)") * lit(65536) + col("lo"))
          .cast("string").as("digest"))
      .orderedBy("change_type", "event_type")
  }

  def ensureCdfLog(s: SparkSession, dir: String): String = {
    val path = s"${logPath(s, dir)}-cdf"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_DML_DONE")
    if (!fs.exists(done)) {
      if (fs.exists(root)) fs.delete(root, true)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      ev.filter(col("event_id") % 2 === 0)
        .repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path) // gen 1 = the sync point
      TradeLogFormat.setDeleteMode(path, "mor")
      ev.filter(col("event_id") % 2 === 1)
        .repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
        .write.format(FormatName).mode("append")
        .option("blockRows", 256).save(path)
      val cs = s.newSession()
      cs.conf.set("spark.sql.catalog.graft_tlog",
        classOf[TradeLogCatalog].getName)
      cs.sql(s"DELETE FROM graft_tlog.`$path` WHERE user_id = $MorUser")
      fs.create(done, true).close()
    }
    path
  }

  /** The two CDF branches, declaratively: inserts = post-sync additions
    * minus their own deletions (the collapse rule); deletes = pre-sync
    * rows the DV delta masked. */
  // ---- q_tradelog_cdf_compacted (CDF ACROSS A FOLD — retention sidecar) ---

  /** [[tradelogCdf]]'s read ACROSS a DV compaction (r19 verdict #3 —
    * Delta's CDF-retention semantics): the identical two-branch artifact
    * is compacted AFTER the deletes, folding every DV into fresh blocks
    * and destroying the head's delete history; the diff is served from
    * the retention sidecar instead — vanished pre-sync blocks pair for
    * their DV deltas, the straddling restatement's post-sync content
    * re-emits from the dropped copies (whose data files ride the DML
    * vacuum grace) — and the digest must equal the SAME oracle as the
    * uncompacted twin. TradeLogMorSpec pins the refusal boundary: sweep
    * the sidecar (or the files) and the read fails loudly rather than
    * under-report. */
  def tradelogCdfCompacted(s: SparkSession, dir: String): DataFrame = {
    val log = s.read.format(FormatName)
      .option("changesSinceGeneration", 1)
      .option("withChangeTypes", "true")
      .load(ensureCdfCompactedLog(s, dir))
      .select(col("_change_type").as("change_type"), col("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"),
        col("props"))
    val repr = concat_ws("#",
      col("change_type"), col("event_id"), unix_micros(col("ts")),
      col("user_id"), col("event_type"),
      round(col("value") * 100).cast("long"), col("props"))
    val h32 = conv(substring(md5(repr.cast("binary")), 1, 8), 16, 10)
      .cast("long")
    log.groupBy(col("change_type"), col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(shiftright(h32, 16)).as("hi"),
        sum(h32.bitwiseAND(lit(0xffffL))).as("lo"))
      .select(col("change_type"), col("event_type"), col("n"),
        (col("hi").cast("decimal(38,0)") * lit(65536) + col("lo"))
          .cast("string").as("digest"))
      .orderedBy("change_type", "event_type")
  }

  def ensureCdfCompactedLog(s: SparkSession, dir: String): String = {
    val path = s"${logPath(s, dir)}-cdfc"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_DML_DONE")
    if (!fs.exists(done)) {
      if (fs.exists(root)) fs.delete(root, true)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      ev.filter(col("event_id") % 2 === 0)
        .repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path) // gen 1 = the sync point
      TradeLogFormat.setDeleteMode(path, "mor")
      ev.filter(col("event_id") % 2 === 1)
        .repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
        .write.format(FormatName).mode("append")
        .option("blockRows", 256).save(path)
      val cs = s.newSession()
      cs.conf.set("spark.sql.catalog.graft_tlog",
        classOf[TradeLogCatalog].getName)
      cs.sql(s"DELETE FROM graft_tlog.`$path` WHERE user_id = $MorUser")
      // the retention window: keep the folded data files (Delta's
      // deletedFileRetentionDuration) so the sidecar-served diff reads
      val hconf = s.sparkContext.hadoopConfiguration
      val graceKey = "graft.tradelog.dml.vacuum.grace.ms"
      val prevGrace = Option(hconf.get(graceKey))
      hconf.setLong(graceKey, 7L * 24 * 3600 * 1000)
      try TradeLogMaintenance.compactDeletes(s, path, blockRows = 256)
      finally prevGrace match {
        case Some(v) => hconf.set(graceKey, v)
        case None => hconf.unset(graceKey)
      }
      fs.create(done, true).close()
    }
    path
  }

  private val tradelogCdfOracle: String = {
    val hv = OracleSql.hexPrefixToLong("h8")
    s"""WITH chg AS (
       |  SELECT 'insert' AS change_type, event_id, ts, user_id,
       |         event_type, value, props
       |  FROM events
       |  WHERE event_id % 2 = 1 AND (user_id <> $MorUser OR user_id IS NULL)
       |  UNION ALL
       |  SELECT 'delete', event_id, ts, user_id, event_type, value, props
       |  FROM events WHERE event_id % 2 = 0 AND user_id = $MorUser),
       |r AS (
       |  SELECT change_type, event_type,
       |         change_type || '#' ||
       |         CAST(event_id AS VARCHAR) || '#' ||
       |         CAST(epoch_us(ts) AS VARCHAR) || '#' ||
       |         CAST(user_id AS VARCHAR) || '#' ||
       |         event_type || '#' ||
       |         CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) || '#' ||
       |         props AS repr
       |  FROM chg),
       |h AS (SELECT change_type, event_type, substr(md5(repr), 1, 8) AS h8
       |      FROM r),
       |l AS (SELECT change_type, event_type, $hv AS hv FROM h)
       |SELECT change_type, event_type, count(*) AS n,
       |       CAST(CAST(sum(hv // 65536) AS DECIMAL(38,0)) * 65536
       |            + CAST(sum(hv % 65536) AS DECIMAL(38,0)) AS VARCHAR) AS digest
       |FROM l GROUP BY change_type, event_type
       |ORDER BY change_type, event_type""".stripMargin
  }

  // ---- q_tradelog_branch (NAMED REFS / WRITE-AUDIT-PUBLISH) ----------------

  /** Branch refs + WAP (VERDICT r18 #7): the even event_ids commit to
    * MAIN (generation 1), a branch `audit` forks there, the odd half is
    * STAGED onto the branch (`option("branch", "audit")` — a real
    * distributed commit that leaves main untouched), and
    * [[TradeLogRefs.publish]] fast-forwards main to the branch head as
    * one re-referencing commit. The query reads THROUGH the ref
    * (`option("ref", "audit")`) and its digest must equal the
    * whole-table oracle — branch read ≡ the published state ≡ the sum of
    * both halves. TradeLogLifecycleSpec pins the WAP mechanics: main
    * serves only the evens pre-publish, a non-fast-forward publish fails
    * loudly, tags stay immutable, vacuum spares staged files. */
  def tradelogBranch(s: SparkSession, dir: String): DataFrame =
    digestOver(s.read.format(FormatName)
      .option("ref", "audit")
      .load(ensureBranchLog(s, dir)))

  def ensureBranchLog(s: SparkSession, dir: String): String = {
    val path = s"${logPath(s, dir)}-branch"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_WAP_DONE")
    if (!fs.exists(done)) {
      if (fs.exists(root)) fs.delete(root, true)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      ev.filter(col("event_id") % 2 === 0)
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path)
      TradeLogRefs.createBranch(path, "audit")
      ev.filter(col("event_id") % 2 === 1)
        .write.format(FormatName).mode("append")
        .option("branch", "audit")
        .option("blockRows", 256).save(path)
      require(TradeLogFormat.readManifestHeader(path).gen == 1L,
        "staging to a branch must leave main untouched")
      val gen = TradeLogRefs.publish(path, "audit")
      require(gen == 2L, s"WAP artifact expected generation 2, got $gen")
      fs.create(done, true).close()
    }
    path
  }

  // ---- q_tradelog_evolve_sql (CATALOG-DOOR SCHEMA EVOLUTION) --------------

  /** `ALTER TABLE … ADD COLUMNS` + `INSERT INTO` through the catalog door
    * (VERDICT r17 #6): the even event_ids commit with the base schema,
    * the catalog widens the table by three columns in ONE header-only
    * commit ([[TradeLogCatalog.alterTable]] → xcols ledger), and the odd
    * rows INSERT with the widened schema via SQL — reproducing the PATH
    * door's q_tradelog_evolve artifact through DDL+DML, under the
    * identical mixed-generation digest oracle. Old blocks null-fill the
    * new ordinals on read; no data file is touched by the ALTER. */
  def tradelogEvolveSql(s: SparkSession, dir: String): DataFrame = {
    val log = s.read.format(FormatName).load(ensureEvolveSqlLog(s, dir))
    val repr = concat_ws("#",
      col("event_id"), unix_micros(col("ts")), col("user_id"),
      col("event_type"), round(col("value") * 100).cast("long"),
      col("props"),
      coalesce(col("xseq").cast("string"), lit("null")),
      coalesce(col("xtag"), lit("null")),
      coalesce(round(col("xval") * 100).cast("long").cast("string"),
        lit("null")))
    val h32 = conv(substring(md5(repr.cast("binary")), 1, 8), 16, 10)
      .cast("long")
    log.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(shiftright(h32, 16)).as("hi"),
        sum(h32.bitwiseAND(lit(0xffffL))).as("lo"))
      .select(col("event_type"), col("n"),
        (col("hi").cast("decimal(38,0)") * lit(65536) + col("lo"))
          .cast("string").as("digest"))
      .orderedBy("event_type")
  }

  def ensureEvolveSqlLog(s: SparkSession, dir: String): String = {
    val path = s"${logPath(s, dir)}-evolvesql"
    val (fs, root) = TradeLogFormat.fs(path)
    val done = new org.apache.hadoop.fs.Path(root, "_DML_DONE")
    if (!fs.exists(done)) {
      if (fs.exists(root)) fs.delete(root, true)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      ev.filter(col("event_id") % 2 === 0)
        .write.format(FormatName).mode("overwrite")
        .option("blockRows", 256).save(path)
      val cs = s.newSession()
      cs.conf.set("spark.sql.catalog.graft_tlog",
        classOf[TradeLogCatalog].getName)
      cs.sql(s"ALTER TABLE graft_tlog.`$path` ADD COLUMNS " +
        "(xseq BIGINT, xtag STRING, xval DOUBLE)")
      Tables.events(cs, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .filter(col("event_id") % 2 === 1)
        .withColumn("xseq", col("event_id") * 10)
        .withColumn("xtag",
          when(pmod(col("user_id"), lit(3)) =!= 0, upper(col("event_type"))))
        .withColumn("xval", col("value"))
        .createOrReplaceTempView("graft_tlog_evolve_src")
      cs.sql(s"INSERT INTO graft_tlog.`$path` " +
        "SELECT * FROM graft_tlog_evolve_src")
      fs.create(done, true).close()
    }
    path
  }

  /** q_cdc_apply's snapshot⊕changes fold (Stats.cdcApplyOracle) reduced
    * to the merged table's observable columns. */
  private val tradelogMergeSqlOracle: String =
    """WITH snap AS (
      |  SELECT user_id, value AS snap_value FROM (
      |    SELECT user_id, value,
      |           row_number() OVER (PARTITION BY user_id
      |             ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_id % 5 < 3)
      |  WHERE rn = 1),
      |chg AS (
      |  SELECT user_id, op, value AS chg_value FROM (
      |    SELECT user_id, value,
      |           CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END AS op,
      |           row_number() OVER (PARTITION BY user_id
      |             ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_id % 5 >= 3)
      |  WHERE rn = 1)
      |SELECT COALESCE(s.user_id, c.user_id) AS user_id,
      |       COALESCE(chg_value, snap_value) AS value
      |FROM snap s FULL OUTER JOIN chg c ON s.user_id = c.user_id
      |WHERE op IS NULL OR op <> 'D'
      |ORDER BY user_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    // MERGE-ON-READ DELETE: delete vectors, zero data-file rewrites
    "q_tradelog_delete_mor" -> QueryDef(tradelogDeleteMor,
      Some(tradelogDeleteMorOracle)),
    // MERGE-ON-READ UPDATE: DV the old images, tail-append the new ones —
    // same oracle as the COW UPDATE twin (assignment recomputed as CASE)
    "q_tradelog_update_mor" -> QueryDef(tradelogUpdateMor,
      Some(tradelogUpdateSqlOracle)),
    // 43rd bridge: the delete-vector mask under the STREAMING reader —
    // rate-limited micro-batches over the DV'd artifact, survivors SQL
    "q_tradelog_mor_streamed" -> QueryDef(tradelogMorStreamed,
      Some(tradelogMorStreamedOracle)),
    // DV COMPACTION: folding vectors into rewritten blocks preserves the
    // same survivors digest (compaction ≡ masked read)
    "q_tradelog_mor_compacted" -> QueryDef(tradelogMorCompacted,
      Some(tradelogDeleteMorOracle)),
    // MERGE with NOT MATCHED BY SOURCE: the full-table-sync CDC verb
    "q_tradelog_merge_sync" -> QueryDef(tradelogMergeSync,
      Some(tradelogMergeSyncOracle)),
    // MERGE-ON-READ MERGE INTO: the same full-sync MERGE through the
    // SupportsDelta lane — DV bits + tail appends, zero matched rewrites
    "q_tradelog_merge_mor" -> QueryDef(tradelogMergeMor,
      Some(tradelogMergeSyncOracle)),
    // OPTIMIZE over a DV'd log: masked read feeds the clustered rewrite,
    // vectors fold, survivors digest preserved (z-order x MoR)
    "q_tradelog_optimize_mor" -> QueryDef(tradelogOptimizeMor,
      Some(tradelogDeleteMorOracle)),
    // SCOPED OPTIMIZE: one mid-corpus week re-clustered in place —
    // per-partition maintenance, same survivors digest
    "q_tradelog_optimize_scoped" -> QueryDef(tradelogOptimizeScoped,
      Some(tradelogDeleteMorOracle)),
    // SNAPSHOT RESTORE: rollback-as-new-commit serves the gen-1 digest
    "q_tradelog_restore" -> QueryDef(tradelogRestore,
      Some(digestOracleWhere("WHERE event_id % 2 = 0"))),
    // NAMED REFS / WAP: stage to a branch, audit through the ref,
    // fast-forward publish — the ref read serves the whole table
    "q_tradelog_branch" -> QueryDef(tradelogBranch,
      Some(tradelogDigestOracle)),
    // 45th bridge: the WAP validation STREAM — a micro-batch stream
    // pinned to the staged branch head, whole-table agg oracle
    "q_tradelog_branch_streamed" -> QueryDef(tradelogBranchStreamed,
      Some(tradelogAggOracle)),
    // MERGE × schema evolution, both write lanes under one fold oracle
    "q_tradelog_merge_evolve" -> QueryDef(tradelogMergeEvolve,
      Some(tradelogMergeEvolveOracle)),
    // CDF with delete rows: DV deltas read back as _change_type='delete',
    // post-sync additions as 'insert', insert+delete collapsing to nothing
    "q_tradelog_cdf" -> QueryDef(tradelogCdf, Some(tradelogCdfOracle)),
    // CDF ACROSS a DV compaction: the retention sidecar serves the same
    // two-branch answer the uncompacted twin computes from live history
    "q_tradelog_cdf_compacted" -> QueryDef(tradelogCdfCompacted,
      Some(tradelogCdfOracle)),
    // OPTIMIZE ZORDER: Morton-clustered rewrite preserves the digest
    "q_tradelog_optimize_z" -> QueryDef(tradelogOptimizeZ,
      Some(tradelogDigestOracle)),
    // catalog-door evolution: ALTER ADD COLUMNS + INSERT INTO ≡ the path
    // door's widening append (same mixed-generation oracle)
    "q_tradelog_evolve_sql" -> QueryDef(tradelogEvolveSql,
      Some(tradelogEvolveOracle)),
    // SQL row-level DELETE through the connector (metadata + COW tiers)
    "q_tradelog_delete_sql" -> QueryDef(tradelogDeleteSql,
      Some(tradelogDeleteSqlOracle)),
    // SQL UPDATE through the connector (COW over user-clustered groups)
    "q_tradelog_update_sql" -> QueryDef(tradelogUpdateSql,
      Some(tradelogUpdateSqlOracle)),
    // SQL time travel: VERSION AS OF 1 == the pre-append snapshot digest
    "q_tradelog_version_sql" -> QueryDef(tradelogVersionSql,
      Some(digestOracleWhere("WHERE event_id % 2 = 0"))),
    // SQL MERGE INTO through the connector (group-based COW, CDC verbs)
    "q_tradelog_merge_sql" -> QueryDef(tradelogMergeSql,
      Some(tradelogMergeSqlOracle)),
    // TIME TRAVEL: generation-pinned read serves the pre-append state
    "q_tradelog_asof" -> QueryDef(tradelogAsof,
      Some(digestOracleWhere("WHERE event_id % 2 = 0"))),
    // INCREMENTAL CONSUMPTION: changes since gen 1 = exactly the append
    "q_tradelog_changes" -> QueryDef(tradelogChanges,
      Some(digestOracleWhere("WHERE event_id % 2 = 1"))),
    // 41st bridge: a fresh STREAM positioned after generation 1's blocks
    // drains only the append — startingOffsets meets the generation ledger
    "q_tradelog_incr_streamed" -> QueryDef(tradelogIncrStreamed,
      Some(aggOracleWhere("WHERE event_id % 2 = 1"))),
    // SCHEMA EVOLUTION: widened append, old blocks null-fill on read
    "q_tradelog_evolve" -> QueryDef(tradelogEvolve,
      Some(tradelogEvolveOracle)),
    // retention DELETE: metadata purge + vacuum preserve the boundary digest
    "q_tradelog_purge" -> QueryDef(tradelogPurge,
      Some(digestOracleWhere(s"WHERE ts >= TIMESTAMP '$PurgeCutoff'"))),
    // DSv2 write → DSv2 read round-trip under the aggregate oracle
    "q_tradelog_agg" -> QueryDef(tradelogAgg, Some(tradelogAggOracle)),
    // row-level codec proof: every column in an order-independent digest
    "q_tradelog_digest" -> QueryDef(tradelogDigest, Some(tradelogDigestOracle)),
    // pushed ts bounds + pruned decode; values oracled, pruning spec-pinned
    "q_tradelog_prune" -> QueryDef(tradelogPrune, Some(tradelogPruneOracle)),
    // 28th bridge: the custom MicroBatchStream, rate-limited offsets
    "q_tradelog_streamed" -> QueryDef(tradelogStreamed, Some(tradelogAggOracle)),
    // complete aggregate pushdown: answered from block metadata only
    "q_tradelog_pushdown" -> QueryDef(tradelogPushdown,
      Some(tradelogPushdownOracle)),
    // 29th bridge: the custom STREAMING SINK (epoch-committed manifest)
    "q_tradelog_sink_streamed" -> QueryDef(tradelogSinkStreamed,
      Some(tradelogAggOracle)),
    // 30th bridge: the reference's Kafka->OHLC dataflow through the
    // custom source, adjudicated by q_ohlc_1m's own oracle
    "q_ohlc_tradelog" -> QueryDef(ohlcTradelogStreamed,
      Some(graft.ohlc.OhlcPipeline.ohlcOracle)),
    // OPTIMIZE: compaction preserves the row-level digest, fewer blocks
    "q_tradelog_compact" -> QueryDef(tradelogCompact,
      Some(tradelogDigestOracle)),
    // point lookup through the per-block user_id bloom index
    "q_tradelog_point" -> QueryDef(tradelogPoint, Some(tradelogPointOracle)),
    // batch append joins the committed set — whole-table digest holds
    "q_tradelog_append" -> QueryDef(tradelogAppend, Some(tradelogDigestOracle)),
    // runtime join filtering: broadcast dim ids skip blocks at exec time
    "q_tradelog_semi" -> QueryDef(tradelogSemi, Some(tradelogSemiOracle))
  )
}
