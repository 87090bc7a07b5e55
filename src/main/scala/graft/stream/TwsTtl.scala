package graft.stream

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, StreamingQueryProgress, TTLConfig, TimeMode, TimerValues, ValueState}

/** State TTL on transformWithState — the one state-management surface the
  * other bridges leave untouched (TwsCandles/TwsLastK prune manually;
  * their state carries `TTLConfig.NONE`): a per-user running aggregate
  * whose ValueState is declared with a real `TTLConfig(ttl)`, so the
  * ENGINE retires idle keys' state — the retention contract a 100 TB
  * deployment needs for unbounded key domains (user/session/device ids
  * that mostly never return), where manual pruning inside
  * handleInputRows can only fire for keys that DO return.
  *
  * TTL semantics under test (Spark 4, processing-time mode): an expired
  * value is invisible to reads (`exists()` false) from the moment its
  * ttl elapses, and the expired row is PHYSICALLY removed from the store
  * by the engine's per-batch TTL sweep — including keys the batch never
  * touched (the sweep walks the TTL secondary index, not the input).
  *
  * Determinism for the oracle bridge: TTL runs on wall-clock processing
  * time, so the bridge makes expiry a CERTAINTY rather than a race — two
  * AvailableNow runs against one checkpoint with a sleep of 3×ttl
  * between them. Every key's phase-1 state is expired-by-construction
  * when phase 2 reads it (a sleep cannot undershoot), each phase
  * delivers in one micro-batch (reads happen once per key per batch, so
  * no intra-phase expiry window exists), and the fold of update-mode
  * emissions — latest per user across (phase, batch) — therefore equals:
  * the phase-2 aggregate for users active in phase 2 (fresh start, the
  * TTL reset observable), else their last phase-1 emission (the sink
  * retains what the state store retired). Both legs are plain SQL over
  * the same slices, which is the batch oracle.
  */
object TwsTtl {

  case class Ev(user_id: Long, event_id: Long, v6: Long)
  case class Agg(user_id: Long, n: Long, sum_v6: Long)

  class TtlAggProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, Ev, Agg] {

    @transient private var agg: ValueState[Agg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[Agg]("agg", Encoders.product[Agg],
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(user: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[Agg] = {
      // an expired value reads as absent — the aggregate RESTARTS, which
      // is exactly what the oracle's fresh-slice leg computes
      val prev = if (agg.exists()) agg.get() else Agg(user, 0L, 0L)
      var n = prev.n
      var s = prev.sum_v6
      rows.foreach { e => n += 1; s += e.v6 }
      val next = Agg(user, n, s)
      agg.update(next)
      Iterator(next)
    }
  }

  /** Streaming entry: events → per-user running (count, exact 6dp value
    * sum) with TTL'd state, update mode. */
  def ttlAgg(events: DataFrame, ttlMs: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id"), col("event_id"),
        round(col("value") * 1000000).cast("long").as("v6"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(
        new TtlAggProcessor(ttlMs), TimeMode.ProcessingTime(),
        OutputMode.Update())
      .toDF()
  }

  /** Two-phase checkpoint-resumed run: phase 1 drains whatever is staged,
    * the caller sleeps past the ttl and stages more, phase 2 resumes from
    * the SAME checkpoint (the restart path — state survives the stop, the
    * ttl clock does not care). Returns the tagged update-mode emissions
    * of both phases plus each phase's final progress (so specs can pin
    * numRowsTotal dropping when the sweep retires expired keys). */
  def runPhase(parent: SparkSession, stage: String, ckpt: String,
      schema: org.apache.spark.sql.types.StructType, ttlMs: Long,
      phase: Int): (DataFrame, StreamingQueryProgress) = {
    val s = parent.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // ProcessingTime-mode stateful operators always report "another batch
    // could fire my wall-clock timers/ttl", and AvailableNow honors that
    // as an unbounded stream of NO-DATA batches — the query never
    // terminates (and every empty batch re-enters foreachBatch). The
    // bridge needs exactly the data batches: TTL sweeps then run on the
    // next DATA batch, which is what the two-phase design measures.
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val acc = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
    val q = ttlAgg(s.readStream.schema(schema).parquet(stage), ttlMs)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val out = batch.withColumn("__phase", lit(phase))
          .withColumn("__bid", lit(bid)).localCheckpoint(true)
        acc.updateAndGet(p => if (p == null) out else p.unionByName(out))
        ()
      }
      .queryName(s"ttl_p${phase}_" +
        java.util.UUID.randomUUID().toString.replace("-", ""))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.lastProgress
    s.streams.resetTerminated()
    val got = acc.get()
    require(got != null, s"ttl bridge phase $phase saw no micro-batch")
    (got, progress)
  }

  // ---------------------------------------------------------------- //
  // Event-time TTL lane (VERDICT r16 #6): the same idle-key state     //
  // retirement driven by the WATERMARK instead of the wall clock, so  //
  // the bridge needs no sleep and no checkpoint-resumed second run.   //
  // ---------------------------------------------------------------- //

  case class EvT(user_id: Long, event_id: Long, v6: Long,
                 et: java.sql.Timestamp)
  /** State carries the last-seen event time so both expiry decisions —
    * restart-on-return and retire-on-timer — are pure event-time
    * arithmetic. */
  case class AggT(user_id: Long, n: Long, sum_v6: Long, last_ms: Long)

  /** Event-time idle-key retirement on transformWithState timers — the
    * twin of [[TtlAggProcessor]] with the clock swapped: `TTLConfig` ties
    * retirement to wall-clock processing time, which is why the
    * processing-time bridge must buy determinism with a 3×ttl sleep;
    * here BOTH halves of the TTL contract run on event time, so replays
    * are bit-deterministic and the bench pays no sleep.
    *
    *   - a RETURNING key whose event-time gap exceeds `ttlMs` restarts
    *     from zero in handleInputRows (state read as absent — the same
    *     observable TTLConfig gives an expired read);
    *   - an IDLE key is PHYSICALLY retired by its event-time timer at
    *     `last_ms + ttl` once the watermark passes it — the engine-driven
    *     sweep for keys that never return, which is the retention story
    *     an unbounded key domain needs.
    *
    * Timer discipline (TwsCandles'): every input batch re-arms at the new
    * `last_ms + ttl` (clamped past the watermark — Spark rejects timers
    * at or behind it) WITHOUT deleting older timers; a stale timer fires
    * harmlessly because handleExpiredTimer only clears when the fired
    * expiry has actually reached the CURRENT `last_ms + ttl`. */
  class EventTtlProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, EvT, Agg] {

    @transient private var agg: ValueState[AggT] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[AggT]("agg", Encoders.product[AggT],
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[EvT],
                                 tv: TimerValues): Iterator[Agg] = {
      var n = 0L; var s = 0L; var last = Long.MinValue
      if (agg.exists()) {
        val p = agg.get(); n = p.n; s = p.sum_v6; last = p.last_ms
      }
      rows.foreach { e =>
        val ms = e.et.getTime
        // event-time staleness: a gap past the ttl restarts the aggregate
        // — the read-as-absent observable, decided by the DATA's clock
        if (last != Long.MinValue && ms - last > ttlMs) { n = 0L; s = 0L }
        n += 1; s += e.v6
        if (ms > last) last = ms
      }
      agg.update(AggT(user, n, s, last))
      getHandle.registerTimer(
        math.max(last + ttlMs, tv.getCurrentWatermarkInMs() + 1))
      Iterator(Agg(user, n, s))
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Agg] = {
      if (agg.exists()) {
        val cur = agg.get()
        // only a timer that has reached the CURRENT idle deadline retires
        // the key; earlier re-arms' stale timers fall short and no-op
        if (info.getExpiryTimeInMs() >= cur.last_ms + ttlMs) agg.clear()
      }
      Iterator.empty
    }
  }

  /** Streaming entry: (user_id, event_id, value, et) → per-user running
    * (count, exact 6dp value sum) with event-time idle retirement,
    * update mode. Watermark delay is a fixed second — the bridge's
    * synthetic slices are hours apart, so the delay only has to be
    * smaller than the inter-slice gap. */
  def ttlAggEvent(events: DataFrame, ttlMs: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id"), col("event_id"),
        round(col("value") * 1000000).cast("long").as("v6"), col("et"))
      .as[EvT]
      .withWatermark("et", "1 second")
      .groupByKey(_.user_id)
      .transformWithState(
        new EventTtlProcessor(ttlMs), TimeMode.EventTime(),
        OutputMode.Update())
      .toDF()
  }

  /** One AvailableNow run over the staged slice files (one file per
    * micro-batch), capturing update-mode emissions tagged by batch id
    * plus every batch's progress — so specs can pin numRowsTotal
    * FALLING as the watermark-driven timers retire idle keys, with no
    * sleep and no second phase. */
  def runEvent(parent: SparkSession, src: String,
      schema: org.apache.spark.sql.types.StructType, ttlMs: Long)
      : (DataFrame, Seq[StreamingQueryProgress]) = {
    val s = parent.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val acc = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
    val q = ttlAggEvent(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(src), ttlMs)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val out = batch.withColumn("__bid", lit(bid)).localCheckpoint(true)
        acc.updateAndGet(p => if (p == null) out else p.unionByName(out))
        ()
      }
      .queryName("ttl_ev_" +
        java.util.UUID.randomUUID().toString.replace("-", ""))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progs = q.recentProgress.toSeq
    s.streams.resetTerminated()
    val got = acc.get()
    require(got != null, "event-ttl bridge saw no micro-batch")
    (got, progs)
  }
}
