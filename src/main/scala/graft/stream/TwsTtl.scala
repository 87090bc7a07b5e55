package graft.stream

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, StreamingQueryProgress, TTLConfig, TimeMode, TimerValues, ValueState}

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
}
