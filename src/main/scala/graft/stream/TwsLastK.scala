package graft.stream

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Per-key LAST-K event buffer on transformWithState's ListState — the one
  * typed state primitive the engine didn't yet exercise (TwsCandles covers
  * MapState + ValueState + event-time timers). The production shape: a
  * bounded per-user recent-activity buffer (feature freshness windows,
  * session replay tails) maintained across micro-batches.
  *
  * Why ListState and not a ValueState[Seq]: appends are PER-ENTRY RocksDB
  * writes (`appendValue`), so the steady-state cost of an incoming event
  * is one append — the whole-buffer rewrite (`put`) happens only when the
  * buffer exceeds k and is pruned back, after which state is ≤ k entries
  * again. State per key is therefore BOUNDED at k + one batch's arrivals,
  * regardless of stream length — the property that survives 100 TB of
  * history where an unbounded event list would not.
  *
  * Emission contract (update mode): each batch that touches a user
  * re-emits that user's CURRENT top-k (rank, ts, value) rows. Because the
  * buffer accumulates across batches, the LAST emission per (user, rank)
  * reflects all of the user's events regardless of arrival order — the
  * fold the bridge applies. Determinism: (ts_us, event_id) is unique per
  * user, so the rank order never ties.
  */
object TwsLastK {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long, value: Double)
  case class LastK(user_id: Long, rn: Long, ep_us: Long, value: Double)

  class LastKProcessor(k: Int) extends StatefulProcessor[Long, Ev, LastK] {

    @transient private var buf: ListState[Ev] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[Ev](
        "buf", Encoders.product[Ev], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[LastK] = {
      rows.foreach(buf.appendValue) // per-entry appends, no blob rewrite
      val all = buf.get().toArray
      val top = all.sortBy(e => (-e.ts_us, -e.event_id)).take(k)
      if (all.length > k) buf.put(top) // prune: state back to ≤ k entries
      top.iterator.zipWithIndex.map { case (e, i) =>
        LastK(user, i + 1L, e.ts_us, e.value)
      }
    }
  }

  /** Streaming entry: normalized events → per-user last-k emissions
    * (update mode, processing-time — the buffer semantics need no
    * event-time timers; late data simply re-ranks). */
  def lastK(events: DataFrame, k: Int): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(
        new LastKProcessor(k), TimeMode.None(), OutputMode.Update())
      .toDF()
  }
}
