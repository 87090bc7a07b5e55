package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ohlc.{Candle, OhlcAggregator, OhlcBuf, Trade}

/** Arbitrary-stateful candle construction via flatMapGroupsWithState
  * (SURVEY §2.3's "not present in reference" extension list): per base
  * symbol, open windows accumulate in group state and a candle is emitted
  * exactly once — when the symbol's event time moves past the window's
  * close plus the allowed lateness. Append-style emission implemented as
  * explicit state, the pattern the built-in windowed aggregation can't
  * express when per-group custom logic (e.g. emit-once-with-correction
  * tombstones, per-symbol lateness) is needed.
  *
  * State per key: open windows only — bounded by (lateness / window) + 1
  * entries, eviction on every batch. The candle math reuses
  * OhlcAggregator's buffer/merge, so the tie rule is identical to the
  * batch and SQL paths.
  */
object StatefulCandles {

  final case class KeyState(open: Map[Long, OhlcBuf], maxTs: Long)

  def windowStartMs(tsMs: Long, windowMs: Long): Long = tsMs - tsMs % windowMs

  /** Pure per-batch state transition — unit-testable without a stream. */
  def advance(
      base: String,
      trades: Iterator[Trade],
      prev: Option[KeyState],
      windowMs: Long,
      latenessMs: Long
  ): (KeyState, List[Candle]) = {
    val st0 = prev.getOrElse(KeyState(Map.empty, Long.MinValue))
    val (openAfter, maxTs) = trades.foldLeft((st0.open, st0.maxTs)) {
      case ((open, mx), t) =>
        val ts = t.timestamp.getTime
        // Drop iff the trade's OWN window is already closed-and-emitted
        // (ws + window <= close boundary mx - lateness). Comparing against
        // windowStart(mx) instead would let a too-late trade reopen an
        // emitted window when lateness isn't a multiple of the window
        // size — a duplicate candle under Append. The mx guard avoids
        // Long.MinValue - lateness overflow before any trade is seen.
        if (mx != Long.MinValue &&
            windowStartMs(ts, windowMs) + windowMs <= mx - latenessMs) (open, mx)
        else {
          val ws = windowStartMs(ts, windowMs)
          val buf = open.getOrElse(ws, OhlcAggregator.zero)
          (open.updated(ws, OhlcAggregator.reduce(buf, t)), math.max(mx, ts))
        }
    }
    val closeBefore = maxTs - latenessMs
    val (closed, stillOpen) = openAfter.partition { case (ws, _) =>
      ws + windowMs <= closeBefore
    }
    val candles = closed.toList.sortBy(_._1).map { case (ws, buf) =>
      val (o, h, l, c, v) = OhlcAggregator.finish(buf)
      Candle(base, new Timestamp(ws), new Timestamp(ws + windowMs), o, h, l, c, v)
    }
    (KeyState(stillOpen, maxTs), candles)
  }

  /** Streaming wrapper: trades → closed candles, append semantics. */
  def closedCandles(
      trades: Dataset[Trade],
      windowMs: Long = 60000L,
      latenessMs: Long = 120000L
  ): Dataset[Candle] = {
    import trades.sparkSession.implicits._
    trades
      .groupByKey(_.base)
      .flatMapGroupsWithState[KeyState, Candle](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (base: String, it: Iterator[Trade], state: GroupState[KeyState]) =>
          val (next, out) = advance(base, it, state.getOption, windowMs, latenessMs)
          state.update(next)
          out.iterator
      }
  }
}
