package graft.ohlc

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass OHLCV state: first/last carry the (ts, price) ordering key so
  * merge stays associative and commutative under the reference tie rule
  * (lexicographic (ts, price) — lowest price opens, highest closes a tie). */
final case class OhlcBuf(
    firstTs: Long, firstP: Double,
    lastTs: Long, lastP: Double,
    high: Double, low: Double, volume: Double, n: Long
)

/** Typed single-pass OHLCV for the `Dataset[Trade]` API — the
  * `Aggregator[IN, BUF, OUT]` counterpart of the untyped
  * `expr.OrderedFirstLast` Catalyst aggregate (same semantics, one buffer
  * for the whole candle instead of one per bound). Use via
  * `ds.groupByKey(...).agg(OhlcAggregator.toColumn)`; windowing stays the
  * caller's concern (group key = (window start, base)). */
object OhlcAggregator extends Aggregator[Trade, OhlcBuf, (Double, Double, Double, Double, Double)] {

  override def zero: OhlcBuf =
    OhlcBuf(Long.MaxValue, Double.MaxValue, Long.MinValue, Double.MinValue,
      Double.NegativeInfinity, Double.PositiveInfinity, 0.0, 0L)

  private def lt(ts1: Long, p1: Double, ts2: Long, p2: Double): Boolean =
    ts1 < ts2 || (ts1 == ts2 && p1 < p2)

  override def reduce(b: OhlcBuf, t: Trade): OhlcBuf = {
    val ts = t.timestamp.getTime
    merge(b, OhlcBuf(ts, t.price, ts, t.price, t.price, t.price, t.quantity, 1L))
  }

  override def merge(a: OhlcBuf, b: OhlcBuf): OhlcBuf = {
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else OhlcBuf(
      if (lt(a.firstTs, a.firstP, b.firstTs, b.firstP)) a.firstTs else b.firstTs,
      if (lt(a.firstTs, a.firstP, b.firstTs, b.firstP)) a.firstP else b.firstP,
      if (lt(a.lastTs, a.lastP, b.lastTs, b.lastP)) b.lastTs else a.lastTs,
      if (lt(a.lastTs, a.lastP, b.lastTs, b.lastP)) b.lastP else a.lastP,
      math.max(a.high, b.high), math.min(a.low, b.low),
      a.volume + b.volume, a.n + b.n)
  }

  /** (open, high, low, close, volume) */
  override def finish(b: OhlcBuf): (Double, Double, Double, Double, Double) =
    (b.firstP, b.high, b.low, b.lastP, b.volume)

  override def bufferEncoder: Encoder[OhlcBuf] = Encoders.product[OhlcBuf]
  override def outputEncoder: Encoder[(Double, Double, Double, Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
      Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble)
}
