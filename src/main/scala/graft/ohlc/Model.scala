package graft.ohlc

import java.sql.Timestamp

/** Typed core model (SURVEY.md §1.5): the post-parse trade row and the
  * candle output record (reference main.py:119-127 / main.py:176-187). */
final case class Trade(
    base: String,
    timestamp: Timestamp,
    price: Double,
    quantity: Double
)

final case class Candle(
    base: String,
    start_ts: Timestamp,
    end_ts: Timestamp,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Double
)
