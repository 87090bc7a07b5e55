package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Streaming enrichment operators (SURVEY §2.3 extension list — not in the
  * reference, which never joins):
  *
  *  - stream-static join: the standard dimension-enrichment shape. The
  *    static side is broadcast so each micro-batch joins map-side — no
  *    stateful join state, no shuffle of the stream. The static plan is
  *    re-evaluated per micro-batch (Spark's documented semantics), so a
  *    slowly-changing dim backed by a table picks up changes between
  *    batches. For a skewed stream key where broadcast doesn't apply (dim
  *    too big), use [[graft.core.Layout.saltedJoin]] — its doc names this
  *    exact use case, since AQE skew-splitting is unavailable in streaming.
  *
  *  - dropDuplicatesWithinWatermark: at-least-once sources (Kafka with
  *    producer retries) need dedup by event id, but an unbounded
  *    `dropDuplicates` keeps ALL ids in state forever — a 100 TB stream
  *    kills the state store. The within-watermark variant evicts ids once
  *    the watermark passes, bounding state to (rate × delay); a duplicate
  *    arriving within the delay is dropped, later re-sends may re-emit
  *    (the documented trade-off).
  */
object Enrich {

  /** Broadcast the static dim onto a (possibly streaming) fact. */
  def streamStaticJoin(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), key)

  /** Event-id dedup with state bounded by the stream's watermark. The input
    * must already carry a watermark (`withWatermark`). */
  def dedupWithinWatermark(stream: DataFrame, idCols: String*): DataFrame = {
    require(idCols.nonEmpty, "dedupWithinWatermark needs at least one id column")
    stream.dropDuplicatesWithinWatermark(idCols)
  }
}
