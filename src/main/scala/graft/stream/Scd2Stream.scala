package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SCD Type-2 interval build executed by the STREAMING engine — the
  * change-data-capture shape: per key, collapse the event stream into
  * change-point versions with [valid_from, valid_to) millisecond validity,
  * the open (current) version carrying a null valid_to. Runs as
  * flatMapGroupsWithState so the per-key transition is explicit custom
  * state code under the micro-batch planner — the engine surface the
  * built-in windowed aggregation cannot express.
  *
  * Micro-batch contract (the q_dedup_incr_streamed precedent): the bridge
  * feeds a parquet file source with no maxFilesPerTrigger, so AvailableNow
  * delivers the whole corpus in ONE micro-batch and each key's single
  * invocation sees its full event iterator — the emitted set is then
  * exactly the batch answer, adjudicated by the SAME oracle SQL as
  * q_scd2. A continuous deployment would carry the open version in group
  * state and emit closures as later batches advance the key (state is one
  * row per key); on the finite bridge input every version is known at the
  * first and only invocation.
  *
  * Ordering: flatMapGroupsWithState guarantees no intra-group iterator
  * order, so the transition sorts its batch by the FULL microsecond
  * timestamp then event_id — the oracle's ORDER BY ts, event_id — making
  * the output independent of partitioning and iterator order.
  */
object Scd2Stream {

  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long,
                      event_type: String)
  final case class Version(user_id: Long, version: Long, attr: String,
                           valid_from: Long, valid_to: Option[Long])

  private def tsMicros(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** Pure per-key transition — unit-testable without a stream. */
  def versionsOf(uid: Long, evs: Seq[Ev]): Seq[Version] = {
    val sorted = evs.sortBy(e => (tsMicros(e.ts), e.event_id))
    val changes = sorted.foldLeft(Vector.empty[Ev]) { (acc, e) =>
      if (acc.isEmpty || acc.last.event_type != e.event_type) acc :+ e else acc
    }
    changes.zipWithIndex.map { case (e, i) =>
      Version(uid, i + 1L, e.event_type, e.ts.getTime,
        if (i + 1 < changes.size) Some(changes(i + 1).ts.getTime) else None)
    }
  }

  def versions(evs: Dataset[Ev]): Dataset[Version] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[Int, Version](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], _: GroupState[Int]) =>
          versionsOf(uid, it.toIndexedSeq).iterator
      }
  }
}
