package graft

/** Calm-window reference bands for the bench's heavy queries, and the
  * mechanical contention verdict derived from them (VERDICT r19 order
  * sheet #6: the wall-vs-cpu interpretation rule used to live only in
  * BASELINE.md prose — every round the judge and driver re-derived it by
  * hand; now the bench emits a per-query `contended` field).
  *
  * Band semantics, sf0.1 local[32] (the driver's bench shape):
  *   - `wallHi` — the query's calm same-JVM RepeatTimer band's upper
  *     edge (BASELINE.md band tables, rounds 4-20);
  *   - `cpuHi`  — the process-CPU-seconds level of a healthy timed run
  *     (BENCH_DETAIL r19/r20 cpu_sec under steady load).
  *
  * Verdict rule (BASELINE.md "reading the bench detail"): external
  * tenants on the shared box inflate WALL time but not this process's
  * CPU time, so
  *   - wall > 1.4×wallHi AND cpu within 1.35×cpuHi → `true` (contended
  *     window — disregard the wall number, RepeatTimer will clear it);
  *   - wall > 1.4×wallHi AND cpu ALSO blown        → `false` (both
  *     inflated = a real plan/code regression — investigate);
  *   - wall at band                                 → `false`.
  * Queries without a band entry get no verdict (they are the sub-2 s
  * tail where the discriminator has nothing to separate). */
object Bands {
  /** query -> (calm wall upper bound sec, healthy cpu_sec upper bound). */
  val calm: Map[String, (Double, Double)] = Map(
    "q_dedup_cc_streamed"    -> (10.0, 30.0),
    "q_join_outer_streamed"  -> (6.5, 13.0),
    "q_dedup_cc_persisted"   -> (3.6, 9.0),
    "q_sim_ivfpq_recall"     -> (5.6, 10.0),
    "q_join_streamed"        -> (5.2, 14.0),
    "q_dedup_cc_incr"        -> (5.2, 14.0),
    "q_sim_ivfpq"            -> (4.7, 10.5),
    "q_lastk_streamed"       -> (3.9, 18.0),
    "q_sim_ivfpq_rerank"     -> (4.6, 8.0),
    "q_bpe_apply"            -> (4.4, 11.0),
    "q_dedup_cc"             -> (4.3, 9.5),
    "q_dedup_recall"         -> (3.3, 10.0),
    "q_sim_index_compact"    -> (4.2, 7.0),
    "q_dedup_clusters"       -> (4.2, 8.0),
    "q_hh_streamed"          -> (3.8, 7.0),
    "q_sliding_streamed"     -> (3.3, 16.0),
    "q_ttl_streamed"         -> (3.9, 6.0),
    "q_ttl_event_streamed"   -> (3.1, 7.0),
    "q_graph_pagerank"       -> (3.7, 8.5),
    "q_ohlc_multibatch"      -> (3.5, 17.5),
    "q_embed_clusters"       -> (3.5, 6.5),
    "q_cdc_sink_streamed"    -> (3.5, 16.0),
    "q_cdc_streamed"         -> (2.5, 4.0),
    "q_dedup_near"           -> (2.8, 6.0),
    "q_ohlc_update_streamed" -> (3.2, 17.0)
  )

  /** None = no band on file; Some(true) = contended window (wall blown,
    * cpu healthy); Some(false) = at band or genuinely regressed. */
  def contended(name: String, wallSec: Double, cpuSec: Double)
      : Option[Boolean] =
    calm.get(name).map { case (wallHi, cpuHi) =>
      wallSec > 1.4 * wallHi && cpuSec >= 0 && cpuSec <= 1.35 * cpuHi
    }
}
