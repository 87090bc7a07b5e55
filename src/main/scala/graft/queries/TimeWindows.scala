package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.core.QueryDef.OrderedOut

/** Event-time windowing beyond the reference's single tumbling window
  * (SURVEY §2.3 "not present" list): sliding windows and session windows,
  * both as batch queries so DuckDB can oracle them.
  *
  * Scale: both are single hash-aggregations after a map-side expansion
  * (sliding: ×(window/slide) row fan-out; session: gaps-and-islands via one
  * window over (user, ts)) — no shuffles beyond the grouping exchange.
  */
object TimeWindows {

  /** 5-minute windows sliding by 1 minute over events: each row lands in 5
    * windows (map-side fan-out), then one hash agg. */
  def slidingOhlc(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "5 minutes", "1 minute"),
        col("event_type").as("base"))
      .agg(
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        // exact 6dp-decimal sum, one final double cast (decimal-width
        // canonicalization — Spark 30,6 vs DuckDB 38,6)
        sum(col("value").cast("decimal(20,6)")).cast("double").as("volume"),
        count(lit(1)).as("n")
      )
      .select(unix_timestamp(col("window.start")).as("ws"), col("base"),
        col("high"), col("low"), col("volume"), col("n"))
      .orderedBy("ws", "base")

  /** Session windows per user with a 5-minute inactivity gap. Spark's
    * session ends are exclusive (a gap of exactly the timeout starts a new
    * session); the oracle's gaps-and-islands uses `>=` to match. */
  def sessions(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start"),
        unix_micros(col("session_window.end")).as("sess_end"),
        col("n_events"), col("sum_value"))
      .orderedBy("user_id", "sess_start")

  /** [[sessions]] executed by the STREAMING engine (file source,
    * AvailableNow, complete mode, memory sink — the qOhlcStreamed bridge)
    * and registered against the IDENTICAL oracle SQL: the streaming
    * session-merge state machine (MergingSessionsExec / session state
    * store) answers to the batch gaps-and-islands SQL on every round. */
  def sessionsStreamed(s: SparkSession, d: String): DataFrame =
    Tables.runStreamComplete(s, "session_streamed_") { cs =>
      Tables.eventsStream(cs, d)
        .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"))
        .select(
          col("user_id"),
          unix_micros(col("session_window.start")).as("sess_start"),
          unix_micros(col("session_window.end")).as("sess_end"),
          col("n_events"), col("sum_value"))
    }.orderedBy("user_id", "sess_start")

  /** [[slidingOhlc]] executed by the STREAMING engine (file source,
    * AvailableNow, complete mode, memory sink) against the identical
    * oracle SQL — the sliding-window fan-out (each row in window/slide
    * panes) through the streaming aggregation path, completing the
    * windowed-agg bridge family (tumbling: q_ohlc_streamed, session:
    * q_session_streamed). */
  def slidingStreamed(s: SparkSession, d: String): DataFrame =
    Tables.runStreamComplete(s, "sliding_streamed_") { cs =>
      Tables.eventsStream(cs, d)
        .groupBy(window(col("ts"), "5 minutes", "1 minute"),
          col("event_type").as("base"))
        .agg(
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          sum(col("value").cast("decimal(20,6)")).cast("double").as("volume"),
          count(lit(1)).as("n")
        )
        .select(unix_timestamp(col("window.start")).as("ws"), col("base"),
          col("high"), col("low"), col("volume"), col("n"))
    }.orderedBy("ws", "base")

  /** Stream-stream INTERVAL JOIN under the batch oracle (the 5th — and
    * most failure-prone — streaming bridge): clicks and purchases are two
    * independent streaming readers of the same events data, both
    * watermarked, inner-joined per user with purchase time in
    * [click, click + 10 min]. Append mode + AvailableNow over finite
    * input: every matching pair emits in the batch both sides arrive in
    * (inner-join emission is match-driven; the watermarks only bound join
    * STATE), so the sink holds exactly the batch join — the SQL a
    * [[graft.queries.Relational]] range join would use. 100 TB shape:
    * both sides shuffle on user_id once and state is watermark-bounded to
    * (rate × 10 min + delay) per side — never the stream's history. */
  def joinStreamed(s: SparkSession, d: String): DataFrame =
    Tables.runStreamAppend(s, "join_streamed_") { cs =>
      val c = Tables.eventsStream(cs, d)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 minute")
      val p = Tables.eventsStream(cs, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 minute")
      c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
        .select(col("click_id"), col("p_id"))
    }.orderedBy("click_id", "p_id")

  /** Stream-static ENRICHMENT bridge — [[graft.stream.Enrich
    * .streamStaticJoin]] under the DuckDB oracle: the streaming events
    * fact joins the broadcast nation dim (user → geo via a deterministic
    * key derivation) inside the micro-batch engine, then aggregates per
    * dim attribute in complete mode (25-row state). Each micro-batch
    * joins MAP-SIDE against the re-evaluated static plan — no stateful
    * join state, the stream never shuffles for the join itself. The
    * oracle is the plain batch join+agg SQL, so batch ≡ streaming holds
    * for the tenth bridge: the last §2.3 extension operator outside the
    * driver gate. */
  def enrichStreamed(s: SparkSession, d: String): DataFrame =
    Tables.runStreamComplete(s, "enrich_streamed_") { cs =>
      val ev = Tables.eventsStream(cs, d)
        .select(pmod(col("user_id"), lit(25)).as("nk"), col("value"))
      val dim = Tables.nation(cs, d)
        .select(col("n_nationkey").as("nk"), col("n_name"))
      graft.stream.Enrich.streamStaticJoin(ev, dim, "nk")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_val"))
    }.orderedBy("n_name")

  private val enrichStreamedOracle: String =
    """SELECT n_name, count(*) AS cnt,
      |       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_val
      |FROM events JOIN nation ON user_id % 25 = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  private val joinStreamedOracle: String =
    """WITH c AS (
      |  SELECT event_id AS click_id, user_id,
      |         date_trunc('microseconds', ts) AS c_ts
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT event_id AS p_id, user_id,
      |         date_trunc('microseconds', ts) AS p_ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT click_id, p_id
      |FROM c JOIN p USING (user_id)
      |WHERE p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 10 MINUTE
      |ORDER BY click_id, p_id""".stripMargin

  private val slidingOracle: String =
    """SELECT CAST(epoch(date_trunc('minute', ts) - b.b * INTERVAL 1 MINUTE) AS BIGINT) AS ws,
      |       event_type AS base,
      |       max(value) AS high, min(value) AS low,
      |       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS volume,
      |       count(*) AS n
      |FROM events, range(0, 5) b(b)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    // the streaming join state machine against plain batch-join SQL —
    // batch ≡ streaming as a driver-oracled property
    "q_join_streamed" -> QueryDef(joinStreamed, Some(joinStreamedOracle)),
    "q_enrich_streamed" -> QueryDef(enrichStreamed, Some(enrichStreamedOracle)),
    "q_win_sliding" -> QueryDef(slidingOhlc, Some(slidingOracle)),
    // the streaming sliding-window fan-out against the SAME SQL
    "q_sliding_streamed" -> QueryDef(slidingStreamed, Some(slidingOracle)),
    "q_win_session" -> QueryDef(sessions, Some(sessionOracle)),
    // the streaming session-merge engine against the SAME gaps-and-islands
    // SQL — batch ≡ streaming as a driver-oracled property (see
    // q_ohlc_streamed for the tumbling-window twin)
    "q_session_streamed" -> QueryDef(sessionsStreamed, Some(sessionOracle))
  )

  private lazy val sessionOracle: String =
    """WITH e AS (
      |  SELECT user_id, date_trunc('microseconds', ts) AS ts, value
      |  FROM events),
      |m AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |g AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m)
      |SELECT user_id,
      |       epoch_us(min(ts)) AS sess_start,
      |       epoch_us(max(ts)) + 300000000 AS sess_end,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, sess_start""".stripMargin
}
