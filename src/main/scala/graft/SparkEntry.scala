package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ohlc.OhlcPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is deterministic (stable ORDER BY on unique keys,
  * doubles rounded) so the driver's DuckDB hash-compare is stable; the
  * matching `oracleSql` uses identical output column names (the compare sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Catalog.qOhlc1m(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}

/** The query catalog: name → (spark, sfDir) => DataFrame, plus DuckDB oracle
  * SQL. Grouped by SURVEY.md §2 category. */
object Catalog {

  /** q_ohlc_1m — the reference's spine as a batch query over `events`
    * (ts ↔ trade timestamp, value ↔ price, event_type ↔ base; FIXTURES.md).
    * Window starts emitted as epoch seconds (bigint) to dodge the
    * ns-vs-µs timestamp mismatch between DuckDB and Spark (SURVEY §7.4.3).
    */
  def qOhlc1m(spark: SparkSession, dir: String): DataFrame = {
    val candles = OhlcPipeline.candles(
      Tables.events(spark, dir),
      windowDuration = "1 minute",
      tsCol = "ts", priceCol = "value", qtyCol = "value", symbolCol = "event_type"
    )
    candles.select(
      unix_timestamp(col("start_ts")).as("ws"),
      col("base"),
      round(col("open"), 6).as("open"),
      round(col("high"), 6).as("high"),
      round(col("low"), 6).as("low"),
      round(col("close"), 6).as("close"),
      round(col("volume"), 4).as("volume")
    ).orderBy("ws", "base")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ohlc_1m" -> (qOhlc1m _)
  )

  val oracleSql: Map[String, String] = Map(
    "q_ohlc_1m" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS ws,
        |       event_type AS base,
        |       round(first(value ORDER BY ts, value), 6) AS open,
        |       round(max(value), 6) AS high,
        |       round(min(value), 6) AS low,
        |       round(last(value ORDER BY ts, value), 6) AS close,
        |       round(sum(value), 4) AS volume
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
