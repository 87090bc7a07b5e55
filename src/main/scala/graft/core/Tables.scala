package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata (TESTDATA.md / FIXTURES.md).
  *
  * All catalog queries read through here so scan options (and, at cluster
  * scale, bucketing / partition layout hints) live in one place. Parquet +
  * column pruning + predicate pushdown come from the declarative plan — no
  * custom scan code needed (SURVEY.md §4).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark 4 refuses
    * to read as a timestamp. Read nanos as long and truncate to µs (integer
    * DIV — a double division would lose precision above 2^53 ns). DuckDB
    * keeps ns, so oracle SQL must not depend on sub-µs ordering.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set by every
    * session builder in this repo (Verify, Bench, test harness) — kept out of
    * here so a table loader never mutates shared session state.
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events").withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
