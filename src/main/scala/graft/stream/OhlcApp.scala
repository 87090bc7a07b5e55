package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ohlc.OhlcPipeline

/** Typed configuration — the reference's 8 env keys, same names
  * (main.py:24-32). The reference's code has no defaults (its fail-fast
  * lives in the docker entrypoint); here missing keys fail fast with the
  * key name. */
final case class OhlcConfig(
    appName: String,
    masterUrl: String,
    bootstrapServers: String,
    subscribeTopics: String,
    outputPrefix: String,
    checkpointLocation: String,
    windowDuration: String,
    watermarkDelay: String,
    debug: Boolean = false
)

object OhlcConfig {
  def fromEnv(env: Map[String, String] = sys.env): OhlcConfig = {
    def req(k: String): String =
      env.getOrElse(k, throw new IllegalArgumentException(
        s"$k environment variable must be set"))
    OhlcConfig(
      appName = req("SPARK_APP_NAME"),
      masterUrl = req("SPARK_MASTER_URL"),
      bootstrapServers = req("KAFKA_BOOTSTRAP_SERVERS"),
      subscribeTopics = req("KAFKA_SUBSCRIBE_TOPICS"),
      outputPrefix = req("KAFKA_OUTPUT_PREFIX"),
      checkpointLocation = req("CHECKPOINT_LOCATION"),
      // no in-code defaults, matching the reference: all 8 keys are
      // required (its fail-fast lives in the docker entrypoint; the
      // .env.example defaults are deployment config, not code)
      windowDuration = req("WINDOW_DURATION"),
      watermarkDelay = req("WATERMARK_DELAY"),
      debug = env.get("GRAFT_DEBUG").contains("true")
    )
  }
}

/** The reference application end-to-end (main.py:70-221): Kafka source with
  * the subscription heuristic → parse → candles → update-mode Kafka sink
  * with an isolated checkpoint, plus (debug only) the reference's four
  * console taps. Blocks on awaitAnyTermination — any query failure ends the
  * app, exactly like the reference.
  *
  * Needs the spark-sql-kafka connector on the classpath — production entry
  * point only; the pipeline stages it wires are the same pure functions the
  * MemoryStream tests execute.
  */
object OhlcApp {

  /** Source rows → candle rows, the full transform chain (pure; no Kafka). */
  def transform(kafkaRows: DataFrame, cfg: OhlcConfig): DataFrame = {
    val trades = OhlcPipeline.parseTrades(
      kafkaRows.selectExpr("topic", "CAST(value AS STRING) AS value"))
    val candles = OhlcPipeline.candles(
      trades, cfg.windowDuration, watermark = Some(cfg.watermarkDelay))
    OhlcPipeline.toKafkaOutput(candles, cfg.outputPrefix)
  }

  def run(spark: SparkSession, cfg: OhlcConfig): Unit = {
    val raw = SourceFactory.kafka(spark, cfg.bootstrapServers, cfg.subscribeTopics)

    if (cfg.debug) {
      // the reference's four console taps (main.py:90-99, 108-117, 139-148,
      // 191-199) — append-mode pre-agg dumps + an update-mode candle dump
      SinkFactory.consoleDebug(
        raw.selectExpr("topic", "CAST(value AS STRING) AS value_str"),
        "debug_kafka_raw", numRows = 3)
      val parsed = OhlcPipeline.parseTrades(
        raw.selectExpr("topic", "CAST(value AS STRING) AS value"))
      SinkFactory.consoleDebug(parsed, "debug_parsed", numRows = 3)
      SinkFactory.consoleDebug(parsed, "debug_raw_trades", numRows = 5)
      SinkFactory.consoleDebug(
        OhlcPipeline.candles(parsed, cfg.windowDuration, Some(cfg.watermarkDelay)),
        "console_debug", mode = "update", numRows = 3)
    }

    SinkFactory.kafka(transform(raw, cfg), cfg.bootstrapServers,
      cfg.checkpointLocation).start()

    spark.streams.awaitAnyTermination()
  }

  def main(args: Array[String]): Unit = {
    val cfg = OhlcConfig.fromEnv()
    val spark = SparkSession.builder()
      .master(cfg.masterUrl)
      .appName(cfg.appName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    run(spark, cfg)
  }
}
