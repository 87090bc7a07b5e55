package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable streaming sources. Kafka is config-only here (the local Spark
  * 4.1.2 toolchain ships no spark-sql-kafka jar — SURVEY.md §1.5); tests
  * drive the pipeline through MemoryStream / file sources, which is possible
  * precisely because OhlcPipeline is a pure DataFrame=>DataFrame.
  */
object SourceFactory {

  /** The reference's subscription-mode heuristic, kept verbatim as observable
    * behavior (reference main.py:80-85): a comma anywhere, or the absence of
    * both `*` and `.`, selects explicit `subscribe`; otherwise
    * `subscribePattern`. Quirk preserved deliberately: a single plain topic
    * containing a dot (e.g. "trades.v1") is routed to PATTERN mode, where the
    * dot matches any character. */
  def subscriptionOption(topics: String): (String, String) =
    if (topics.contains(",") || !(topics.contains("*") || topics.contains(".")))
      ("subscribe", topics)
    else
      ("subscribePattern", topics)

  /** Kafka streaming source with full-history replay (reference
    * main.py:77-87). Requires the kafka connector jar on the cluster. */
  def kafka(spark: SparkSession, bootstrapServers: String, topics: String): DataFrame = {
    val (mode, value) = subscriptionOption(topics)
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option(mode, value)
      .option("startingOffsets", "earliest")
      .load()
  }

  /** File-based source for local/e2e testing: JSON lines with the same
    * (topic, value) shape the Kafka source exposes after the reference's
    * first projection. */
  def jsonDir(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema("topic STRING, value STRING")
      .json(path)
}
