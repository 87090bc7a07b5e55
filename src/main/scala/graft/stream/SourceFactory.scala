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

  /** The exact reader option map the reference sets (main.py:77-87),
    * exposed as data so it stays golden-testable without a broker or the
    * kafka connector jar (KafkaWiringSpec pins every key and value against
    * the reference's literals — the only part of the Kafka path this
    * environment can execute). */
  def kafkaSourceOptions(bootstrapServers: String, topics: String): Seq[(String, String)] = {
    val (mode, value) = subscriptionOption(topics)
    Seq(
      "kafka.bootstrap.servers" -> bootstrapServers,
      mode -> value,
      "startingOffsets" -> "earliest")
  }

  /** Kafka streaming source with full-history replay (reference
    * main.py:77-87). Requires the kafka connector jar on the cluster. */
  def kafka(spark: SparkSession, bootstrapServers: String, topics: String): DataFrame =
    kafkaSourceOptions(bootstrapServers, topics)
      .foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }
      .load()

  /** File-based source for local/e2e testing: JSON lines with the same
    * (topic, value) shape the Kafka source exposes after the reference's
    * first projection. */
  def jsonDir(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema("topic STRING, value STRING")
      .json(path)
}
