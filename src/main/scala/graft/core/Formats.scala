package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch source/sink formats beyond parquet — the ingestion surface of a
  * training-data pipeline (raw corpora arrive as JSONL/CSV far more often
  * than as parquet). All readers take explicit schemas: schema inference is
  * a full extra pass over 100 TB.
  */
object Formats {

  /** JSONL with malformed-line tolerance: PERMISSIVE mode routes bad lines
    * to `_corrupt_record` instead of failing the job — on a web-scale crawl
    * some fraction of lines is always garbage, and dropping them must be an
    * explicit, countable decision, not a crash. */
  def readJsonl(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read
      .schema(ddl + ", _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Split a tolerant JSONL read into (clean rows, corrupt lines). */
  def partitionCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    (cached.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      cached.filter(col("_corrupt_record").isNotNull).select(col("_corrupt_record")))
  }

  def writeJsonl(df: DataFrame, path: String, codec: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", codec).json(path)

  def readCsv(spark: SparkSession, path: String, ddl: String,
              header: Boolean = true): DataFrame =
    spark.read.schema(ddl).option("header", header.toString).csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Raw text-line ingestion: one row per line (`value: string`) — the
    * lowest common denominator a crawl dump or log corpus arrives in.
    * `wholetext=true` flips to one row per FILE (document-per-file
    * corpora). */
  def readTextLines(spark: SparkSession, path: String,
                    wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(path)

  /** Opaque-file ingestion via the `binaryFile` source: one row per file
    * with (path, modificationTime, length, content: binary) — THE
    * ingestion shape for multimodal payloads (images/audio/video land as
    * files; `content` feeds llm.Multimodal's decode path directly).
    * `pathGlobFilter` prunes by extension at listing time — files that
    * don't match are never opened. */
  def readBinaryFiles(spark: SparkSession, path: String,
                      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** XML ingestion (built into Spark 4 core — no external jar): one row
    * per `rowTag` element, explicit schema (inference is an extra full
    * pass, the house rule). PERMISSIVE mode routes malformed elements to
    * `_corrupt_record` like [[readJsonl]] — feed dumps and sitemap-style
    * corpora always carry some broken markup, and dropping it must be a
    * countable decision. Attributes surface as `_attrname` columns. */
  def readXml(spark: SparkSession, path: String, rowTag: String,
              ddl: String): DataFrame =
    spark.read.format("xml")
      .schema(ddl + ", _corrupt_record STRING")
      .option("rowTag", rowTag)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .load(path)

  def writeXml(df: DataFrame, path: String, rowTag: String,
               rootTag: String): Unit =
    df.write.mode("overwrite").format("xml")
      .option("rowTag", rowTag).option("rootTag", rootTag).save(path)

  /** Union parquet datasets whose schemas drifted (columns added over
    * time): `mergeSchema` reconciles per-file footers into the union
    * schema, nulling absent columns — routine at corpus scale where
    * yesterday's partitions lack today's fields. Off by default in Spark
    * because it reads every footer; turn it on explicitly per read. */
  def readParquetMerged(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
