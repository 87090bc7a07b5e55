package graft.source

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Contract tests for the `graft-tradelog` DataSource V2 connector — the
  * properties the catalog oracles (value-exactness) cannot see:
  * manifest-only visibility, truncate-on-overwrite cleanup, that column
  * pruning and ts-bound pushdown actually reach the planned scan, and
  * that the MicroBatchStream really rate-limits into multiple batches
  * with monotonically advancing offsets. */
class TradeLogSpec extends SparkTestBase {

  private val Fmt = "graft-tradelog"

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-tlog-$tag").toString

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Rows exercising every null slot the codec's mask covers, plus empty
    * and multi-byte strings. */
  private def trickyRows: Seq[Row] = Seq(
    Row(1L, ts("2024-01-01 00:00:00"), 10L, "click", 1.25, """{"a":1}"""),
    Row(null, ts("2024-01-01 00:00:01"), 11L, "view", 2.5, ""),
    Row(3L, null, 12L, "pürch‑äse", null, null),
    Row(4L, ts("2024-01-01 00:00:03"), null, null, 0.0, "p"),
    Row(5L, ts("2024-01-01 00:00:04"), 13L, "", -7.75, """{"β":"ü"}"""),
    Row(null, null, null, null, null, null))

  private def df(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), TradeLogFormat.schema)

  private def canon(d: DataFrame): Set[String] =
    d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  /** The planned TradeLogScan for a frame (pre-AQE sparkPlan — scans are
    * final at plan time). */
  private def scanOf(d: DataFrame): TradeLogScan =
    d.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b.scan
    }.collectFirst { case s: TradeLogScan => s }
      .getOrElse(fail("no TradeLogScan in plan"))

  test("codec round-trip: every null mask slot, empty + multibyte strings") {
    val dir = tmpDir("codec")
    df(trickyRows).write.format(Fmt).mode("overwrite")
      .option("blockRows", 2).save(dir)
    val back = spark.read.format(Fmt).load(dir)
    assert(canon(back) == canon(df(trickyRows)))
    // multiple blocks were actually framed (the round-trip crossed block
    // boundaries, not one degenerate block)
    assert(TradeLogFormat.readManifest(dir).size >= 3)
  }

  test("manifest is the only visibility: uncommitted files are invisible; overwrite truncates") {
    val dir = tmpDir("commit")
    val a = (1L to 10L).map(i =>
      Row(i, ts(f"2024-01-01 00:00:${i}%02d"), i, "a", i.toDouble, "{}"))
    df(a).write.format(Fmt).mode("overwrite").option("blockRows", 4).save(dir)
    val aFiles = TradeLogFormat.readManifest(dir).map(_.file).distinct

    // a stray data file (failed/speculative writer shape) never surfaces
    val (fs, root) = TradeLogFormat.fs(dir)
    val junk = new org.apache.hadoop.fs.Path(root, "part-9-9-junk.gtl")
    val out = fs.create(junk, true)
    out.write(Array.fill[Byte](64)(7)); out.close()
    assert(spark.read.format(Fmt).load(dir).count() == 10)

    // overwrite publishes only the new manifest and deletes the old
    // committed files; readers see exactly the second write
    val b = (11L to 15L).map(i =>
      Row(i, ts(f"2024-01-02 00:00:${i - 11}%02d"), i, "b", i.toDouble, "{}"))
    df(b).write.format(Fmt).mode("overwrite").option("blockRows", 4).save(dir)
    assert(canon(spark.read.format(Fmt).load(dir)) == canon(df(b)))
    aFiles.foreach(f => assert(
      !fs.exists(new org.apache.hadoop.fs.Path(root, f)),
      s"stale committed file survived overwrite: $f"))
  }

  test("column pruning reaches the scan: only selected ordinals are decoded") {
    val dir = tmpDir("prune")
    df(trickyRows).write.format(Fmt).mode("overwrite").save(dir)
    val d = spark.read.format(Fmt).load(dir).select("user_id", "props")
    val scan = scanOf(d)
    assert(scan.readSchema().fieldNames.toSeq == Seq("user_id", "props"))
    assert(scan.wanted.toSeq == Seq(2, 5))
    assert(canon(d) == canon(df(trickyRows).select("user_id", "props")))
  }

  test("ts-bound pushdown skips blocks; residual filters keep results exact") {
    val dir = tmpDir("skip")
    val rows = (0L until 40L).map(i =>
      Row(i, ts(f"2024-01-01 ${i / 10}%02d:00:00"), i, "t", i.toDouble, "{}"))
    // ts-sorted single writer partition -> tight per-block spans
    df(rows).coalesce(1).sortWithinPartitions("ts")
      .write.format(Fmt).mode("overwrite").option("blockRows", 5).save(dir)
    val full = spark.read.format(Fmt).load(dir)
    val sliced = full.filter(
      col("ts") >= lit("2024-01-01 01:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-01 02:00:00").cast("timestamp"))
    val scan = scanOf(sliced)
    assert(scan.allBlocks.size == 8)
    assert(scan.selectedBlocks.size < scan.allBlocks.size,
      s"no block skipped: ${scan.selectedBlocks.size}/${scan.allBlocks.size}")
    assert(sliced.count() == 10)
    // a block with null ts span ("unknown") always survives the skip
    val withNull = trickyRows.filter(_.get(1) == null)
    val dir2 = tmpDir("skip-null")
    df(withNull).write.format(Fmt).mode("overwrite").save(dir2)
    val s2 = scanOf(spark.read.format(Fmt).load(dir2)
      .filter(col("ts") >= lit("2030-01-01").cast("timestamp")))
    assert(s2.selectedBlocks.size == s2.allBlocks.size)
  }

  test("catalog q_tradelog_prune: the planned scan prunes blocks AND columns") {
    val d = "/root/testdata/sf0.001"
    val scan = scanOf(TradeLogQueries.pruneSlice(
      TradeLogQueries.readLog(spark, d)))
    assert(scan.readSchema().fieldNames.sorted.toSeq ==
      Seq("ts", "user_id", "value"))
    assert(scan.selectedBlocks.nonEmpty &&
      scan.selectedBlocks.size < scan.allBlocks.size,
      s"2-day slice should skip blocks: " +
        s"${scan.selectedBlocks.size}/${scan.allBlocks.size}")
  }

  test("micro-batch stream: rate limit yields multiple batches, offsets advance monotonically") {
    val dir = tmpDir("stream")
    val rows = (0L until 30L).map(i =>
      Row(i, ts(f"2024-01-01 00:${i}%02d:00"), i, "s", i.toDouble, "{}"))
    df(rows).coalesce(1).write.format(Fmt).mode("overwrite")
      .option("blockRows", 4).save(dir)
    val nBlocks = TradeLogFormat.readManifest(dir).size
    assert(nBlocks == 8)
    val q = spark.readStream.format(Fmt)
      .option("maxBlocksPerTrigger", 3).load(dir)
      .select("event_id")
      .writeStream.format("memory").queryName("tlog_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    assert(spark.table("tlog_stream").count() == 30)
    val fed = q.recentProgress.filter(_.numInputRows > 0)
    assert(fed.length >= 2,
      s"expected multiple rate-limited batches, got ${fed.length}")
    val ends = q.recentProgress.toSeq
      .flatMap(_.sources.headOption.map(s =>
        TradeLogOffset.fromJson(s.endOffset).block))
    assert(ends == ends.sorted && ends.distinct == ends.filter(_ > 0).distinct,
      s"offsets must advance monotonically: $ends")
    assert(ends.last == nBlocks, s"drain must reach $nBlocks: $ends")
  }

  test("offset json round-trips; malformed json is rejected") {
    assert(TradeLogOffset.fromJson(TradeLogOffset(7).json()).block == 7)
    assert(TradeLogOffset.fromJson(""" { "block" : 12 } """).block == 12)
    intercept[IllegalArgumentException] {
      TradeLogOffset.fromJson("""{"offset":3}""")
    }
  }
}
