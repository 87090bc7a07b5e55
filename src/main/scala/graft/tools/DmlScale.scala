package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.source.{TradeLogCatalog, TradeLogFormat, TradeLogMaintenance}

/** Tradelog DML scaling measurement (VERDICT r17 #7): the manifest/DML
  * paths had plan-shape guarantees but no measured scale point. For each
  * given dir (pass the ScaleUp control and the x10 decade), build a
  * fresh ts-sorted log from `<dir>/events.parquet` and time one delete
  * per tier:
  *
  *   build       — the DSv2 write itself (baseline for the data size)
  *   delMeta     — covered ts-range DELETE → metadata-only tier
  *                 (expected ~flat: O(touched shards) driver work)
  *   delCowSliv  — sub-block ts sliver → straddling, COW of O(1) blocks
  *                 (expected ~flat: rewrite bounded by the slice)
  *   delCowScat  — scattered predicate (event_id % 101 = 11) in cow mode
  *                 → whole-log COW rewrite (expected ~linear — the write
  *                 amplification MoR exists to remove)
  *   delMorScat  — the same scattered shape on a delmode=mor log →
  *                 delete vectors, zero data-file writes (expected ~the
  *                 predicate SCAN cost alone — reads are irreducible,
  *                 writes are metadata)
  *   optFull     — whole-log OPTIMIZE as a commit (expected ~linear —
  *                 the rewrite IS the data size; the verb exists for
  *                 small serving tables, not archives)
  *   optScope    — ONE-DAY scoped OPTIMIZE (expected ~flat: O(scope)
  *                 read/write + O(intersecting shards) commit — the
  *                 per-partition maintenance shape that replaces optFull
  *                 at archive scale)
  *   planRefs    — a head refs read (the O(#shards) planning cost)
  *
  * One timed run per tier per dir (these are order-of-magnitude decade
  * exponents, not microbenchmarks; the build dominates rep cost).
  * Usage: runMain graft.tools.DmlScale <dir> [dir ...]
  */
object DmlScale {

  private val Fmt = "graft-tradelog"

  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = BenchSession.build()
    val cs = spark.newSession()
    cs.conf.set("spark.sql.catalog.tlog", classOf[TradeLogCatalog].getName)
    println(f"${"dir"}%-12s${"rows"}%10s${"build"}%9s${"delMeta"}%9s" +
      f"${"delCowSliv"}%11s${"delCowScat"}%11s${"delMorScat"}%11s" +
      f"${"optFull"}%9s${"optScope"}%9s${"planRefs"}%9s${"shards"}%7s")
    dirs.foreach { dir =>
      val label = dir.split("/").last.split("_").take(2).mkString("_").take(12)
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      val nRows = ev.count()
      def freshLog(): String = {
        val p = java.nio.file.Files
          .createTempDirectory("graft-dmlscale-").toString
        ev.repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
          .write.format(Fmt).mode("overwrite")
          .option("blockRows", 1024).save(p)
        p
      }
      def rm(p: String): Unit = {
        val (fs, root) = TradeLogFormat.fs(p)
        fs.delete(root, true)
        ()
      }
      // one FRESH log per timed tier: running the deletes sequentially
      // against one log would time each later tier on a log the earlier
      // deletes already shrank, biasing exactly the decade exponents this
      // tool exists to measure (r18 advice)
      val (tBuild, logA) = timed(freshLog())
      val (tMeta, _) = timed(cs.sql(
        s"DELETE FROM tlog.`$logA` WHERE ts < TIMESTAMP '2024-01-05 00:00:00'"))
      rm(logA)
      val logS = freshLog()
      val (tSliv, _) = timed(cs.sql(
        s"DELETE FROM tlog.`$logS` WHERE ts >= TIMESTAMP " +
          "'2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-10 00:00:30'"))
      rm(logS)
      val logC = freshLog()
      val (tCowScat, _) = timed(cs.sql(
        s"DELETE FROM tlog.`$logC` WHERE event_id % 101 = 11"))
      rm(logC)
      val (_, logB) = timed(freshLog())
      TradeLogFormat.setDeleteMode(logB, "mor")
      val (tMorScat, _) = timed(cs.sql(
        s"DELETE FROM tlog.`$logB` WHERE event_id % 101 = 7"))
      val (tPlan, refs) = timed(TradeLogFormat.readManifestRefs(logB))
      rm(logB)
      def tsCluster(df: org.apache.spark.sql.DataFrame) =
        df.repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
      val logO = freshLog()
      val (tOptFull, _) = timed(
        TradeLogMaintenance.optimize(spark, logO, 1024)(tsCluster))
      rm(logO)
      val dayUs = 86400000000L
      val jan10 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
        .getTime * 1000L
      val logP = freshLog()
      val (tOptScope, _) = timed(TradeLogMaintenance.optimizeRange(
        spark, logP, jan10, jan10 + dayUs, 1024)(tsCluster))
      rm(logP)
      println(f"$label%-12s$nRows%10d$tBuild%9.2f$tMeta%9.2f$tSliv%11.2f" +
        f"$tCowScat%11.2f$tMorScat%11.2f$tOptFull%9.2f$tOptScope%9.2f" +
        f"${tPlan * 1000}%7.1fms${refs.shards.size}%7d")
    }
    spark.stop()
  }
}
