package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query over the driver testdata plus (when the
  * semantics are SQL-expressible deterministically) an equivalent DuckDB
  * oracle. Column names MUST match between the two — the driver's compare
  * sorts columns by name before hashing.
  *
  * Determinism rules (SURVEY.md §7.4, proven by q_ohlc_1m in round 1):
  *   - stable ORDER BY on a unique key in both dialects;
  *   - no cross-engine float *arithmetic* in outputs: raw stored doubles are
  *     bit-identical, sums go through exact decimal casts, single IEEE ops
  *     (one multiply/divide) are deterministic, multi-term double summation
  *     is not;
  *   - dp-exactness is PER COLUMN and must be re-verified after any testdata
  *     regen (DeterminismSpec pins it): as of the r10 regen only
  *     `l_quantity` is 2dp-exact; `l_extendedprice`/`l_discount`/`l_tax`/
  *     `o_totalprice` carry >2 decimals on ~10% of rows, so an exact-decimal
  *     lift of those columns must go through an explicit shared round
  *     (`round(c*100)` on BOTH engines), never a bare DECIMAL(x,2) cast
  *     assumed lossless;
  *   - timestamps leave as epoch bigints or formatted strings (events.ts is
  *     ns in DuckDB, µs in Spark).
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = ""
)

object QueryDef {
  /** Deterministic total order for harness-facing output WITHOUT a
    * range-partitioned global sort: `repartition(1)` inserts a shuffle
    * barrier (upstream stays fully parallel), then the single output
    * partition is sorted locally. A plain `.orderBy` plans an Exchange
    * rangepartitioning whose RangePartitioner SAMPLING PASS executes the
    * entire child plan a second time — a systematic 2× tax on every catalog
    * query. Harness-only trailer: at cluster scale the deliverable is the
    * unordered result (the one deliberate global sort is q_topk's
    * TakeOrderedAndProject, which needs no sampling either). */
  implicit final class OrderedOut(private val df: DataFrame) extends AnyVal {
    def orderedBy(cols: String*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols.head, cols.tail: _*)
  }

  /** Pin an iterative trainer's per-round result. Default (`None`):
    * `localCheckpoint` — executor block storage, fast, but LOST with an
    * executor, which kills a long-running cluster train mid-loop. With a
    * `checkpointDir`: RELIABLE checkpoint to that (shared) filesystem
    * path — the cluster deployment rule (docs/DEPLOY.md §iterative
    * trainers); results are identical either way, only durability and
    * write cost differ. The dir is set once per SparkContext; passing a
    * different dir later keeps the first (Spark's checkpoint dir is
    * context-global). */
  def pinRound(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }

  /** Free the executor block storage behind a [[pinRound]]/localCheckpoint
    * frame the caller has superseded. A localCheckpoint pins its blocks
    * via the plan's LogicalRDD node; dropping the Dataset reference only
    * queues reclamation for the ContextCleaner's GC-driven pass, so an
    * iterative fold that swaps in a fresh pin per round/micro-batch
    * accumulates every superseded frame's blocks for the JVM's life under
    * bench pressure (r19 verdict: q_dedup_cc_streamed grew past its band
    * on exactly this). Walks the plan for LogicalRDD leaves and unpersists
    * their RDDs non-blocking — a no-op for reliable-checkpoint pins
    * (file-backed, no block storage) and for never-pinned frames. Call
    * ONLY after every consumer of the frame's blocks has materialized. */
  def freePin(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Pin SEVERAL independent trained artifacts CONCURRENTLY — the
    * optimization guide's "overlap independent jobs" (§2.6) applied to the
    * eager-pin actions queries pay at build time. An iterative trainer's
    * pin runs a chain of tiny jobs (Lloyd rounds over <=16 centroids)
    * interleaved with driver-side planning, so one pin leaves almost every
    * core idle; a query that composes 2-3 INDEPENDENT artifacts (coarse
    * centroids, frozen PQ codebooks, a retrained quantizer) serializes
    * those idle windows back to back. Running each pin from its own thread
    * lets the FIFO scheduler back-fill one artifact's driver gaps and task
    * tails with the others' jobs. Results are identical by construction:
    * every artifact's plan is untouched and deterministic, each
    * materializes exactly once, and no artifact reads another — only the
    * wall-clock overlap changes. Threads inherit the caller's job
    * description/group (Spark locals are InheritableThreadLocal), so UI
    * labels stay right. Failures propagate to the caller. */
  def pinPar(dfs: Seq[DataFrame]): Seq[DataFrame] =
    if (dfs.lengthCompare(2) < 0) dfs.map(_.localCheckpoint(eager = true))
    else {
      val out = new Array[Either[Throwable, DataFrame]](dfs.size)
      val threads = dfs.zipWithIndex.map { case (df, i) =>
        val t = new Thread(
          () => out(i) =
            try Right(df.localCheckpoint(eager = true))
            catch { case e: Throwable => Left(e) },
          s"graft-pin-par-$i")
        t.start(); t
      }
      threads.foreach(_.join())
      out.toSeq.map { case Right(df) => df; case Left(e) => throw e }
    }

  /** Guarded fan-out ahead of md5-heavy per-row stages: parquet can split
    * no finer than row-group boundaries and the driver testdata is written
    * as a single row group, so without this the whole downstream
    * projection runs on ONE task (measured: ~3.2 s of md5 on one core for
    * q_unpivot at sf0.1). At corpus scale the scan splits naturally, the
    * guard sees parts >= cores, and no exchange is added — the check reads
    * split planning only, it runs no job. */
  def fanOut(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // read the scan's own split planning (the source of the partition
    // count) instead of converting the whole frame to an RDD — df.rdd
    // appends a deserializer stage and RDD lineage just to ask this
    // question (r11 advice); fall back to the RDD only for non-file plans
    val parts = df.queryExecution.sparkPlan.collectLeaves().map {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.inputRDD.getNumPartitions
      case _ => df.rdd.getNumPartitions
    }.sum
    if (parts * 2 < cores) df.repartition(cores) else df
  }
}
