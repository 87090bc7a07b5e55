package graft.stream

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** State TTL (transformWithState + TTLConfig) — the physical claims the
  * q_ttl_streamed oracle cannot see:
  *   1. an expired key's state is actually GONE from the store
  *      (numRowsTotal drops across the sweep), not merely filtered on
  *      read — including keys the expiring batch never touched;
  *   2. a key reappearing after expiry restarts its aggregate from zero;
  *   3. without expiry (no sleep past the ttl) the same two-phase run
  *      ACCUMULATES — proving the reset in (2) is the ttl's doing, not
  *      an artifact of the checkpoint-resume plumbing. */
class TtlSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_id", LongType),
    StructField("value", DoubleType)))

  private def stage(rows: Seq[Row], dir: String, mode: String): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode(mode).parquet(dir)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ttl-$tag").toString

  private def latestPerUser(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__phase").desc, col("__bid").desc)
    df.withColumn("pick", row_number().over(w)).filter(col("pick") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("expired state is physically swept (numRowsTotal drops) and reappearing keys restart") {
    val src = tmp("src")
    val ckpt = tmp("ckpt")
    val ttlMs = 500L
    // phase 1: users 1 and 2 (user 1 never returns — only the SWEEP can
    // retire its state; manual in-processor pruning could not)
    stage(Seq(Row(1L, 1L, 1.0), Row(1L, 2L, 2.0), Row(2L, 3L, 5.0)),
      src, "overwrite")
    val (e1, p1) = TwsTtl.runPhase(spark, src, ckpt, schema, ttlMs, 1)
    assert(p1.stateOperators.head.numRowsTotal == 2,
      s"phase 1 must leave both users' state: ${p1.prettyJson}")
    Thread.sleep(4 * ttlMs) // both states now expired by construction
    // phase 2: user 2 reappears, user 3 is new — user 1 is untouched
    stage(Seq(Row(2L, 4L, 7.0), Row(3L, 5L, 11.0)), src, "append")
    val (e2, p2) = TwsTtl.runPhase(spark, src, ckpt, schema, ttlMs, 2)
    // the reset: user 2's aggregate restarts from zero (its phase-1
    // state reads as absent), user 3 starts fresh
    val got = latestPerUser(e1.unionByName(e2))
    assert(got(2L) == (1L, 7000000L),
      s"expired state must read as absent — aggregate restarted: $got")
    assert(got(3L) == (1L, 11000000L))
    assert(got(1L) == (2L, 3000000L), "user 1's last emission is phase-1's")
    // the sweep: user 1's expired row is GONE even though phase 2 never
    // touched it — store total is exactly the two phase-2 writers
    assert(p2.stateOperators.head.numRowsTotal == 2,
      s"expired+untouched state must be swept, not retained: " +
        s"${p2.stateOperators.head.numRowsTotal} rows\n${p2.prettyJson}")
  }

  test("without expiry the same two-phase plumbing accumulates (control run)") {
    val src = tmp("src2")
    val ckpt = tmp("ckpt2")
    val ttlMs = 600000L // 10 minutes: nothing can expire inside this test
    stage(Seq(Row(1L, 1L, 1.0), Row(2L, 2L, 5.0)), src, "overwrite")
    val (e1, _) = TwsTtl.runPhase(spark, src, ckpt, schema, ttlMs, 1)
    stage(Seq(Row(2L, 3L, 7.0)), src, "append")
    val (e2, p2) = TwsTtl.runPhase(spark, src, ckpt, schema, ttlMs, 2)
    val got = latestPerUser(e1.unionByName(e2))
    assert(got(2L) == (2L, 12000000L),
      s"live state must accumulate across the checkpoint resume: $got")
    assert(p2.stateOperators.head.numRowsTotal == 2,
      "no sweep without expiry: both users' state rows remain")
  }
}
