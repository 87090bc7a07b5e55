package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** QueryDef.pinPar — the concurrent twin of the sequential
  * `localCheckpoint(eager = true)` pin (r20 opt, guide §2.6 "overlap
  * independent jobs"): pins N independent artifact plans from N threads.
  * The contract these tests pin: same contents as pinning each frame
  * sequentially (order preserved), results actually ARE checkpointed
  * (lineage cut — consumers read the materialized frame, not the plan),
  * and a failing plan propagates its error to the caller instead of being
  * swallowed by its worker thread. */
class PinParSpec extends SparkTestBase {
  import spark.implicits._

  test("pinPar preserves per-slot contents and order") {
    val a = (1 to 50).toDF("x").withColumn("y", col("x") * 2)
    val b = (1 to 20).toDF("x").agg(sum(col("x")).as("s"))
    val c = Seq("p", "q", "r").toDF("t")
    val pinned = QueryDef.pinPar(Seq(a, b, c))
    assert(pinned.size === 3)
    assert(pinned(0).collect().map(_.getInt(0)).sorted === (1 to 50).toArray)
    assert(pinned(1).collect().head.getLong(0) === 210L)
    assert(pinned(2).collect().map(_.getString(0)).sorted === Array("p", "q", "r"))
  }

  test("pinPar results are materialized (lineage cut to a checkpoint scan)") {
    val df = (1 to 10).toDF("x").filter(col("x") > 3)
    val Seq(p) = QueryDef.pinPar(Seq(df))
    // a localCheckpoint'd frame plans as an ExistingRDD scan, not the
    // original filter lineage
    assert(p.queryExecution.optimizedPlan.collectLeaves()
      .exists(_.getClass.getSimpleName.contains("LogicalRDD")))
    assert(p.count() === 7)
  }

  test("a failing plan propagates to the caller") {
    val ok = (1 to 5).toDF("x")
    val bad = (1 to 5).toDF("x")
      .select(assert_true(col("x") > 10).as("a"), col("x"))
    val e = intercept[Throwable] {
      QueryDef.pinPar(Seq(ok, bad))
    }
    assert(e != null)
  }
}
