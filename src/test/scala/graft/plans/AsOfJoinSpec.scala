package graft.plans

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** The native as-of join exec against hand-computed expectations (ties,
  * tolerance, unmatched, null times, multi-partition merges) and against
  * the composed window formulation on real data. */
class AsOfJoinSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // left: (key, t, tag) — repartitioned so the exec's required
  // distribution/ordering genuinely pass through an exchange + sort
  private def leftDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, ts(100), "l1"), (1L, ts(200), "l2"), (1L, ts(200), "l2b"),
      (2L, ts(50), "l3"),  (2L, ts(500), "l4"),
      (3L, ts(10), "l5"),                    // key with no right rows
      (4L, ts(100), "l6")                    // right rows exist but all later
    ).toDF("k", "t", "tag").repartition(3)
  }

  private def rightDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, ts(100), 11L),  // equal ts ⇒ eligible (<= rule)
      (1L, ts(100), 12L),  // equal-ts tie ⇒ HIGHEST rid wins
      (1L, ts(150), 13L),
      (2L, ts(40), 21L), (2L, ts(60), 22L),
      (4L, ts(101), 41L)   // after every left t for key 4
    ).toDF("rk", "rt", "rid").repartition(2)
  }

  private def run(tol: Option[Long]): Map[String, Option[Long]] =
    AsOfJoin.asof(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt",
        rightTies = Seq("rid"), toleranceUs = tol)
      .select(col("tag"), col("rid"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("as-of merge: latest-at-or-before per key, equal-ts tie to highest tie column") {
    val got = run(None)
    assert(got == Map(
      "l1" -> Some(12L), // t=100: rids 11,12 eligible; tie → 12
      "l2" -> Some(13L), "l2b" -> Some(13L),
      "l3" -> Some(21L), "l4" -> Some(22L),
      "l5" -> None, "l6" -> None), s"got $got")
  }

  test("as-of merge: tolerance nulls out stale candidates") {
    // 100s tolerance: l4 (t=500) keeps candidate rid=22 (rt=60) but
    // 440s > 100s ⇒ null; everything in-range is unchanged
    val got = run(Some(100L * 1000000L))
    assert(got("l4").isEmpty, s"expected stale candidate dropped, got ${got("l4")}")
    assert(got("l1") == Some(12L) && got("l2") == Some(13L) && got("l3") == Some(21L))
  }

  test("as-of merge: null times never match and never become candidates") {
    import spark.implicits._
    val l = Seq((1L, Option.empty[Timestamp], "ln"), (1L, Some(ts(100)), "lv"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, Option.empty[Timestamp], 91L), (1L, Some(ts(50)), 92L))
      .toDF("rk", "rt", "rid")
    val got = AsOfJoin.asof(l, r, Seq("k"), Seq("rk"), "t", "rt", Seq("rid"))
      .select(col("tag"), col("rid"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got == Map("ln" -> None, "lv" -> Some(92L)), s"got $got")
  }

  test("native exec plans AsOfJoinExec and agrees with the composed window twin") {
    val d = "/root/testdata/sf0.001"
    val native = graft.queries.Relational.joinAsofNative(spark, d)
    val plan = native.queryExecution.executedPlan
    assert(collectFirst(plan) { case e: AsOfJoinExec => e }.isDefined,
      s"AsOfJoinExec missing from plan:\n$plan")
    assert(collectFirst(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "native path must not plan a Window")
    val composed = graft.queries.Relational.joinAsof(spark, d).collect().toSeq
    assert(native.collect().toSeq == composed,
      "native as-of join diverges from the composed formulation")
  }

  test("tolerance twin agrees with the composed tolerance formulation") {
    val d = "/root/testdata/sf0.001"
    val native = graft.queries.Advanced.joinAsofTolNative(spark, d).collect().toSeq
    val composed = graft.queries.Advanced.joinAsofTolerance(spark, d).collect().toSeq
    assert(native == composed)
  }
}
