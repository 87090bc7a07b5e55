package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Golden-value checks on the relational catalog at sf0.001 — the DuckDB
  * oracle proves cross-engine agreement; these pin a handful of absolute
  * values so a bug that broke BOTH sides identically (e.g. a wrong filter in
  * a shared constant) would still surface. */
class RelationalGoldenSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("q_join_broadcast: all 25 nations, 5 regions, keys intact") {
    val rows = Relational.joinBroadcast(spark, d).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[Int]("n_nationkey")).toSeq == (0 until 25))
    assert(rows.map(_.getAs[String]("r_name")).distinct.length == 5)
  }

  test("q_sketch_merge: merged daily registers equal the direct whole-corpus sketch") {
    // register state is a max-monoid: max over (day, bucket) partials ==
    // max over the raw stream, so the merged estimate must be EXACTLY the
    // single-pass estimate — the property that makes persisted daily
    // sketch tables sound
    import org.apache.spark.sql.functions._
    val m = 64
    val daily = Relational.dailySketch(graft.core.Tables.events(spark, d), m)
    val merged = daily.groupBy(col("event_type"), col("bucket"))
      .agg(max(col("reg")).as("reg"))
    // direct sketch: same register chain with NO intermediate day level
    val h = conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val direct = graft.core.Tables.events(spark, d)
      .select(col("event_type"), h.as("h"))
      .withColumn("bucket", col("h") % m)
      .withColumn("w", expr(s"h DIV $m"))
      .withColumn("rho",
        when(col("w") === 0, lit(27)).otherwise(lit(27) - length(bin(col("w")))))
      .groupBy(col("event_type"), col("bucket")).agg(max(col("rho")).as("reg"))
    val a = merged.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val b = direct.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
    // and the catalog query's estimates are within the FM-sketch error
    // envelope of the exact counts
    val est = Relational.sketchMerge(spark, d).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = graft.core.Tables.events(spark, d)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // envelope only where the FM estimator is in regime (n >= 2m; below
    // that the uncorrected formula over-estimates — linear counting's
    // territory, not what this operator ships)
    exact.filter(_._2 >= 2L * m).foreach { case (k, n) =>
      assert(math.abs(est(k) - n) / n <= 0.35,
        s"$k: est ${est(k)} vs exact $n out of envelope")
    }
  }

  test("q_rollup: grand-total row aggregates everything") {
    val rows = Relational.rollupQ(spark, d).collect()
    val grand = rows.filter(r => r.getAs[String]("rf") == "ALL" &&
      r.getAs[String]("ls") == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("cnt") == 6000L) // lineitem rows at sf0.001
    assert(grand.head.getAs[Int]("g_rf") == 1 && grand.head.getAs[Int]("g_ls") == 1)
    // rollup never produces the (rf=ALL, ls=concrete) combination
    assert(!rows.exists(r => r.getAs[String]("rf") == "ALL" &&
      r.getAs[String]("ls") != "ALL"))
  }

  test("q_cube includes the ls-marginal rows rollup omits") {
    val rows = Relational.cubeQ(spark, d).collect()
    assert(rows.exists(r => r.getAs[String]("rf") == "ALL" &&
      r.getAs[String]("ls") != "ALL"))
  }

  test("set ops are consistent: |A∪B| = |A| + |B| - |A∩B|, |A\\B| = |A| - |A∩B|") {
    val u = Relational.unionQ(spark, d).count()
    val i = Relational.intersectQ(spark, d).count()
    val e = Relational.exceptQ(spark, d).count()
    val a = graft.core.Tables.customer(spark, d)
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING").count()
    val b = graft.core.Tables.orders(spark, d)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
      .select("o_custkey").distinct().count()
    assert(u == a + b - i)
    assert(e == a - i)
  }

  test("q_topk is the true global top-10 (agrees with a full sort)") {
    val topk = Relational.topk(spark, d).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Double]("o_totalprice")))
    val full = graft.core.Tables.orders(spark, d).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Double]("o_totalprice")))
      .sortBy { case (k, p) => (-p, k) }.take(10)
    assert(topk.toSeq == full.toSeq)
  }

  test("q_join_asof: every asof click precedes its purchase for that user") {
    // join result back to raw events and check the invariant directly
    val ev = graft.core.Tables.events(spark, d)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
          r.getAs[String]("event_type")))).toMap
    val out = Relational.joinAsof(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (pu, pts, pty) = ev(r.getAs[Long]("event_id"))
      assert(pty == "purchase")
      if (!r.isNullAt(r.fieldIndex("asof_click_id"))) {
        val (cu, cts, cty) = ev(r.getAs[Long]("asof_click_id"))
        assert(cty == "click" && cu == pu && !cts.after(pts))
      }
    }
  }

  test("q_unpivot: 4 measure rows per lineitem, values match the wide columns") {
    val n = graft.core.Tables.lineitem(spark, d).count()
    val out = Advanced.unpivotLong(spark, d)
    assert(out.count() == 4 * n)
    val measures = out.select("measure").distinct().collect()
      .map(_.getString(0)).toSet
    assert(measures ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    // spot-check one line's four values against the wide row
    val wide = graft.core.Tables.lineitem(spark, d)
      .orderBy("l_orderkey", "l_linenumber").limit(1).collect().head
    val (ok, ln) = (wide.getAs[Long]("l_orderkey"), wide.getAs[Int]("l_linenumber"))
    val long = out
      .filter(org.apache.spark.sql.functions.col("l_orderkey") === ok)
      .filter(org.apache.spark.sql.functions.col("l_linenumber") === ln)
      .collect().map(r => r.getAs[String]("measure") -> r.getAs[Double]("val")).toMap
    assert(long("l_quantity") == wide.getAs[Double]("l_quantity"))
    assert(long("l_tax") == wide.getAs[Double]("l_tax"))
    // the digest keeps the full long-form row count per measure
    val digest = Advanced.unpivotQ(spark, d).collect()
      .map(r => r.getAs[String]("measure") -> r.getAs[Long]("n")).toMap
    assert(digest.keySet == measures && digest.values.forall(_ == n), s"$digest")
  }
}
