package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the per-column dp-exactness assumptions the catalog's determinism
  * doctrine (QueryDef scaladoc) makes about the driver testdata, so the
  * next data regen is caught by `sbt test` instead of a driver hash
  * failure. The r10 regen silently falsified the original "money/qty
  * columns are 2dp-exact" rule: the judge measured ~10-11% of
  * l_extendedprice/l_discount values carrying >2 decimals, while
  * l_quantity stayed exact. What each recipe actually relies on:
  * `round(c*100)` lifts (q_agg_stats, q_outliers) are deterministic on ANY
  * double because both engines round the same stored value; a bare
  * DECIMAL(18,2) cast of an exact column (q_unpivot's l_quantity arm) is
  * lossless; the same cast on an INEXACT column is a shared
  * canonicalization whose cross-engine agreement is empirical (the hash
  * gate verifies it; midpoint-representable doubles like 0.125 are the
  * theoretical divergence and have not appeared in the data).
  */
class DeterminismSpec extends SparkTestBase {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  /** Fraction of rows where c*100 is integral (the stored double is an
    * exact 2dp value). */
  private def inexactCount(dir: String, table: String, c: String): (Long, Long) = {
    val df = table match {
      case "lineitem" => Tables.lineitem(spark, dir)
      case "customer" => Tables.customer(spark, dir)
      case _          => Tables.orders(spark, dir)
    }
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum(when(round(col(c) * 100) =!= col(c) * 100, 1L).otherwise(0L)).as("bad")
    ).collect().head
    (agg.getAs[Long]("bad"), agg.getAs[Long]("n"))
  }

  test("l_quantity is 2dp-exact (q_unpivot's DECIMAL(18,2) arm is lossless only then)") {
    for (d <- dirs) {
      val (bad, n) = inexactCount(d, "lineitem", "l_quantity")
      assert(bad == 0L, s"$d: $bad/$n l_quantity rows carry >2 decimals — " +
        "the exact-lift recipes (QueryDef doctrine) are no longer sound; " +
        "re-verify every round(c*100)/DECIMAL cast before trusting the oracle")
    }
  }

  test("l_extendedprice/l_discount/l_tax/o_totalprice are NOT 2dp-exact " +
      "(doctrine records ~10% >2dp — a regen flipping this must re-open the doc)") {
    for (d <- dirs) {
      val inexact = Seq(
        ("lineitem", "l_extendedprice"), ("lineitem", "l_discount"),
        ("lineitem", "l_tax"), ("orders", "o_totalprice"),
        // r15: TPC-H Q22 lifts c_acctbal through the shared round(x*100)
        // exactly BECAUSE it is not 2dp-exact; a bare DECIMAL cast there
        // would be lossy on ~10% of rows
        ("customer", "c_acctbal"))
      inexact.foreach { case (t, c) =>
        val (bad, n) = inexactCount(d, t, c)
        // If a future regen makes these exact again, this assert fires NOT
        // because anything broke but so the doctrine text and this spec get
        // re-synced to the new data before any recipe starts assuming it.
        assert(bad > 0L, s"$d: $t.$c became 2dp-exact ($bad/$n) — update " +
          "QueryDef's doctrine + this spec to match the regenerated data")
        assert(bad * 5 < n, s"$d: $t.$c majority-inexact ($bad/$n), far from " +
          "the recorded ~10% — the data generator changed shape; re-verify " +
          "the doctrine")
      }
    }
  }
}
