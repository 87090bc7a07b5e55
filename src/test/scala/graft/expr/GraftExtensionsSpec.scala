package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** The cluster-deployment registration path docs/DEPLOY.md ships:
  * `spark-submit --conf spark.sql.extensions=graft.expr.GraftExtensions`.
  * `spark.sql.extensions` is a STATIC conf — Spark resolves the class by
  * name at SparkContext setup, so against the suite's existing context the
  * conf route can't re-run; the testable surface is exactly what Spark does
  * with the string: resolve the class reflectively by the documented name,
  * instantiate it as `SparkSessionExtensions => Unit`, and apply it to a
  * session — functions must then resolve from plain SQL with no imperative
  * `GraftFunctions.register` call. */
class GraftExtensionsSpec extends SparkTestBase {

  test("graft.expr.GraftExtensions resolves by its documented name and registers the catalog") {
    assert(!spark.sparkContext.isStopped)
    // the exact string from docs/DEPLOY.md / README, resolved the way
    // Spark's applyExtensions does — a rename breaks deployment docs here
    val hook = Class.forName("graft.expr.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[SparkSessionExtensions => Unit]
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().withExtensions(hook).getOrCreate()
    try {
      assert(s2 ne spark, "builder returned the old session — extensions never applied")
      val dot = s2.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(dot == 11.0)
      val first = s2.sql(
        """SELECT first_by_ordered(t, p) FROM VALUES (9.0D, 2L), (5.0D, 1L) AS v(p, t)""")
        .collect().head.getDouble(0)
      assert(first == 5.0) // earliest t wins
      val shingles = s2.sql("SELECT size(word_shingles(array('a','b','c'), 2, true)) AS n")
        .collect().head.getInt(0)
      assert(shingles == 2)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
