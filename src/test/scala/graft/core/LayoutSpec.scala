package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("writePartitioned: scans on the partition column prune directories") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Layout.writePartitioned(
      Tables.documents(spark, "/root/testdata/sf0.001"), out, "lang")
    val pruned = spark.read.parquet(out).filter(col("lang") === "en")
    // partition pruning is visible in the physical plan…
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"))
    // …and the numbers agree with the unpartitioned source
    val expected = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("bucketed tables: co-located equi-join plans with no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Layout.writeBucketed(
        Tables.orders(spark, "/root/testdata/sf0.001"), "b_orders", 4, "o_custkey")
      Layout.writeBucketed(
        Tables.customer(spark, "/root/testdata/sf0.001"), "b_customer", 4, "c_custkey")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() ==
        Tables.orders(spark, "/root/testdata/sf0.001")
          .join(Tables.customer(spark, "/root/testdata/sf0.001"),
            col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("zorderKey matches the reference Morton interleave and is injective on the grid") {
    def morton(x: Int, y: Int): Long = (0 until 16).map { i =>
      (((x >> i) & 1).toLong << (2 * i)) | (((y >> i) & 1).toLong << (2 * i + 1))
    }.sum
    val grid = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderKey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x.toInt, y.toInt),
        s"($x,$y): got ${got((x, y))}, expected ${morton(x.toInt, y.toInt)}")
    }
    // interleaving distinct (x,y) pairs must give distinct keys
    assert(got.values.toSet.size == grid.size)
    // the quadrant property that makes min/max stats work: all keys of the
    // low-low quadrant sort before any key of the high-high quadrant
    val lowLow = grid.filter(p => p._1 < 8 && p._2 < 8).map(got)
    val highHigh = grid.filter(p => p._1 >= 8 && p._2 >= 8).map(got)
    assert(lowLow.max < highHigh.min)
  }

  test("salted two-phase aggregation equals the plain aggregation on a skewed key") {
    import spark.implicits._
    // 90% of rows share one group key — the salted-agg target
    val df = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val partial = df
      .withColumn("salt", pmod(hash(col("v")), lit(8)))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pc"))
    val salted = partial.groupBy(col("k"))
      .agg(sum(col("ps")).as("s"), sum(col("pc")).as("c"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain && plain.size == 101)
  }

  test("saltedJoin: equals the plain join on a skewed key distribution") {
    // 90% of fact rows share one key — the salting target
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i)).toDF("k", "v")
    val dim = Seq((1L, "hot"), (950L, "cold")).toDF("dk", "name")
    val plain = fact.join(dim, col("k") === col("dk"))
      .select(col("v"), col("name")).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val salted = Layout.saltedJoin(fact, dim, "k", "dk", saltBuckets = 8)
      .select(col("v"), col("name")).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(salted == plain && plain.size == 901)
  }

  test("AQE skew join splits the hot partition (the automatic path saltedJoin backs up)") {
    // At 100 TB the FIRST line of defense against a hot join key is AQE's
    // OptimizeSkewedJoin: the oversized shuffle partition is split into
    // advisory-sized reads, each joined against a replicated copy of the
    // other side — same rewrite as Layout.saltedJoin but decided at
    // RUNTIME from map-output sizes, no salt column. saltedJoin remains
    // for where AQE can't run (stream-static joins). Detection thresholds
    // (256 MB partition floor) never fire at test scale, so this runs in
    // a conf-isolated child session with the floors scaled down —
    // replicating cluster conditions the same way q_join_bloom does.
    // NOTE: the final adaptive plan only materializes on the DataFrame's
    // OWN QueryExecution (collect; a write plans a separate one), and
    // OptimizeSkewedJoin declines when extra shuffles would follow (e.g.
    // a downstream groupBy) unless forceOptimizeSkewedJoin is set.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fact = s2.range(0, 200000).select(
      when(col("id") < 190000, lit(0L)).otherwise(pmod(col("id"), lit(7L))).as("k"),
      concat(lit("payload-payload-payload-payload-"), col("id")).as("v"))
    val dim = s2.range(0, 7).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("dv"))
    val j = fact.join(dim, "k").select(col("k"), col("v"), col("dv"))
    val rows = j.collect()
    assert(rows.length == 200000, "every fact row must match exactly one dim row")
    assert(rows.count(_.getLong(0) == 0L) >= 190000)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true") && plan.contains("skewed"),
      s"AQE did not split the skewed partition:\n$plan")
  }
}
