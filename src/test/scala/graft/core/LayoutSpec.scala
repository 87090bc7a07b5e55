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
}
