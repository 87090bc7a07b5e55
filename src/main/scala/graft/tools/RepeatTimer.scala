package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM repeated query timing: the only reliable perf signal on a noisy
  * box (BASELINE.md "perf lessons" — cross-JVM bench totals vary ±50%).
  * Usage: runMain graft.tools.RepeatTimer <reps> <query>... with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench. Each query gets one
  * untimed warm-up, then <reps> timed noop-sink writes.
  */
object RepeatTimer {
  def main(args: Array[String]): Unit = {
    val reps = args.head.toInt
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm-up
      val times = (1 to reps).map(_ => run())
      println(f"$n%-24s ${times.map(t => f"$t%.2f").mkString(" ")}  median=${times.sorted.apply(reps / 2)}%.2f")
    }
    spark.stop()
  }
}
