package graft.tools

/** Same-JVM repeated query timing: the only reliable perf signal on a noisy
  * box (BASELINE.md "perf lessons" — cross-JVM bench totals vary ±50%).
  * Usage: runMain graft.tools.RepeatTimer <reps> <query>... with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench. Each query gets one
  * untimed warm-up, then <reps> timed noop-sink writes.
  */
object RepeatTimer {
  def main(args: Array[String]): Unit = {
    val reps = args.head.toInt
    require(reps >= 1, s"reps must be >= 1, got $reps")
    val names = args.tail.toSeq
    val sfDir = BenchSession.sfDir
    val spark = BenchSession.build()
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // per-query isolation, exactly as Bench: without it, block-manager
      // state left by an earlier heavy query inflates this one's reps
      // (measured: q_sample_stratified 5.15s median after the dedup
      // family vs 0.54s isolated — same lesson as BENCH_r04)
      spark.catalog.clearCache()
      System.gc()
      run() // warm-up
      val times = (1 to reps).map(_ => run())
      val s = times.sorted
      // true median: middle element, or mean of the two middles for even n
      val median =
        if (reps % 2 == 1) s(reps / 2) else (s(reps / 2 - 1) + s(reps / 2)) / 2.0
      println(f"$n%-24s ${times.map(t => f"$t%.2f").mkString(" ")}  median=$median%.2f")
    }
    spark.stop()
  }
}
