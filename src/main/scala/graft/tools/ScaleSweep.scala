package graft.tools

/** Scaling-curve measurement — the empirical backstop for every "100 TB
  * shape" claim the plan guards assert structurally: each heavy-family
  * representative runs at sf0.001 / sf0.01 / sf0.1 in ONE JVM
  * (BASELINE.md's same-JVM discipline), and the per-decade exponent
  *
  *   e = log10( t(sf_hi) / t(sf_lo) )          (10× data per step)
  *
  * is reported for both legs. e = 1 is linear; e < 1 means fixed
  * per-query overhead (session, plan, stream setup, artifact reads)
  * still dominates at these sizes; e > ~1.2 on the 0.01→0.1 leg names a
  * superlinear stage to diagnose. The small-SF leg is expected to sit
  * deep in overhead (sub-second queries barely move across a decade) —
  * the 0.01→0.1 leg is the signal.
  *
  * Usage: runMain graft.tools.ScaleSweep [reps] [query ...]
  * (defaults: 3 reps, the heavy-family representative set). SF dirs are
  * fixed to /root/testdata/sf{0.001,0.01,0.1}; SPARK_GRAFT_CPUS as in
  * Bench. Build-once artifacts are warmed by the untimed warm-up run,
  * so medians never include a cold artifact build.
  */
object ScaleSweep {

  /** One representative per heavy family (VERDICT r15 "Next round" #1). */
  val DefaultQueries: Seq[String] = Seq(
    "q_dedup_near",       // MinHash-LSH near-dup (band join)
    "q_dedup_ngram",      // inverted-index dedup (capped postings)
    "q_dedup_semantic",   // cluster-scoped semantic dedup
    "q_dedup_cc",         // connected-components clustering
    "q_sim_ivfpq",        // ANN index build + serve (inline)
    "q_sim_ivfpq_persisted", // ANN serve from the persisted index (DPP)
    "q_bm25",             // lexical retrieval (corpus stats + topk)
    "q_retrieval_rrf",    // hybrid RRF (BM25 arm + vector arm)
    "q_ohlc_1m",          // the reference OHLC aggregate
    "q_ohlc_tiered",      // candle-tier build+serve chain
    "q_hh_streamed",      // count-min heavy hitters, streamed fold
    "q_profile_sketch",   // mergeable profile sketches
    "q_tpch_q1",          // scan-heavy hash agg canon
    "q_tpch_q18")         // join-heavy canon (survivor-key broadcast)

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.filter(_.forall(_.isDigit)).map(_.toInt)
      .getOrElse(3)
    val names0 = if (args.exists(a => !a.forall(_.isDigit)))
      args.filter(a => !a.forall(_.isDigit)).toSeq else DefaultQueries
    val sfs = Seq("0.001", "0.01", "0.1")
    val spark = BenchSession.build()
    println(f"${"query"}%-24s ${"sf0.001"}%8s ${"sf0.01"}%8s ${"sf0.1"}%8s " +
      f"${"e(3→2)"}%7s ${"e(2→1)"}%7s")
    names0.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val med = sfs.map { sf =>
        val dir = s"/root/testdata/sf$sf"
        spark.catalog.clearCache()
        System.gc()
        BenchSession.medianSec(reps) { BenchSession.noop(fn(spark, dir)) }
      }
      def e(lo: Double, hi: Double): Double = math.log10(hi / lo)
      println(f"$n%-24s ${med(0)}%8.2f ${med(1)}%8.2f ${med(2)}%8.2f " +
        f"${e(med(0), med(1))}%7.2f ${e(med(1), med(2))}%7.2f")
    }
    spark.stop()
  }
}
