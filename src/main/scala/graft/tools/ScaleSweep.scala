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
    // args: digits = reps; "/..." = EXTRA sf dirs appended as further
    // decades (e.g. the ScaleUp synthetic sf1); anything else = query
    val extraDirs = args.filter(_.contains("/")).toSeq
    val names0 = if (args.exists(a => !a.forall(_.isDigit) && !a.contains("/")))
      args.filter(a => !a.forall(_.isDigit) && !a.contains("/")).toSeq
    else DefaultQueries
    // label = first two underscore segments of the dir name, so the
    // ScaleUp control (graft_x1_<fp>) and decade (graft_x10_<fp>) stay
    // distinguishable in the header (r17 review finding)
    val dirs = Seq("0.001", "0.01", "0.1").map(sf =>
      (s"sf$sf", s"/root/testdata/sf$sf")) ++
      extraDirs.map(d => (d.split("/").last.split("_").take(2)
        .mkString("_").take(10), d))
    val spark = BenchSession.build()
    println((f"${"query"}%-24s" +:
      dirs.map { case (l, _) => f"$l%9s" }).mkString +
      dirs.sliding(2).map(p =>
        f"${s"e(${p.head._1.stripPrefix("sf")}→${p.last._1.stripPrefix("sf")})"}%12s")
        .mkString)
    names0.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val med = dirs.map { case (_, dir) =>
        spark.catalog.clearCache()
        System.gc()
        BenchSession.medianSec(reps) { BenchSession.noop(fn(spark, dir)) }
      }
      def e(lo: Double, hi: Double): Double = math.log10(hi / lo)
      println((f"$n%-24s" +: med.map(m => f"$m%9.2f")).mkString +
        med.sliding(2).map(p => f"${e(p.head, p.last)}%12.2f").mkString)
    }
    spark.stop()
  }
}
