package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** The IVF scale-knob demonstration (BASELINE.md): at a fixed centroid
  * count, sweep nprobe and print the recall / candidates-scanned / latency
  * curve — the evidence that the bucketed search's cost really is pruned by
  * ~nprobe/nCentroids while recall climbs to 1. Same-JVM medians, same
  * session shape as RepeatTimer.
  *
  * Usage: runMain graft.tools.IvfSweep [nCentroids] [nprobe ...]
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val nC = args.headOption.map(_.toInt).getOrElse(64)
    val nprobes = if (args.length > 1) args.tail.map(_.toInt).toSeq
                  else Seq(1, 2, 4, 8, 16, 32)
    val (nQueries, k, iters) = (20, 3, 2)
    val sfDir = BenchSession.sfDir
    val spark = BenchSession.build()
    import BenchSession.{medianSec, noop}

    val nVecs = graft.core.Tables.embeddings(spark, sfDir).count()
    val exhaustive = (nVecs - 1) * nQueries // brute-force pairs scored
    val bruteSec = medianSec(3)(noop(Similarity.topkBrute(spark, sfDir, nQueries, k)))
    println(f"vectors=$nVecs nCentroids=$nC nQueries=$nQueries k=$k " +
      f"brute_candidates=$exhaustive brute_sec=$bruteSec%.2f")

    nprobes.foreach { np =>
      val cand = Similarity.ivfCandidates(spark, sfDir, nQueries, nC, np, iters)
        .agg(sum(col("n_cand"))).first().getLong(0)
      val recall = Similarity.annRecall(spark, sfDir, nQueries, k, nC, np, iters)
        .agg(avg(col("recall"))).first().getDouble(0)
      val sec = medianSec(3)(noop(
        Similarity.topkBucketed(spark, sfDir, nQueries, k, nC, np, iters)))
      println(f"nprobe=$np%-3d candidates=$cand%7d scanned_ratio=${
        cand.toDouble / exhaustive}%.4f expected_ratio=${np.toDouble / nC}%.4f " +
        f"recall@$k=$recall%.4f sec=$sec%.2f")
    }
    spark.stop()
  }
}
