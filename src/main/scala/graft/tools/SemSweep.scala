package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.SemDedup

/** The SemDeDup cluster-count knob demonstration (BASELINE.md): sweep k
  * and print the within-cluster candidate-pair volume and query latency —
  * the evidence that the pairing quadratic really is bounded per cluster
  * and shrinks ~1/k, which is how the operator scales to a 100 TB corpus
  * (grow k with the corpus so cluster size stays constant). Same-JVM
  * medians, same session shape as RepeatTimer/IvfSweep.
  *
  * Usage: runMain graft.tools.SemSweep [k ...]
  */
object SemSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq
             else Seq(2, 4, 8, 16, 32, 64)
    val sfDir = BenchSession.sfDir
    val spark = BenchSession.build()
    import BenchSession.{medianSec, noop}

    val n = graft.core.Tables.embeddings(spark, sfDir).count()
    val allPairs = n * (n - 1) / 2
    println(f"vectors=$n all_pairs=$allPairs")
    ks.foreach { k =>
      val pairs = SemDedup.candidatePairs(spark, sfDir, k)
        .agg(sum(col("n_pairs"))).first().getLong(0)
      val sec = medianSec(3)(noop(SemDedup.semanticAt(spark, sfDir, k)))
      println(f"k=$k%-3d pairs=$pairs%9d ratio=${pairs.toDouble / allPairs}%.4f " +
        f"expected=${1.0 / k}%.4f sec=$sec%.2f")
    }
    spark.stop()
  }
}
