package graft.tools

import org.apache.spark.sql.functions._

/** The PQ compression/recall frontier (VERDICT r9 item 6): mean recall@3
  * across the 20 gauge queries at each (m subspaces, ks codebook entries,
  * Lloyd rounds) configuration, with the code size each implies
  * (m × ceil(log2 ks) bits). Answers "can 8-byte codes do better, and
  * what does recall ≥ 0.5 cost?" with measurements instead of guesses.
  *
  * Usage: sbt "runMain graft.tools.PqSweep [sfDir]"  (default sf0.01)
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = BenchSession.build()
    val configs = Seq(
      // (m, ks, rounds) — current gate default first
      (16, 16, 1), (16, 16, 2), (16, 16, 3),
      (16, 32, 1), (16, 32, 2),
      (16, 64, 1), (16, 64, 2),
      (16, 128, 1), (16, 128, 2),
      (8, 16, 1), (8, 64, 1), (8, 64, 2),
      (32, 16, 1), (32, 16, 2), (32, 64, 2))
    println(f"${"m"}%3s ${"ks"}%4s ${"rounds"}%6s ${"bytes"}%6s ${"compress"}%8s ${"recall@3"}%9s")
    configs.foreach { case (m, ks, r) =>
      val bits = m * (32 - Integer.numberOfLeadingZeros(ks - 1))
      val bytes = ((bits + 7) / 8).toDouble
      val rec = graft.llm.SimilarityPq.pqRecallAt(spark, d, m, ks, r)
        .agg(avg(col("recall"))).collect().head.getDouble(0)
      println(f"$m%3d $ks%4d $r%6d $bytes%6.1f ${256.0 / bytes}%7.1fx $rec%9.4f")
    }
    spark.stop()
  }
}
