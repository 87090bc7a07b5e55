package graft.tools

import org.apache.spark.sql.functions._

/** The PQ train-sample fraction/recall frontier (the r11 sampling knob's
  * evidence, companion to tools.PqSweep's compression frontier): mean
  * recall@3 across the 20 gauge queries with the Lloyd refinement rounds
  * trained on each md5-prefix fraction of the corpus. 'g' sorts above
  * every hex digit, so it is the full-corpus (no-sampling) row.
  *
  * Usage: sbt "runMain graft.tools.SampleSweep [sfDir]"  (default sf0.01)
  */
object SampleSweep {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = BenchSession.build()
    val fractions = Seq("1" -> "6.25%", "2" -> "12.5%", "4" -> "25%",
      "8" -> "50%", "c" -> "75%", "g" -> "100%")
    println(f"${"hexLt"}%5s ${"fraction"}%8s ${"recall@3"}%9s")
    fractions.foreach { case (hexLt, frac) =>
      val rec = graft.llm.SimilarityPq.pqRecallSample(spark, d, hexLt)
        .agg(avg(col("recall"))).collect().head.getDouble(0)
      println(f"$hexLt%5s $frac%8s $rec%9.4f")
    }
    spark.stop()
  }
}
