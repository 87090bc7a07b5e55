package graft.tools

import org.apache.spark.sql.functions._

/** Scratch isolation probe for the PQ scoring chain (r20 optimization
  * round): times each prefix of the q_sim_pq plan through the noop sink
  * so the expensive stage can be attributed — encode only, encode+recon,
  * full search. Same session recipe as Bench. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = BenchSession.sfDir
    val spark = BenchSession.build()
    graft.expr.GraftFunctions.register(spark)
    import graft.llm.{Similarity, SimilarityPq}

    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-18s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    val enc = SimilarityPq.codedForSpec(spark, sfDir) // (vec_id, cm, c1..cm)
    val m = SimilarityPq.m
    time("encode-only") {
      enc.drop("cm").write.format("noop").mode("overwrite").save()
    }
    time("encode+reconHOF") {
      enc.selectExpr("vec_id",
        (1 to m).map(j =>
          s"element_at(filter(element_at(cm, $j), s -> s.cid = c$j), 1).ce")
          .mkString("concat(", ", ", ") AS recon"))
        .write.format("noop").mode("overwrite").save()
    }
    time("encode+reconNat") {
      enc.selectExpr("vec_id",
        s"pq_recon(cm, array(${(1 to m).map(j => s"c$j").mkString(",")})) AS recon")
        .write.format("noop").mode("overwrite").save()
    }
    time("full-pqTopk") {
      SimilarityPq.pqTopk(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
