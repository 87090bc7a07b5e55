package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics of the feature-hashing vectorizer on crafted docs. */
class VectorizeSpec extends SparkTestBase {
  import spark.implicits._

  test("hashing vectors: same text same vector, disjoint text differs, norm is exact") {
    val rows = Seq(
      (0L, "alpha beta gamma alpha", "en", "a", 22L),
      (1L, "alpha beta gamma alpha", "en", "a", 22L), // identical text
      (2L, "delta epsilon zeta", "en", "a", 18L))
    val dir = java.nio.file.Files.createTempDirectory("graft-hashvec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Vectorize.hashingVec(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val fs = (1 to Vectorize.dim)
    def vec(id: Long) = fs.map(i => out(id).getLong(i))
    assert(vec(0L) == vec(1L), "identical text must hash to the identical vector")
    assert(vec(0L) != vec(2L), "disjoint vocab must not collide across all buckets")
    // token-count conservation: sum |f_i| <= n_tokens, with equality when
    // no two tokens share a bucket with opposite signs; doc 0 has 3
    // distinct tokens (alpha twice, same bucket+sign -> contributes 2)
    assert(vec(0L).map(math.abs).sum <= 4)
    for (id <- Seq(0L, 2L)) {
      val expected = math.sqrt(vec(id).map(f => f * f).sum.toDouble)
      assert(out(id).getDouble(Vectorize.dim + 1) == expected,
        s"norm of doc $id must be the exact sqrt of the integer square sum")
    }
  }
}
