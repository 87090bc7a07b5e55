package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.core.QueryDef.OrderedOut

/** The composed training-data cleaning pipeline — the shape a corpus
  * actually runs before tokenization:
  *
  *   1. quality gate: token-count bounds (degenerate docs out);
  *   2. exact/bag-of-words dedup: keep the lowest doc_id per fingerprint;
  *   3. near-dedup OF THE SURVIVORS: drop the higher id of every
  *      MinHash-LSH pair among the docs stages 1-2 kept.
  *
  * Stage 3 is deliberately scoped to the surviving corpus, not the raw
  * table: shingling docs the quality gate already rejected is wasted work,
  * a doc must not be dropped as the near-dup of a REJECTED doc, and
  * exact-duplicate clusters (stage 2's job, linear) never reach the
  * quadratic band buckets. Each stage is the already-oracled operator from
  * [[Dedup]]; composing them proves the operators chain (the whole pipeline
  * is one Catalyst plan — no intermediate materialization) and the oracle
  * composes the same CTEs over the same survivor scope.
  */
object Pipeline {

  def cleanCorpus(s: SparkSession, d: String,
                  minTokens: Int = 20, maxTokens: Int = 500,
                  nearThreshold: Double = 0.8): DataFrame = {
    graft.expr.GraftFunctions.register(s)
    val docs = Tables.documents(s, d)
      .withColumn("n_tokens", size(TextStats.tokens(col("text"))).cast("long"))
      .filter(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
    val fpKeep = docs
      .withColumn("fp",
        md5(array_join(sort_array(array_distinct(TextStats.tokens(col("text")))), " ")
          .cast("binary")))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // survivors of stages 1-2 (still carrying text for stage 3's shingles)
    val kept = docs.join(fpKeep, "doc_id") // semi-equivalent: fpKeep ids unique
    val nearDrop = Dedup.nearFor(kept, nearThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    kept
      .join(nearDrop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"))
      .orderedBy("doc_id")
  }

  private def oracle(minTokens: Int, maxTokens: Int, nearThreshold: Double): String =
    s"""WITH q AS (
       |  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens,
       |         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
       |  FROM documents),
       |qf AS (SELECT * FROM q WHERE n_tokens >= $minTokens AND n_tokens <= $maxTokens),
       |keepers AS (SELECT min(doc_id) AS doc_id FROM qf GROUP BY fp),
       |kept AS (SELECT qf.* FROM qf JOIN keepers USING (doc_id)),
       |${Dedup.nearOracleCtes(4, 3, source = "kept")},
       |dropped AS (SELECT DISTINCT doc_b AS doc_id FROM pairs
       |            WHERE jaccard >= $nearThreshold)
       |SELECT doc_id, n_tokens FROM kept
       |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
       |ORDER BY doc_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_pipeline_clean" -> QueryDef(cleanCorpus(_, _), Some(oracle(20, 500, 0.8)))
  )
}
