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
  *   3. near-dedup: drop the higher id of every MinHash-LSH pair.
  *
  * Each stage is the already-oracled operator from [[Dedup]]; composing them
  * proves the operators chain (the whole pipeline is one Catalyst plan — no
  * intermediate materialization) and the oracle composes the same CTEs.
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
    val nearDrop = Dedup.near(s, d, nearThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    docs
      .join(fpKeep, "doc_id") // semi-equivalent: fpKeep is already unique ids
      .join(nearDrop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"))
      .orderedBy("doc_id")
  }

  private def oracle(minTokens: Int, maxTokens: Int, nearThreshold: Double): String =
    s"""${Dedup.nearOracleCtes(4, 3)},
       |q AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
       |  FROM documents),
       |qf AS (SELECT * FROM q WHERE n_tokens >= $minTokens AND n_tokens <= $maxTokens),
       |keepers AS (SELECT min(doc_id) AS doc_id FROM qf GROUP BY fp),
       |dropped AS (SELECT DISTINCT doc_b AS doc_id FROM pairs
       |            WHERE jaccard >= $nearThreshold)
       |SELECT k.doc_id, qf.n_tokens
       |FROM keepers k JOIN qf ON qf.doc_id = k.doc_id
       |WHERE k.doc_id NOT IN (SELECT doc_id FROM dropped)
       |ORDER BY k.doc_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_pipeline_clean" -> QueryDef(cleanCorpus(_, _), Some(oracle(20, 500, 0.8)))
  )
}
