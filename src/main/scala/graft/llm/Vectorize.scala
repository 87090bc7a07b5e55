package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{OracleSql, QueryDef, Tables}
import graft.core.QueryDef.OrderedOut

/** Feature-hashing document vectorizer (the "hashing trick", Weinberger et
  * al. 2009): every token hashes to one of `dim` buckets with a ±1 sign
  * bit, and the document's vector is the signed bucket-count histogram —
  * a model-free, vocabulary-free embedding that bridges the text tables
  * into the vector operators (dedup, ANN, clustering) deterministically.
  *
  * Everything is EXACT integer arithmetic until the final norm: the hash
  * is the repo's md5-prefix integer (conv of 8 hex chars — the sampling/
  * digest idiom, rebuilt in DuckDB via [[OracleSql.hexPrefixToLong]]),
  * bucket = hv mod dim, sign = bit 16 of hv, features are signed BIGINT
  * sums, and the L2 norm is one sqrt of an exact integer — bit-identical
  * cross-engine with no rounding recipe needed.
  *
  * Scale shape: tokenize + hash fan out map-side; the single exchange
  * carries (doc_id, dim fixed-width partial sums) — partial aggregation
  * collapses each document's tokens before the shuffle, and document
  * bodies never leave the scan. Output is dim feature COLUMNS (not an
  * array) so the driver's column-sorted hash compare applies directly. */
object Vectorize {

  /** Test-scale width; production would use 2^18+ buckets — the operator
    * shape (conditional-sum histogram) is width-independent. */
  val dim = 16

  /** Untrailed core — (doc_id, f1..fdim, nrm) — for composition into the
    * text-side semantic dedup ([[SemDedup.semanticText]]) and the
    * streaming bridge (works unchanged on a streaming frame: explode and
    * hashing are stateless projections, the histogram is one grouped
    * aggregation — exactly the complete-mode streaming shape). */
  private[llm] def hashingFrom(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(TextStats.tokens(col("text"))).as("t"))
    val hv = conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long")
    val hashed = toks.select(col("doc_id"), (hv % dim).as("idx"),
      when(shiftright(hv, 16) % 2 === 1, 1L).otherwise(-1L).as("sgn"))
    val feats = (1 to dim).map(i =>
      sum(when(col("idx") === (i - 1), col("sgn")).otherwise(0L)).as(s"f$i"))
    val sq = (1 to dim).map(i => col(s"f$i") * col(s"f$i")).reduce(_ + _)
    hashed.groupBy(col("doc_id"))
      .agg(feats.head, feats.tail: _*)
      .select(col("doc_id") +: (1 to dim).map(i => col(s"f$i")) :+
        sqrt(sq.cast("double")).as("nrm"): _*)
  }

  /** The f-table as SQL CTEs (tok/hv/sg/f) — the oracle-side twin of
    * [[hashingCore]], shared with the semantic-text dedup oracle. */
  private[llm] def hashingCtes: String = {
    val hv = OracleSql.hexPrefixToLong("h")
    val feats = (1 to dim).map(i =>
      s"CAST(sum(CASE WHEN hv % $dim = ${i - 1} THEN sgn ELSE 0 END) AS BIGINT) AS f$i")
      .mkString(",\n       ")
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |hv AS (
       |  SELECT doc_id, $hv AS hv
       |  FROM (SELECT doc_id, substr(md5(t), 1, 8) AS h FROM tok)),
       |sg AS (
       |  SELECT doc_id, hv,
       |         CASE WHEN (hv // 65536) % 2 = 1 THEN 1 ELSE -1 END AS sgn
       |  FROM hv),
       |f AS (
       |  SELECT doc_id,
       |       $feats
       |  FROM sg GROUP BY doc_id)""".stripMargin
  }

  private[llm] def hashingCore(s: SparkSession, d: String): DataFrame =
    hashingFrom(Tables.documents(s, d))

  def hashingVec(s: SparkSession, d: String): DataFrame =
    hashingCore(s, d).orderedBy("doc_id")

  /** The vectorizer executed by the STREAMING engine (11th bridge):
    * file source over the same documents parquet, AvailableNow,
    * complete-mode aggregation into a memory sink, hash-compared against
    * the IDENTICAL oracle SQL as q_embed_hashing — the newest operator
    * family under the batch ≡ streaming gate like the candle/session/
    * dedup/vocab/join/enrich bridges before it. */
  def hashingStreamed(s: SparkSession, d: String): DataFrame =
    Tables.runStreamComplete(s, "hashvec_streamed_") { cs =>
      hashingFrom(Tables.documentsStream(cs, d))
    }.orderedBy("doc_id")

  private def hashingOracle: String = {
    val sq = (1 to dim).map(i => s"f$i*f$i").mkString(" + ")
    s"""WITH $hashingCtes
       |SELECT doc_id, ${(1 to dim).map(i => s"f$i").mkString(", ")},
       |       sqrt(CAST($sq AS DOUBLE)) AS nrm
       |FROM f ORDER BY doc_id""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "q_embed_hashing" -> QueryDef(hashingVec, Some(hashingOracle)),
    "q_hashvec_streamed" -> QueryDef(hashingStreamed, Some(hashingOracle))
  )
}
