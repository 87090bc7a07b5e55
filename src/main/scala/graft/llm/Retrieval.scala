package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.core.QueryDef.OrderedOut

/** Ranked LEXICAL retrieval — the sparse half of a corpus search stack
  * (the dense half is the ANN family in [[Similarity]]/[[SimilarityPq]]).
  * The reference pipeline has no retrieval operator; a training-data
  * platform needs one for decontamination lookups, targeted corpus
  * slicing, and quality probes ("which documents match this query, best
  * first").
  *
  * Okapi BM25 (Robertson/Sparck Jones, the public formula; k1 = 1.2,
  * b = 0.75):
  *
  *   score(D, Q) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
  *   idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  *
  * Scale design — the whole query is two corpus-stationary passes and no
  * wide row ever moves:
  *   1. ONE narrow projection computes, per document, its length and the
  *      per-term tf via `filter()` over the tokenized array — no explode,
  *      no (doc, token) shuffle, no join against an inverted index. The
  *      term list is a query-time literal, so Catalyst folds it into the
  *      projection and whole-stage codegen runs it in the scan stage.
  *   2. ONE one-row global aggregate gathers every corpus statistic BM25
  *      needs (N, Σ|D|, df per term) and broadcasts it back; scoring is
  *      then another map-side projection. The only shuffle in the plan is
  *      that one-row partial→final aggregate.
  *   3. Top-k is TakeOrderedAndProject — per-partition heaps, no global
  *      sort, no RangePartitioner sampling pass.
  *
  * Cross-engine determinism: the score mixes ln() (libm — may differ from
  * the JVM by an ulp) into otherwise-identical IEEE arithmetic, so each
  * per-term component is ROUNDED to 10 decimals and cast to an exact
  * DECIMAL before the (fixed 3-term, expression-tree-ordered) sum; the
  * ranking therefore never hinges on summation order or a final-ulp
  * disagreement, and near-ties become exact ties broken on doc_id. The
  * emitted score is the exact decimal sum canonicalized to double once —
  * the q_ohlc_1m volume discipline.
  */
object Retrieval {

  /** Query terms — corpus-vocabulary literals (TESTDATA.md word soup). */
  private val terms = Seq("spark", "join", "window")
  private val K = 20

  /** Per-term BM25 component with the exact parenthesization the oracle
    * repeats verbatim; tf = 0 short-circuits to 0 so absent terms never
    * touch ln(). Every fractional literal is CAST(... AS DOUBLE) because
    * the bare spelling is DECIMAL in BOTH dialects and the two engines'
    * decimal division widths differ — double arithmetic with an identical
    * operation tree is the cross-engine-stable form (1 − b is pre-folded
    * to 0.25 so neither engine folds it differently). */
  private def comp(t: String): String =
    s"CASE WHEN tf_$t = 0 THEN CAST(0 AS DECIMAL(28,10)) ELSE " +
      s"CAST(round(ln(1 + (n - df_$t + CAST(0.5 AS DOUBLE)) / (df_$t + CAST(0.5 AS DOUBLE))) * " +
      s"(tf_$t * CAST(2.2 AS DOUBLE)) / (tf_$t + CAST(1.2 AS DOUBLE) * " +
      s"(CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)), 10) " +
      s"AS DECIMAL(28,10)) END"

  /** Tokenize once; dl + per-term tf in one codegen'd projection. */
  private def perDocTf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
    .select(col("doc_id") +: expr("size(toks)").cast("long").as("dl") +:
      terms.map(t => expr(s"size(filter(toks, x -> x = '$t'))")
        .cast("long").as(s"tf_$t")): _*)

  /** Every corpus statistic BM25 needs (N, Σ|D|, df per term) in ONE
    * one-row aggregate — the broadcastable "index" artifact. */
  private def statsOf(perDoc: DataFrame): DataFrame = {
    val statCols = count(lit(1)).as("n") +: sum(col("dl")).as("sdl") +:
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    perDoc.agg(statCols.head, statCols.tail: _*)
      .withColumn("avgdl", expr("CAST(sdl AS DOUBLE) / n"))
  }

  /** Map-side scoring of a (possibly streaming) per-doc tf frame against
    * frozen stats: an equi-join on a constant key (BroadcastHashJoin —
    * stream-static supported) then one projection. */
  private def scoreAgainst(perDoc: DataFrame, stats: DataFrame): DataFrame =
    perDoc.withColumn("one", lit(1))
      .join(broadcast(stats.withColumn("one", lit(1))), "one")
      .withColumn("score_dec", expr(terms.map(comp).mkString(" + ")))
      .withColumn("n_hit",
        expr(terms.map(t => s"CAST(tf_$t > 0 AS INT)").mkString(" + "))
          .cast("long"))
      .filter(col("n_hit") > 0)

  def bm25(s: SparkSession, d: String, k: Int = K): DataFrame = {
    val perDoc = perDocTf(Tables.documents(s, d))
    val scored = scoreAgainst(perDoc, statsOf(perDoc))
    scored
      .orderBy(col("score_dec").desc, col("doc_id"))
      .limit(k) // TakeOrderedAndProject: distributed top-k, no global sort
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score_dec").desc, col("doc_id")))
          .cast("long").as("rnk"), // 20-row window, post-limit
        col("doc_id"), col("dl"), col("n_hit"),
        col("score_dec").cast("double").as("score"))
      .orderedBy("rnk")
  }

  private def bm25Oracle(k: Int = K): String = {
    val tfCols = terms.map(t =>
      s"len(list_filter(toks, x -> x = '$t')) AS tf_$t").mkString(",\n|            ")
    val dfCols = terms.map(t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n|          ")
    val compSql = terms.map(comp).mkString("\n|              + ")
    val nHit = terms.map(t => s"CAST(tf_$t > 0 AS INT)").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |p AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |            $tfCols
       |      FROM t),
       |g AS (SELECT count(*) AS n, sum(dl) AS sdl,
       |          $dfCols,
       |          CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
       |      FROM p),
       |sc AS (SELECT doc_id, dl,
       |              $compSql AS score_dec,
       |              CAST($nHit AS BIGINT) AS n_hit
       |       FROM p, g),
       |top AS (SELECT * FROM sc WHERE n_hit > 0
       |        ORDER BY score_dec DESC, doc_id LIMIT $k)
       |SELECT CAST(row_number() OVER (ORDER BY score_dec DESC, doc_id) AS BIGINT) AS rnk,
       |       doc_id, dl, n_hit, CAST(score_dec AS DOUBLE) AS score
       |FROM top ORDER BY rnk""".stripMargin
  }

  /** All matching documents with their BM25 score — the scoring surface
    * without the top-k trailer, and the batch twin the streaming bridge
    * hash-compares against. */
  def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val perDoc = perDocTf(Tables.documents(s, d))
    scoredOut(scoreAgainst(perDoc, statsOf(perDoc)))
  }

  private def scoredOut(scored: DataFrame): DataFrame =
    scored.select(col("doc_id"), col("dl"), col("n_hit"),
      col("score_dec").cast("double").as("score"))
      .orderedBy("doc_id")

  /** BM25 scoring executed by the STREAMING engine (16th bridge — the
    * retrieval SERVING shape): corpus statistics are trained once on the
    * static table (the frozen index artifact every search tier ships),
    * then the document stream is scored STATELESSLY — per-term tf
    * projection, broadcast stats join, score expression — in append mode
    * with no watermark and no state store, the plan a production scorer
    * runs indefinitely. AvailableNow over the same parquet makes the
    * emitted set exactly the batch answer, adjudicated by the identical
    * oracle SQL as q_bm25_scored. */
  def bm25Streamed(s: SparkSession, d: String): DataFrame =
    Tables.runStreamAppend(s, "bm25_streamed_") { cs =>
      val stats = statsOf(perDocTf(Tables.documents(cs, d)))
      val stream = perDocTf(Tables.documentsStream(cs, d))
      scoreAgainst(stream, stats)
        .select(col("doc_id"), col("dl"), col("n_hit"),
          col("score_dec").cast("double").as("score"))
    }.orderedBy("doc_id")

  /** Query-TABLE BM25 (VERDICT r12 item 6): real retrieval scores a small
    * frame of (qid, term) queries, not compile-time literals. Scale
    * shape — the corpus-side cost is INDEPENDENT of the query count:
    *   1. the query table and its distinct-term vocabulary ride one-row /
    *      vocab-sized broadcasts (collect_set folds the tiny term list —
    *      never corpus data — into a single broadcast row);
    *   2. ONE corpus pass builds the hit table: tokenize, HOF-filter each
    *      doc's tokens to the vocabulary (map-side, codegen), explode
    *      only the MATCHED tokens — the exchange carries (doc, term)
    *      partial counts for matching terms, a vanishing fraction of the
    *      corpus (the inverted-index posting rows, built on the fly);
    *   3. stats stay the frozen-index artifacts: one one-row (N, Σ|D|)
    *      aggregate + a vocab-sized df table, both broadcast back;
    *   4. scoring joins the hit table ONLY against broadcasts, so adding
    *      queries adds broadcast-join fan-out on hit rows, zero new
    *      corpus scans; per-query top-k is a window over hit rows keyed
    *      on qid.
    * Determinism: per-(term, doc) components round to DECIMAL(28,10)
    * before the per-(qid, doc) SUM — decimal summation is exact and
    * order-independent, so the dynamic-term-set fold (unlike [[bm25]]'s
    * fixed 3-term expression tree) still never hinges on order; ties
    * break on doc_id. */
  def bm25Multi(s: SparkSession, d: String, k: Int = 5): DataFrame =
    bm25MultiRanked(s, d)
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("doc_id"), col("dl"), col("n_hit"),
        col("score_dec").cast("double").as("score"))
      .orderedBy("qid", "rnk")

  /** The pre-top-k ranked frame behind [[bm25Multi]] — split out so the
    * hybrid fusion ([[hybridRrf]]) can take its sparse arm from the
    * identical rank chain. */
  private def bm25MultiRanked(s: SparkSession, d: String): DataFrame =
    bm25MultiRankedFrom(s, Tables.documents(s, d))

  /** [[bm25MultiRanked]] over an explicit (doc_id, text) frame — the
    * composition point the streaming fusion bridge scores its
    * micro-batch through. */
  private def bm25MultiRankedFrom(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val qterms = multiQueries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "term")
    val vocabRow = qterms.agg(collect_set(col("term")).as("vocab"))
    val docsTok = docs
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
    val stats = docsTok
      .agg(count(lit(1)).as("n"), sum(size(col("toks")).cast("long")).as("sdl"))
      .withColumn("avgdl", expr("CAST(sdl AS DOUBLE) / n"))
    val hits = docsTok.crossJoin(broadcast(vocabRow))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(filter(col("toks"), t => array_contains(col("vocab"), t)))
          .as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfr = hits.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val comp = expr(
      "CAST(round(ln(1 + (n - df_t + CAST(0.5 AS DOUBLE)) / (df_t + CAST(0.5 AS DOUBLE))) * " +
        "(tf * CAST(2.2 AS DOUBLE)) / (tf + CAST(1.2 AS DOUBLE) * " +
        "(CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)), 10) " +
        "AS DECIMAL(28,10))")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_dec").desc, col("doc_id"))
    hits.join(broadcast(qterms), "term")
      .join(broadcast(dfr), "term")
      .crossJoin(broadcast(stats))
      .withColumn("c", comp)
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).as("score_dec"), count(lit(1)).as("n_hit"),
        max(col("dl")).as("dl"))
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /** HYBRID retrieval by Reciprocal Rank Fusion — the fusion layer every
    * two-tower search stack runs: the SPARSE arm is [[bm25MultiRanked]]'s
    * top-`kArm` per query, the DENSE arm is brute-force cosine top-`kArm`
    * from the embeddings table (vec_id ≡ doc_id; query vectors are the
    * query ids' own embeddings), fused per (qid, doc) as
    * Σ 1/(60 + rank) over the arms a doc appears in (k=60, the canonical
    * RRF constant) and re-ranked. Determinism: both arm ranks are exact
    * integers under already-oracled orderings; the fused score is a
    * FIXED two-term IEEE tree (coalesce(1/(60+r), 0) + same) on those
    * integers, bit-identical cross-engine; final ties break on doc_id.
    * 100 TB shape: each arm is its own already-audited plan (corpus
    * scanned once per modality, queries broadcast, WindowGroupLimit
    * prunes to kArm before any exchange); the fusion joins two
    * (nQueries × kArm)-row frames — driver-trivial at any corpus size. */
  def hybridRrf(s: SparkSession, d: String, kArm: Int = 10, k: Int = 5)
      : DataFrame =
    hybridRrfFrom(s, d, Tables.documents(s, d), kArm, k)

  /** [[hybridRrf]] with the sparse arm's corpus passed explicitly — the
    * streaming bridge scores each micro-batch through this. */
  private def hybridRrfFrom(s: SparkSession, d: String, docs: DataFrame,
      kArm: Int = 10, k: Int = 5): DataFrame = {
    val sparse = bm25MultiRankedFrom(s, docs).filter(col("rnk") <= kArm)
      .select(col("qid"), col("doc_id"), col("rnk").as("r_s"))
    val all = Similarity.vecs(s, d)
    val qids = multiQueries.map(_._1)
    val q = all.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val wD = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("doc_id"))
    val dense = all.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("doc_id"),
        Similarity.cosine(col("qe"), col("e")).as("cos"))
      .withColumn("r_d", row_number().over(wD).cast("long"))
      .filter(col("r_d") <= kArm)
      .select(col("qid"), col("doc_id"), col("r_d"))
    val wF = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("doc_id"))
    sparse.join(dense, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60L) + col("r_s")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60L) + col("r_d")), lit(0.0)))
      .withColumn("rnk", row_number().over(wF).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("doc_id"), col("rrf"))
      .orderedBy("qid", "rnk")
  }

  /** [[hybridRrf]] under the STREAMING engine — the fusion SERVING
    * bridge (the one r14 retrieval operator without a streaming twin):
    * the document corpus arrives as an AvailableNow micro-batch and
    * foreachBatch runs the IDENTICAL two-arm fusion batch plan — sparse
    * arm scoring the batch's documents against the frozen query/vocab
    * broadcasts, dense arm and its ranks from the static embeddings
    * index, RRF fold, per-query re-rank — against the same fusion
    * oracle. Both arms' serving inputs are frozen artifacts (stats,
    * query table, dense index); the per-batch re-rank is corpus-global
    * over the sparse arm, so the bridge pins single-batch delivery (the
    * funnel/retention pattern) rather than silently unioning per-batch
    * rank fragments. */
  def rrfStreamed(s: SparkSession, d: String): DataFrame =
    Tables.runStreamForeachBatch(s, "rrf_streamed_",
      requireSingleBatch = true) { cs =>
      Tables.documentsStream(cs, d)
    } { (bs, batch) => hybridRrfFrom(bs, d, batch) }
      .orderedBy("qid", "rnk")

  private def hybridRrfOracle(kArm: Int, k: Int): String = {
    val qidList = multiQueries.map(_._1).mkString(", ")
    s"""WITH sparse AS (
       |  SELECT qid, doc_id, rnk AS r_s
       |  FROM (${bm25MultiOracle(kArm).replace("\n", "\n|        ")})),
       |qv AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
       |       FROM embeddings WHERE vec_id IN ($qidList)),
       |dc AS (SELECT qid, vec_id AS doc_id,
       |              list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])) AS cos
       |       FROM qv JOIN embeddings ON vec_id != qid),
       |dense AS (
       |  SELECT qid, doc_id, r_d FROM (
       |    SELECT qid, doc_id,
       |           row_number() OVER (PARTITION BY qid
       |             ORDER BY cos DESC, doc_id) AS r_d
       |    FROM dc)
       |  WHERE r_d <= $kArm),
       |f AS (
       |  SELECT COALESCE(s.qid, de.qid) AS qid,
       |         COALESCE(s.doc_id, de.doc_id) AS doc_id,
       |         COALESCE(CAST(1.0 AS DOUBLE) / (60 + s.r_s), CAST(0.0 AS DOUBLE))
       |           + COALESCE(CAST(1.0 AS DOUBLE) / (60 + de.r_d), CAST(0.0 AS DOUBLE)) AS rrf
       |  FROM sparse s FULL OUTER JOIN dense de
       |    ON s.qid = de.qid AND s.doc_id = de.doc_id),
       |r AS (SELECT qid, doc_id, rrf,
       |             row_number() OVER (PARTITION BY qid
       |               ORDER BY rrf DESC, doc_id) AS rnk
       |      FROM f)
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, doc_id, rrf
       |FROM r WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  /** The query table — corpus-vocabulary terms (TESTDATA.md word soup),
    * shared verbatim by the engine and the oracle's VALUES clause. */
  private val multiQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "join"),
    2L -> Seq("window", "stream", "merge"),
    3L -> Seq("hash", "filter", "scan"),
    4L -> Seq("spark", "window", "fast"))

  private def bm25MultiOracle(k: Int): String = {
    val values = multiQueries.flatMap { case (q, ts) =>
      ts.map(t => s"(CAST($q AS BIGINT), '$t')")
    }.mkString(", ")
    s"""WITH q(qid, term) AS (SELECT * FROM (VALUES $values)),
       |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |base AS (SELECT count(*) AS n, sum(len(toks)) AS sdl,
       |                CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl
       |         FROM t),
       |tok AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |               unnest(toks) AS term FROM t),
       |hits AS (SELECT doc_id, dl, term, count(*) AS tf
       |         FROM tok WHERE term IN (SELECT DISTINCT term FROM q)
       |         GROUP BY doc_id, dl, term),
       |dfr AS (SELECT term, count(*) AS df_t FROM hits GROUP BY term),
       |sc AS (SELECT q.qid, h.doc_id,
       |              sum(CAST(round(ln(1 + (n - df_t + CAST(0.5 AS DOUBLE)) / (df_t + CAST(0.5 AS DOUBLE))) *
       |                  (tf * CAST(2.2 AS DOUBLE)) / (tf + CAST(1.2 AS DOUBLE) *
       |                  (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)), 10)
       |                  AS DECIMAL(28,10))) AS score_dec,
       |              count(*) AS n_hit, max(dl) AS dl
       |       FROM q JOIN hits h USING (term) JOIN dfr USING (term), base
       |       GROUP BY q.qid, h.doc_id),
       |rk AS (SELECT qid, doc_id, dl, n_hit, score_dec,
       |              row_number() OVER (PARTITION BY qid
       |                ORDER BY score_dec DESC, doc_id) AS rnk
       |       FROM sc)
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, doc_id, dl, n_hit,
       |       CAST(score_dec AS DOUBLE) AS score
       |FROM rk WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  private def scoredOracle: String = {
    val tfCols = terms.map(t =>
      s"len(list_filter(toks, x -> x = '$t')) AS tf_$t").mkString(",\n|            ")
    val dfCols = terms.map(t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n|          ")
    val compSql = terms.map(comp).mkString("\n|              + ")
    val nHit = terms.map(t => s"CAST(tf_$t > 0 AS INT)").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |p AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |            $tfCols
       |      FROM t),
       |g AS (SELECT count(*) AS n, sum(dl) AS sdl,
       |          $dfCols,
       |          CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
       |      FROM p),
       |sc AS (SELECT doc_id, dl,
       |              $compSql AS score_dec,
       |              CAST($nHit AS BIGINT) AS n_hit
       |       FROM p, g)
       |SELECT doc_id, dl, n_hit, CAST(score_dec AS DOUBLE) AS score
       |FROM sc WHERE n_hit > 0 ORDER BY doc_id""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "q_bm25" -> QueryDef(bm25(_, _), Some(bm25Oracle())),
    // query-TABLE scoring: per-query top-k over a broadcast (qid, term)
    // frame — corpus-side scans independent of the query count
    "q_bm25_multi" -> QueryDef(bm25Multi(_, _), Some(bm25MultiOracle(5))),
    // two-tower fusion: BM25 arm + dense-cosine arm, RRF re-rank
    "q_retrieval_rrf" -> QueryDef(hybridRrf(_, _),
      Some(hybridRrfOracle(10, 5))),
    // the fusion chain executed by the streaming engine per ingest batch,
    // adjudicated by the identical fusion oracle (36th bridge)
    "q_rrf_streamed" -> QueryDef(rrfStreamed, Some(hybridRrfOracle(10, 5))),
    "q_bm25_scored" -> QueryDef(bm25Scored, Some(scoredOracle)),
    // the streaming engine scoring the same corpus against the same
    // frozen stats — the SAME oracle adjudicates (16th bridge)
    "q_bm25_streamed" -> QueryDef(bm25Streamed, Some(scoredOracle))
  )
}
