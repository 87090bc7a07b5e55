package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.QueryDef
import graft.core.QueryDef.OrderedOut

/** Product quantization (PQ, Jégou et al. 2011) over the embedding corpus —
  * the memory-compression ANN scale path that complements IVF bucketing
  * ([[Similarity.topkBucketed]]) and scalar int8 quantization
  * ([[Similarity.quantize]]): the 64-dim vector splits into `m` contiguous
  * subvectors, each quantized to the nearest entry of an independently
  * trained per-subspace codebook, so a vector stores as `m` small codes
  * (16 × log2(16) bits = 8 bytes vs 256 float bytes — 32×) and search
  * scores the query's FULL-precision vector against code-reconstructed
  * candidates (asymmetric distance).
  *
  * Subspace assignment is canonical L2 — nearest centroid by Euclidean
  * distance via the native [[graft.expr.L2ArgMin]] codegen argmin on
  * `|c|² − 2·c·x` (a direction-only cosine quantizer reconstructs segments
  * at arbitrary norms and distorts the full-vector score; measured
  * recall@3 0.17 cosine vs 0.30+ L2 on the driver embeddings). Training is
  * otherwise the [[Similarity.trainCentroids]] discipline: seed = first
  * `ks` slices, fixed iteration count, exact-decimal means, round(6) — so
  * the TRAINED index replays in the DuckDB oracle, whose assignment CTEs
  * order by the IDENTICAL op tree
  * `list_inner_product(ce,ce) − 2·list_inner_product(ce,e)` (index-ordered
  * dots, single IEEE multiply/subtract — bit-identical; ordering by a
  * sqrt'd distance instead could collapse two distinct squared distances
  * onto one rounded double and flip a tiebreak). Candidates sharing a
  * reconstruction tie-break on neighbor id in both dialects.
  *
  * Scale shape: the `m` codebooks collapse to ONE broadcast row — encoding
  * and reconstruction are per-row broadcast argmin/lookups (zero corpus
  * shuffle, the [[Similarity.assignNearest]] discipline); queries broadcast
  * to the candidate scan; the top-k rank<=k filter plans WindowGroupLimit,
  * pruning per partition BEFORE the only exchange, which carries
  * (qid, nbr, cos) scalars — no vector or reconstruction ever crosses the
  * wire. Like the IVF trainer, the codebooks stay lazy Catalyst lineage so
  * the oracle can replay them; a corpus-scale run would persist the coded
  * table once and serve from the 8-byte codes.
  */
object SimilarityPq {

  /** Test-scale knobs: 16 subspaces × 4 dims, 16-entry codebooks, one
    * Lloyd's refinement round (seeds are the first `ks` vector slices). */
  val dim = 64
  val m = 16
  val ds: Int = dim / m
  val ks = 16
  val nQueries = 20
  val k = 3

  private def off(j: Int): Int = (j - 1) * ds + 1

  /** Nearest-codebook-entry assignment by L2, zero corpus shuffle: the
    * codebook collapses to one broadcast row carrying each entry's
    * precomputed self-dot, and the row-side argmin is one codegen loop. */
  private def assignL2(sub: DataFrame, cents: DataFrame): DataFrame = {
    val cs = cents.agg(collect_list(struct(col("cid"), col("ce"),
      call_function("vec_dot", col("ce"), col("ce")).as("n2"))).as("cs"))
    sub.crossJoin(broadcast(cs))
      .select(col("vec_id"), col("e"),
        call_function("vec_argmin_l2", col("cs"), col("e")).as("cid"))
  }

  /** Deterministic per-subspace Lloyd's under the L2 metric — the
    * [[Similarity.trainCentroids]] recipe with the assignment rule swapped:
    * exact-decimal per-dim means, round(6), clusters that lose every
    * vector drop out identically on both engines. */
  private def trainCodebook(sub: DataFrame, iters: Int = 1): DataFrame = {
    val seed = sub.filter(col("vec_id") < ks)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    (1 to iters).foldLeft(seed) { (cents, _) =>
      val assigned = assignL2(sub, cents)
      val dims = (1 to ds).map(i =>
        round(sum(element_at(col("e"), i).cast("decimal(20,8)")).cast("double") /
          count(lit(1)), 6).as(s"c$i"))
      assigned.groupBy(col("cid"))
        .agg(dims.head, dims.tail: _*)
        .select(col("cid"), array((1 to ds).map(i => col(s"c$i")): _*).as("ce"))
    }
  }

  /** One broadcastable row holding all `m` codebooks, each as the
    * (cid, ce, n2) struct list [[graft.expr.L2ArgMin]] consumes. */
  private def codebooksRow(all: DataFrame): DataFrame =
    (1 to m).map { j =>
      val sub = all.select(col("vec_id"), slice(col("e"), off(j), ds).as("e"))
      trainCodebook(sub)
        .agg(collect_list(struct(col("cid"), col("ce"),
          call_function("vec_dot", col("ce"), col("ce")).as("n2")))
          .as(s"cs$j"))
    }.reduce(_.crossJoin(_))

  /** (vec_id, e, c1..cm, cs1..csm): every vector with its per-subspace
    * nearest-codebook-entry codes, codebook columns kept for lookups.
    * Broadcast-only — the corpus never shuffles. */
  private def coded(all: DataFrame): DataFrame =
    all.crossJoin(broadcast(codebooksRow(all)))
      .select(col("vec_id") +: col("e") +:
        ((1 to m).map(j => call_function("vec_argmin_l2", col(s"cs$j"),
          slice(col("e"), off(j), ds)).as(s"c$j")) ++
          (1 to m).map(j => col(s"cs$j"))): _*)

  /** Code-reconstructed vectors: concat of each subspace's assigned
    * centroid. The lookup filters a `ks`-entry broadcast list per row —
    * bounded work, not the unbounded chained-HOF shape WinnowFps avoids. */
  private def reconstructed(all: DataFrame): DataFrame =
    coded(all).select(col("vec_id"),
      concat((1 to m).map(j =>
        element_at(filter(col(s"cs$j"), s => s("cid") === col(s"c$j")), 1)("ce")): _*)
        .as("recon"))

  /** The PQ index artifact: (vec_id, c1..cm) — the 8-bytes-per-vector coded
    * corpus a serving layer scans instead of raw floats. */
  def pqCodes(s: SparkSession, d: String): DataFrame =
    coded(Similarity.vecs(s, d))
      .select(col("vec_id") +: (1 to m).map(j => col(s"c$j")): _*)
      .orderedBy("vec_id")

  /** Asymmetric top-k: full-precision queries against reconstructed
    * candidates. Same broadcast-queries + WindowGroupLimit shape as
    * [[Similarity.topkBrute]]; rank-only output. */
  def pqTopk(s: SparkSession, d: String,
             nQueries: Int = nQueries, k: Int = k): DataFrame = {
    val all = Similarity.vecs(s, d)
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nbr"))
    reconstructed(all).join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nbr"),
        Similarity.cosine(col("qe"), col("recon")).as("cos"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("long").as("rnk"), col("nbr"))
      .orderedBy("qid", "rnk")
  }

  /** Recall@k of the PQ search against the exact brute-force top-k — the
    * compression-loss gauge, an oracled first-class query like
    * [[Similarity.annRecall]]. */
  def pqRecall(s: SparkSession, d: String,
               nQueries: Int = nQueries, k: Int = k): DataFrame = {
    val brute = Similarity.topkBrute(s, d, nQueries, k)
      .select(col("qid"), col("nbr"))
    val pq = pqTopk(s, d, nQueries, k).select(col("qid"), col("nbr"))
    val hits = brute.join(pq, Seq("qid", "nbr"))
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
    brute.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall", round(lit(1.0) * col("hits") / k, 4))
      .orderedBy("qid")
  }

  // ---- DuckDB oracle: the training + encode + reconstruct chain unrolled
  // as per-subspace CTEs, the Similarity.trainBody recipe on list_slice'd
  // subvectors. Assignment CTEs mirror vec_argmin_l2's score and tie rule
  // (n2 − 2·dot ASC, cid ASC).

  private def meanCols: String = (1 to ds).map(i =>
    s"round(CAST(sum(CAST(e[$i] AS DECIMAL(20,8))) AS DOUBLE) / count(*), 6)")
    .mkString(",\n          ")

  private def assignSql(out: String, src: String, cents: String): String =
    s"""$out AS (
       |  SELECT vec_id, e, cid AS bucket FROM (
       |    SELECT s.vec_id, s.e, c.cid,
       |           row_number() OVER (PARTITION BY s.vec_id
       |             ORDER BY (list_inner_product(c.ce, c.ce)
       |                       - 2 * list_inner_product(c.ce, s.e)) ASC, c.cid) AS arn
       |    FROM $src s, $cents c) WHERE arn = 1)""".stripMargin

  /** v + per-subspace (slice, seed, assign, recompute, encode) CTEs. */
  private def pqBody: String = {
    val subs = (1 to m).map { j =>
      s"""s$j AS (SELECT vec_id, list_slice(e, ${off(j)}, ${off(j) + ds - 1}) AS e FROM v),
         |c0_$j AS (SELECT vec_id AS cid, e AS ce FROM s$j WHERE vec_id < $ks),
         |${assignSql(s"a1_$j", s"s$j", s"c0_$j")},
         |c1_$j AS (
         |  SELECT bucket AS cid,
         |         [$meanCols] AS ce
         |  FROM a1_$j GROUP BY bucket),
         |${assignSql(s"enc_$j", s"s$j", s"c1_$j")}""".stripMargin
    }.mkString(",\n")
    s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |$subs""".stripMargin
  }

  private def reconCte: String = {
    val joins = (2 to m).map(j =>
      s"JOIN enc_$j e$j ON e$j.vec_id = e1.vec_id JOIN c1_$j cb$j ON cb$j.cid = e$j.bucket")
      .mkString("\n  ")
    val cat = (1 to m).map(j => s"cb$j.ce").mkString(" || ")
    s"""recon AS (
       |  SELECT e1.vec_id, $cat AS recon
       |  FROM enc_1 e1 JOIN c1_1 cb1 ON cb1.cid = e1.bucket
       |  $joins)""".stripMargin
  }

  private def codesOracle: String = {
    val joins = (2 to m).map(j => s"JOIN enc_$j e$j ON e$j.vec_id = e1.vec_id")
      .mkString(" ")
    val cols = (1 to m).map(j => s"e$j.bucket AS c$j").mkString(", ")
    s"""WITH $pqBody
       |SELECT e1.vec_id, $cols
       |FROM enc_1 e1 $joins
       |ORDER BY e1.vec_id""".stripMargin
  }

  /** PQ top CTE through ranked candidates — shared by topk + recall. */
  private def topCte(nQueries: Int): String =
    s"""q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < $nQueries),
       |ptop AS (
       |  SELECT qid, nbr, row_number() OVER (PARTITION BY qid
       |           ORDER BY cos DESC, nbr) AS rnk
       |  FROM (SELECT q.qid, r.vec_id AS nbr,
       |               list_cosine_similarity(q.qe, r.recon) AS cos
       |        FROM q JOIN recon r ON r.vec_id != q.qid))""".stripMargin

  private def topkOracle(nQueries: Int, k: Int): String =
    s"""WITH $pqBody,
       |$reconCte,
       |${topCte(nQueries)}
       |SELECT qid, rnk, nbr FROM ptop WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin

  private def recallOracle(nQueries: Int, k: Int): String =
    s"""WITH $pqBody,
       |$reconCte,
       |${topCte(nQueries)},
       |bc AS (SELECT qid, vec_id AS nbr,
       |              list_cosine_similarity(qe, e) AS cos
       |       FROM q JOIN v ON vec_id != qid),
       |br AS (SELECT qid, nbr, row_number() OVER (PARTITION BY qid
       |              ORDER BY cos DESC, nbr) AS rnk FROM bc),
       |bt AS (SELECT qid, nbr FROM br WHERE rnk <= $k),
       |it AS (SELECT qid, nbr FROM ptop WHERE rnk <= $k),
       |h AS (SELECT qid, count(*) AS hits
       |      FROM bt JOIN it USING (qid, nbr) GROUP BY qid)
       |SELECT b.qid, COALESCE(h.hits, 0) AS hits,
       |       round(1.0 * COALESCE(h.hits, 0) / $k, 4) AS recall
       |FROM (SELECT DISTINCT qid FROM bt) b LEFT JOIN h USING (qid)
       |ORDER BY qid""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_sim_pq_codes" -> QueryDef(pqCodes, Some(codesOracle)),
    "q_sim_pq" -> QueryDef(pqTopk(_, _), Some(topkOracle(nQueries, k))),
    "q_sim_pq_recall" -> QueryDef(pqRecall(_, _), Some(recallOracle(nQueries, k)))
  )
}
