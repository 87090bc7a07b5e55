package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected catalog
  * queries so scan pruning (ReadSchema/PushedFilters), join strategies,
  * partial aggregation, and codegen spans can be reviewed per round. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_ohlc_1m", "q_agg_hash", "q_join_smj", "q_join_broadcast",
      "q_join_asof", "q_dedup_near", "q_sim_topk", "q_sim_bucketed",
      "q_topk", "q_json_get", "q_sample_k", "q_dedup_simhash_capped",
      "q_tfidf", "q_doc_winnow", "q_decontaminate", "q_dedup_clusters",
      "q_distinct_sketch", "q_agg_stats", "q_quantile_hist", "q_sessionize",
      "q_dedup_ngram", "q_latest_by_key", "q_bigram_lm", "q_dedup_embed_capped",
      "q_token_bpe", "q_pack_tokens", "q_quality_rep", "q_dedup_keep_best",
      "q_sample_stratified", "q_sim_quantized", "q_lang_ngram",
      "q_cooccur_pmi", "q_join_shj",
      "q_dedup_winnow", "q_quality_lm", "q_chunk_split", "q_mix_weights",
      "q_dedup_chunk", "q_unpivot", "q_sim_recall", "q_outliers", "q_zorder",
      "q_snapshot_diff", "q_sim_centroids", "q_quality_oov",
      "q_join_bloom", "q_dedup_incremental", "q_math_funcs",
      "q_sim_pq", "q_sim_pq_codes", "q_sim_pq_recall", "q_dedup_semantic",
      "q_sim_ivfpq", "q_embed_hashing", "q_dedup_semantic_text",
      "q_media_decode", "q_audio_decode", "q_media_resize",
      "q_dedup_semantic_capped", "q_multimodal", "q_sim_ivfpq_recall",
      "q_dedup_near_incr", "q_bpe_train",
      "q_sim_ivfpq_persisted", "q_quantile_sketch", "q_dedup_substr",
      "q_bm25", "q_bm25_scored", "q_boilerplate", "q_curriculum",
      "q_dedup_contain", "q_sim_ivfpq_rerank", "q_sketch_merge",
      "q_sample_weighted", "q_audio_frames", "q_bpe_apply",
      "q_sim_index_ingest", "q_funnel", "q_fuzzy_match",
      "q_retention", "q_scd2", "q_graph_pagerank",
      "q_profile", "q_profile_sketch", "q_bm25_multi", "q_heavy_hitters",
      "q_sim_index_compact",
      "q_dedup_cc_persisted", "q_dedup_recall", "q_dedup_phash", "q_vocab_growth",
      "q_source_divergence", "q_ohlc_rewrite", "q_ohlc_reference",
      "q_quality_prune", "q_quality_clf", "q_join_bucketed",
      "q_dedup_matrix", "q_datasheet", "q_split_leakfree", "q_meta_count",
      "q_sim_drift", "q_token_yield", "q_dedup_cc_incr", "q_quality_entropy",
      "q_join_asof_native", "q_join_asof_tol_native", "q_ohlc_rollup",
      "q_ohlc_gapfill", "q_ohlc_tiered",
      "q_tradelog_agg", "q_tradelog_prune", "q_ohlc_moves", "q_ohlc_donchian",
      "q_tradelog_pushdown", "q_tradelog_point", "q_tradelog_semi",
      "q_ohlc_ema", "q_ohlc_bollinger", "q_ohlc_macd",
      "q_ohlc_rsi", "q_ohlc_atr", "q_cdc_apply", "q_bpe_served",
      "q_retrieval_rrf", "q_mine_hard", "q_sim_mmr", "q_join_skew_aqe",
      "q_ohlc_heikin", "q_ohlc_tier_incr", "q_tradelog_purge",
      "q_distinct_rewrite", "q_win_session_dyn",
      "q_tpch_q1", "q_tpch_q3", "q_tpch_q5", "q_tpch_q18",
      "q_tpch_q4", "q_tpch_q13", "q_sim_index_delete",
      "q_tpch_q2", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9",
      "q_tpch_q10", "q_tpch_q11", "q_tpch_q12", "q_tpch_q14", "q_tpch_q15",
      "q_tpch_q16", "q_tpch_q17", "q_tpch_q19", "q_tpch_q20", "q_tpch_q21",
      "q_tpch_q22", "q_join_lateral", "q_json_variant", "q_cte_recursive", "q_last_k",
      "q_tradelog_asof", "q_tradelog_evolve", "q_tradelog_changes", "q_sql_pipe", "q_sql_params", "q_sql_script", "q_collation",
      // r17: the DML queries' read-back plans (the DML itself runs once at
      // artifact build; these audit the survivors-scan digest shapes)
      "q_tradelog_delete_sql", "q_tradelog_update_sql",
      "q_tradelog_merge_sql",
      // r18: the MoR / restore / evolution / z-order read-back plans
      "q_tradelog_delete_mor", "q_tradelog_update_mor",
      "q_tradelog_mor_compacted",
      "q_tradelog_merge_sync", "q_tradelog_restore",
      "q_tradelog_optimize_z", "q_tradelog_evolve_sql")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      n match {
        // iterative-graph query: the catalog build executes eagerly
        // (edge-list materialization); audit the single lazy plan instead
        case "q_dedup_clusters" =>
          graft.llm.Dedup.nearClusters(spark, d, eager = false).explain("formatted")
        // iterative trainer: audit a 2-round lazy unroll (the catalog
        // build checkpoints each round eagerly)
        case "q_bpe_train" =>
          graft.llm.BpeTrain.trainFrom(
            graft.core.Tables.documents(spark, d), 2, checkpoint = false)
            .explain("formatted")
        // incremental CC: the catalog build runs two eager star-contraction
        // loops; audit the lazy increment-pair chain (the broadcast-shape
        // claim) instead of executing the whole query
        case "q_dedup_cc_incr" | "q_dedup_cc_persisted" =>
          // both serve-side claims are the all-broadcast increment chain;
          // the persisted variant's remaining work is a node-sized label
          // scan + the same contraction round shape audited elsewhere
          graft.llm.Dedup.ccIncrementalAuditPlan(spark, d).explain("formatted")
        // cluster-keyed split / attribution matrix: both run an eager
        // contraction loop (resp. an eager pair pin) in the catalog build,
        // so audit the lazy LSH pair chain — the part of the plan that
        // carries each query's scale claim (banded candidates, df caps,
        // broadcast verifies); the contraction round shape is audited via
        // q_dedup_clusters' lazy unroll
        case "q_split_leakfree" | "q_dedup_matrix" =>
          graft.llm.Dedup.nearPairsAuditPlan(spark, d).explain("formatted")
        case _ =>
          graft.SparkEntry.queries(n)(spark, d).explain("formatted")
      }
    }
    spark.stop()
  }
}
