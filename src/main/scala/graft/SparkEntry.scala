package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.Tables._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each entry is an operator family from §2; oracle SQL lives in
  * [[Oracles]] (DuckDB dialect, value-identical by construction). */
object SparkEntry {

  /** Flagship query (TPC-H Q5 shape, 6-table join) on sf=0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Relational.q05(region(spark, d), nation(spark, d), customer(spark, d),
      orders(spark, d), lineitem(spark, d), supplier(spark, d))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2a relational core
    "q01_agg"              -> ((s, d) => Relational.q01(lineitem(s, d))),
    "q02_filter_project"   -> ((s, d) => Relational.q02(lineitem(s, d))),
    "q03_join_agg"         -> ((s, d) => Relational.q03(customer(s, d), orders(s, d), lineitem(s, d))),
    "q04_semijoin"         -> ((s, d) => Relational.q04(orders(s, d), lineitem(s, d))),
    "q05_multijoin"        -> ((s, d) => Relational.q05(region(s, d), nation(s, d), customer(s, d), orders(s, d), lineitem(s, d), supplier(s, d))),
    "q06_selective_agg"    -> ((s, d) => Relational.q06(lineitem(s, d))),
    "q07_antijoin"         -> ((s, d) => Relational.q07(customer(s, d), orders(s, d))),
    "q08_outer_join"       -> ((s, d) => Relational.q08(customer(s, d), orders(s, d))),
    "q09_distinct"         -> ((s, d) => Relational.q09(lineitem(s, d))),
    "q10_topk"             -> ((s, d) => Relational.q10(orders(s, d))),
    "q11_having"           -> ((s, d) => Relational.q11(lineitem(s, d))),
    "q12_case_pivot"       -> ((s, d) => Relational.q12(orders(s, d), lineitem(s, d))),
    "q13_scalar_subquery"  -> ((s, d) => Relational.q13(part(s, d), lineitem(s, d))),
    "q14_in_subquery"      -> ((s, d) => Relational.q14(customer(s, d), orders(s, d), lineitem(s, d))),
    "q15_union"            -> ((s, d) => Relational.q15(orders(s, d), lineitem(s, d))),
    "q16_intersect_except" -> ((s, d) => Relational.q16(lineitem(s, d))),
    "q17_rollup"           -> ((s, d) => Relational.q17(customer(s, d), nation(s, d))),
    "q18_cube"             -> ((s, d) => Relational.q18(lineitem(s, d))),
    "q19_grouping_sets"    -> ((s, d) => Relational.q19(orders(s, d))),
    "q20_cte_selfjoin"     -> ((s, d) => Relational.q20(supplier(s, d), nation(s, d))),
    "q21_string_funcs"     -> ((s, d) => Relational.q21(part(s, d))),
    "q22_date_funcs"       -> ((s, d) => Relational.q22(orders(s, d))),
    "q23_percentile"       -> ((s, d) => Relational.q23(lineitem(s, d))),
    "q24_approx_sketch"    -> ((s, d) => Relational.q24(lineitem(s, d))),
    "q25_sql_interface"    -> ((s, d) => Relational.q25(s, lineitem(s, d), supplier(s, d))),
    "q26_corr_exists"      -> ((s, d) => Relational.q26(customer(s, d), orders(s, d))),
    "q27_window_range"     -> ((s, d) => Events.q27(orders(s, d))),
    "q28_first_last"       -> ((s, d) => Events.q28(orders(s, d))),
    "q29_pivot"            -> ((s, d) => Relational.q29(lineitem(s, d))),
    "q58_stratified_sample"-> ((s, d) => Relational.q58(orders(s, d))),
    "q59_profile_stats"    -> ((s, d) => Relational.q59(lineitem(s, d))),
    "q62_approx_percentile"-> ((s, d) => Relational.q62(lineitem(s, d))),
    "q63_integrity_checks" -> ((s, d) => Relational.q63(customer(s, d), orders(s, d), lineitem(s, d))),
    // §2b window / event analytics
    "q30_window_rank"      -> ((s, d) => Events.q30(orders(s, d))),
    "q31_window_running"   -> ((s, d) => Events.q31(events(s, d))),
    "q32_window_lag"       -> ((s, d) => Events.q32(events(s, d))),
    "q33_window_ntile"     -> ((s, d) => Events.q33(orders(s, d))),
    "q34_sessionize"       -> ((s, d) => Events.q34(events(s, d))),
    "q35_session_stats"    -> ((s, d) => Events.q35(events(s, d))),
    "q36_event_funnel"     -> ((s, d) => Events.q36(events(s, d))),
    "q37_json_extract"     -> ((s, d) => Events.q37(events(s, d))),
    "q66_json_struct"      -> ((s, d) => Events.q66(events(s, d))),
    "q38_time_window"      -> ((s, d) => graft.streaming.Streams.q38(events(s, d))),
    "q39_session_window"   -> ((s, d) => Events.q39(events(s, d))),
    "q60_asof_join"        -> ((s, d) => Events.q60(events(s, d))),
    "q136_range_join"      -> ((s, d) => Events.q136(events(s, d))),
    "q142_retention"       -> ((s, d) => Events.q142(events(s, d))),
    "q61_interval_join"    -> ((s, d) => graft.streaming.Streams.conversions(events(s, d))
                                 .orderBy("user_id", "view_ts", "buy_ts")),
    "q56_native_topk"      -> ((s, d) => Events.q56(orders(s, d))),
    // §2c LLM-data-pipeline
    "q40_dedup_exact"          -> ((s, d) => Dedup.q40(documents(s, d))),
    "q41_dedup_ngram_jaccard"  -> ((s, d) => Dedup.q41(documents(s, d))),
    "q42_dedup_minhash_lsh"    -> ((s, d) => Dedup.q42(documents(s, d))),
    "q43_dedup_simhash"        -> ((s, d) => Dedup.q43(documents(s, d))),
    "q64_dedup_clusters"       -> ((s, d) => Dedup.q64(documents(s, d),
      precomputedLabels = Some(clusterLabels(s, d)))),
    "q65_clean_corpus"         -> ((s, d) => Pipeline.cleanCorpus(documents(s, d),
      precomputedLabels = Some(clusterLabels(s, d)))),
    "q44_ann_cosine_topk"      -> ((s, d) => Similarity.q44(embeddings(s, d))),
    "q45_ann_lsh"              -> ((s, d) => Similarity.q45(embeddings(s, d))),
    "q46_embed_dedup"          -> ((s, d) => Similarity.q46(embeddings(s, d))),
    "q47_langid"               -> ((s, d) => TextAnalysis.q47(documents(s, d))),
    "q48_quality_score"        -> ((s, d) => TextAnalysis.q48(documents(s, d))),
    "q49_token_count"          -> ((s, d) => TextAnalysis.q49(documents(s, d))),
    "q50_fingerprint"          -> ((s, d) => TextAnalysis.q50(documents(s, d))),
    "q54_text_normalize"       -> ((s, d) => TextAnalysis.q54(documents(s, d))),
    "q67_pii_scrub"            -> ((s, d) => TextAnalysis.q67(documents(s, d))),
    "q68_repetition"           -> ((s, d) => TextAnalysis.q68(documents(s, d))),
    "q69_contamination"        -> ((s, d) => Dedup.q69(documents(s, d))),
    "q143_bench_containment"   -> ((s, d) => Dedup.q143(documents(s, d))),
    // oracle-exact since round 14 via the reconciliation projection:
    // exact q95 stats + the within-3-sigma verdict the oracle predicts
    // TRUE; the raw sketch stays Dedup.q147 (spec-checked)
    "q147_overlap_sketch"      -> ((s, d) => Dedup.q147Driver(documents(s, d))),
    "q70_mix_stats"            -> ((s, d) => TextAnalysis.q70(documents(s, d))),
    "q71_salted_join"          -> ((s, d) => Skew.q71(lineitem(s, d), supplier(s, d))),
    "q72_corr_moments"         -> ((s, d) => Relational.q72(lineitem(s, d))),
    "q73_gapfill_locf"         -> ((s, d) => Events.q73(events(s, d))),
    "q74_embed_quantize"       -> ((s, d) => Similarity.q74Driver(embeddings(s, d))),
    "q75_vocab_topk"           -> ((s, d) => TextAnalysis.q75(documents(s, d))),
    "q76_bigram_lm"            -> ((s, d) => TextAnalysis.q76(documents(s, d))),
    "q77_pack_buckets"         -> ((s, d) => TextAnalysis.q77(documents(s, d))),
    "q78_funnel3"              -> ((s, d) => Events.q78(events(s, d))),
    "q79_binary_dedup"         -> ((s, d) => Multimodal.q79(s, documents(s, d))),
    "q80_per_key_sample"       -> ((s, d) => TextAnalysis.q80(documents(s, d))),
    "q81_skew_report"          -> ((s, d) => Skew.q81(lineitem(s, d), "l_suppkey")),
    "q57_lateral_explode"      -> ((s, d) => TextAnalysis.q57(documents(s, d))),
    "q55_ann_ivf"              -> ((s, d) => Similarity.q55(embeddings(s, d))),
    "q51_multimodal_meta"      -> ((s, d) => Multimodal.q51(s, documents(s, d))),
    "q52_multimodal_resize"    -> ((s, d) => Multimodal.q52Resize(s, documents(s, d))),
    "q53_frame_sample"         -> ((s, d) => Multimodal.q53FrameSample(s, documents(s, d))),
    "q84_dedup_editdist"       -> ((s, d) => Dedup.q84(documents(s, d))),
    "q85_bm25"                 -> ((s, d) => TextAnalysis.q85(documents(s, d))),
    "q86_unigram_logprob"      -> ((s, d) => TextAnalysis.q86(documents(s, d))),
    "q87_chunk_windows"        -> ((s, d) => TextAnalysis.q87(documents(s, d))),
    "q88_shuffle_shard"        -> ((s, d) => TextAnalysis.q88(documents(s, d))),
    "q89_tfidf"                -> ((s, d) => TextAnalysis.q89(documents(s, d))),
    "q90_pmi_cooccur"          -> ((s, d) => TextAnalysis.q90(documents(s, d))),
    "q91_train_split"          -> ((s, d) => TextAnalysis.q91(documents(s, d))),
    "q92_embed_centroids"      -> ((s, d) => Similarity.q92(embeddings(s, d))),
    "q93_phash_neardup"        -> ((s, d) => Multimodal.q93(s, documents(s, d))),
    "q94_media_clean"          -> ((s, d) => Multimodal.q94(s, documents(s, d))),
    // rows-only: gear-hash chunk boundaries are not portable SQL; the
    // spec pins shift-stability, span reconstruction, determinism, and
    // a planted shared-region pair
    "q139_cdc_dedup"           -> ((s, d) => Multimodal.q139(s, documents(s, d))),
    // rows-only: sketch contents depend on merge order for
    // sub-threshold tokens; the spec pins the Misra-Gries guarantee
    // against exact counts at several partitionings
    "q140_heavy_hitters"       -> ((s, d) => TextAnalysis.q140(documents(s, d))),
    "q141_source_calibrate"    -> ((s, d) => TextAnalysis.q141(documents(s, d))),
    "q144_neyman_alloc"        -> ((s, d) => TextAnalysis.q144(documents(s, d))),
    // rows-only: greedy BPE (q113's gate) / no gzip in portable SQL
    "q145_subword_fertility"   -> ((s, d) => TextAnalysis.q145(documents(s, d))),
    "q146_compress_ratio"      -> ((s, d) => TextAnalysis.q146(s, documents(s, d))),
    "q95_source_overlap"       -> ((s, d) => Dedup.q95(documents(s, d))),
    "q96_embed_clusters"       -> ((s, d) => Similarity.q96(embeddings(s, d))),
    "q97_gram_matrix"          -> ((s, d) => Similarity.q97(embeddings(s, d))),
    "q98_bpe_merges"           -> ((s, d) => TextAnalysis.q98(documents(s, d))),
    "q99_bigram_logprob"       -> ((s, d) => TextAnalysis.q99(documents(s, d))),
    "q100_feature_hash"        -> ((s, d) => TextAnalysis.q100(documents(s, d))),
    "q101_boilerplate"         -> ((s, d) => TextAnalysis.q101(documents(s, d))),
    "q102_mix_resample"        -> ((s, d) => TextAnalysis.q102(documents(s, d))),
    "q103_knn_label"           -> ((s, d) => Similarity.q103(embeddings(s, d))),
    "q104_quality_hash_lr"     -> ((s, d) => TextAnalysis.q104(documents(s, d))),
    "q105_canonical_pick"      -> ((s, d) => Pipeline.q105(documents(s, d),
      labels = Some(clusterLabels(s, d)))),
    "q106_source_profile"      -> ((s, d) => TextAnalysis.q106(documents(s, d))),
    "q107_split_decontam"      -> ((s, d) => TextAnalysis.q107(documents(s, d))),
    "q108_ann_int8"            -> ((s, d) => Similarity.q108(embeddings(s, d))),
    "q111_split_neardup"       -> ((s, d) => Dedup.q111(documents(s, d))),
    "q112_band_skew"           -> ((s, d) => Dedup.q112Driver(documents(s, d))),
    "q113_bpe_encode"          -> ((s, d) => TextAnalysis.q113(documents(s, d))),
    // exact=true: the span-string audit form the oracle can mirror;
    // the scale default hashes spans to 8 bytes before the shuffle
    "q114_repeated_spans"      -> ((s, d) => Dedup.q114(documents(s, d), exact = true)),
    "q115_span_fraction"       -> ((s, d) => Dedup.q115(documents(s, d), exact = true)),
    // query batch = Oracles.Bm25Queries, interpolated into the
    // oracle's VALUES from the same definition
    "q116_bm25_search"         -> ((s, d) => {
      import s.implicits._
      TextAnalysis.q116(documents(s, d),
        Oracles.Bm25Queries.toDF("query_id", "terms"))
    }),
    "q117_dsir"                -> ((s, d) => TextAnalysis.q117(documents(s, d))),
    "q118_perplexity_buckets"  -> ((s, d) => TextAnalysis.q118(documents(s, d), exact = true)),
    "q119_span_scrub"          -> ((s, d) => Dedup.q119(documents(s, d), exact = true)),
    "q120_temperature_mix"     -> ((s, d) => TextAnalysis.q120(documents(s, d))),
    "q121_source_diversity"    -> ((s, d) => TextAnalysis.q121(documents(s, d))),
    "q122_embed_outliers"      -> ((s, d) => Similarity.q122(embeddings(s, d))),
    "q123_prefix_skew"         -> ((s, d) => Dedup.q123(documents(s, d))),
    // rows-only like q113: greedy BPE apply is not portable SQL; the
    // bucketing/chunking algebra on top is specced against q113 counts
    "q124_pack_bpe"            -> ((s, d) => TextAnalysis.q77Bpe(documents(s, d))),
    "q125_chunk_bpe"           -> ((s, d) => TextAnalysis.q87Bpe(documents(s, d))),
    // bloom-prefiltered incremental ingest: q109's corpus/batch split
    // plus planted re-ingests (constants shared with the oracle via
    // Oracles) so dup_corpus/dup_batch/new all occur at sf0.01
    "q126_bloom_dedup"         -> ((s, d) => {
      val docs = documents(s, d)
      import org.apache.spark.sql.functions.{col, lit, pmod}
      val corpus = docs
        .filter(pmod(col("doc_id"), lit(Oracles.IngestBatchMod)) =!= 0L)
      val batch = docs
        .filter(pmod(col("doc_id"), lit(Oracles.IngestBatchMod)) === 0L)
        .select(col("doc_id"), col("text"))
        .unionAll(docs
          .filter(pmod(col("doc_id"), lit(Oracles.BloomReingestMod)) === Oracles.BloomReingestRem &&
            pmod(col("doc_id"), lit(Oracles.IngestBatchMod)) =!= 0L)
          .select((col("doc_id") + Oracles.BloomIdOffsetA).as("doc_id"), col("text")))
        .unionAll(docs
          .filter(pmod(col("doc_id"), lit(Oracles.BloomDupBatchMod)) === 0L)
          .select((col("doc_id") + Oracles.BloomIdOffsetB).as("doc_id"), col("text")))
      Dedup.q126(corpus, batch)
    }),
    // incremental NEAR-dup ingest (s13's table-free twin): q109's
    // corpus/batch split plus planted exact re-ingests AND one-word
    // rewrites of corpus docs, so dup_corpus / near_corpus / new all
    // occur; rows-only (MinHash banding is not portable SQL) + the
    // NearDupIndexSpec planted-status/parity specs
    "q131_neardup_ingest"      -> ((s, d) => {
      val docs = documents(s, d)
      import org.apache.spark.sql.functions.{col, lit, pmod, concat}
      val corpus = docs
        .filter(pmod(col("doc_id"), lit(Oracles.IngestBatchMod)) =!= 0L)
      val batch = docs
        .filter(pmod(col("doc_id"), lit(Oracles.IngestBatchMod)) === 0L)
        .select(col("doc_id"), col("text"))
        .unionAll(corpus
          .filter(pmod(col("doc_id"), lit(Oracles.BloomReingestMod)) === Oracles.BloomReingestRem)
          .select((col("doc_id") + Oracles.BloomIdOffsetA).as("doc_id"), col("text")))
        .unionAll(corpus
          .filter(pmod(col("doc_id"), lit(Oracles.BloomDupBatchMod)) === 0L)
          .select((col("doc_id") + Oracles.BloomIdOffsetB).as("doc_id"),
            concat(col("text"), lit(" graftnear tail")).as("text")))
      Dedup.q131(corpus, batch)
    }),
    "q127_dup_profile"         -> ((s, d) => Dedup.q127(documents(s, d))),
    "q133_clean_funnel"        -> ((s, d) => Pipeline.q133(documents(s, d),
      labels = Some(clusterLabels(s, d)))),
    // rows-only: a driver-side eigensolve is not portable SQL; the
    // spec proves orthonormality, variance ordering, full-rank
    // isometry, and planted-axis recovery
    "q134_pca_project"         -> ((s, d) => Similarity.q134Driver(embeddings(s, d))),
    // rows-only: per-subspace k-means codebooks are not portable SQL;
    // the spec pins recall@5 vs exact q44, code shape/range, and
    // encode determinism
    "q138_pq_ann"              -> ((s, d) => Similarity.q138(embeddings(s, d))),
    // the SCALE form is registered (bucketed verdicts, no global
    // window) — it provably selects the same prefix the oracle's
    // window-cumsum does, so it is oracle-checked directly
    "q135_token_budget"        -> ((s, d) => TextAnalysis.q135(documents(s, d))),
    "q137_weighted_sample"     -> ((s, d) => TextAnalysis.q137(documents(s, d))),
    "q128_quota_topk"          -> ((s, d) => TextAnalysis.q128(documents(s, d))),
    // rows-only: the next-fit packer is a sequential per-shard walk —
    // not portable SQL; invariants are specced (capacity, contiguous
    // offsets, dense bins, determinism, q88 shard parity)
    "q129_pack_assign"         -> ((s, d) => TextAnalysis.q129(documents(s, d))),
    "q130_vocab_growth"        -> ((s, d) => TextAnalysis.q130(documents(s, d))),
    // snapshot diff: "old" drops every DiffOldDropMod-th doc, "new"
    // drops every DiffNewDropMod-th and upper-cases every
    // DiffUpperMod-th's text — the mod constants live in Oracles and
    // are interpolated into the oracle SQL, so the two derivations
    // cannot drift apart
    "q110_corpus_diff"         -> ((s, d) => {
      val docs = documents(s, d)
      import org.apache.spark.sql.functions.{col, lit, pmod, when, upper}
      val old  = docs.filter(pmod(col("doc_id"), lit(Oracles.DiffOldDropMod)) =!= 0L)
        .select(col("doc_id"), col("text"))
      val newer = docs.filter(pmod(col("doc_id"), lit(Oracles.DiffNewDropMod)) =!= 0L)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(Oracles.DiffUpperMod)) === 0L, upper(col("text")))
            .otherwise(col("text")).as("text"))
      Dedup.q110(old, newer)
    }),
    // token-distribution drift between the q110 snapshots (same
    // derivation constants, so the two reports describe the same pair
    // of corpus versions — q110 row-level, q132 distribution-level)
    "q132_token_drift"         -> ((s, d) => {
      val docs = documents(s, d)
      import org.apache.spark.sql.functions.{col, lit, pmod, when, upper}
      val old  = docs.filter(pmod(col("doc_id"), lit(Oracles.DiffOldDropMod)) =!= 0L)
        .select(col("doc_id"), col("text"))
      val newer = docs.filter(pmod(col("doc_id"), lit(Oracles.DiffNewDropMod)) =!= 0L)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(Oracles.DiffUpperMod)) === 0L, upper(col("text")))
            .otherwise(col("text")).as("text"))
      TextAnalysis.q132(old, newer)
    }),
    // incremental ingest: every IngestBatchMod-th doc arrives as the
    // "new batch", the rest are the already-ingested corpus (constant
    // shared with the oracle SQL via Oracles.IngestBatchMod)
    "q109_incremental_dedup"   -> ((s, d) => {
      val docs = documents(s, d)
      import org.apache.spark.sql.functions.{col, pmod, lit}
      Dedup.q109(docs.filter(pmod(col("doc_id"), lit(Oracles.IngestBatchMod)) =!= 0L),
        docs.filter(pmod(col("doc_id"), lit(Oracles.IngestBatchMod)) === 0L))
    }),
    // external-query ANN: first 20 vectors are the "new batch", the rest
    // are the served corpus (disjoint id ranges keep the oracle simple)
    "q82_ann_search_exact"     -> ((s, d) => {
      val e = embeddings(s, d)
      Similarity.searchExact(e.filter(org.apache.spark.sql.functions.col("vec_id") < 20),
        e.filter(org.apache.spark.sql.functions.col("vec_id") >= 20), 5)
    }),
    "q83_ann_search_lsh"       -> ((s, d) => {
      val e = embeddings(s, d)
      Similarity.search(e.filter(org.apache.spark.sql.functions.col("vec_id") < 20),
        e.filter(org.apache.spark.sql.functions.col("vec_id") >= 20), 5)
    }),
    // URL/domain curation (synthetic URL derived from (source, doc_id)
    // with the same algebra in the oracle — see UrlCuration.withUrl)
    "q148_url_normalize"       -> ((s, d) => UrlCuration.q148(documents(s, d))),
    "q149_domain_blocklist"    -> ((s, d) => UrlCuration.q149(documents(s, d))),
    "q150_domain_quota"        -> ((s, d) => UrlCuration.q150(documents(s, d))),
    "q151_url_dedup"           -> ((s, d) => UrlCuration.q151(documents(s, d))),
    "q152_domain_split"        -> ((s, d) => UrlCuration.q152(documents(s, d))),
    "q153_domain_profile"      -> ((s, d) => UrlCuration.q153(documents(s, d))),
    "q154_domain_pagerank"     -> ((s, d) => Graphs.q154(documents(s, d))),
    "q155_kmeans"              -> ((s, d) => KMeans.q155(embeddings(s, d))),
    "q156_cluster_profile"     -> ((s, d) => KMeans.q156(embeddings(s, d))),
    "q157_zipf_fit"            -> ((s, d) => TextAnalysis.q157(documents(s, d))),
    "q158_skyline"             -> ((s, d) => Relational.q158(documents(s, d))),
    "q159_sentiment"           -> ((s, d) => TextAnalysis.q159(documents(s, d))),
    "q160_token_entropy"       -> ((s, d) => TextAnalysis.q160(documents(s, d))),
    "q161_hybrid_rrf"          -> ((s, d) => {
      import s.implicits._
      Similarity.q161(documents(s, d), embeddings(s, d),
        Oracles.Bm25Queries.toDF("query_id", "terms"),
        depth = Oracles.HybridDepth)
    }),
    "q162_minimizer_neardup"   -> ((s, d) => Dedup.q162(documents(s, d),
      w = Oracles.MinimizerW, minShared = Oracles.MinimizerShared)),
    "q163_ngram_novelty"       -> ((s, d) => Dedup.q163(documents(s, d))),
    // rows-only: the greedy MMR recurrence is not portable SQL; the
    // spec pins redundancy-avoidance on planted clusters
    "q164_mmr_diversify"       -> ((s, d) => {
      val e = embeddings(s, d)
      Similarity.q164(
        e.filter(org.apache.spark.sql.functions.col("vec_id") < 5), e)
    }),
    "q165_domain_communities"  -> ((s, d) => Graphs.q165(documents(s, d),
      iters = Oracles.LpaIters)),
    "q166_rake_keywords"       -> ((s, d) => TextAnalysis.q166(documents(s, d))),
    "q167_chi2_drift"          -> ((s, d) => TextAnalysis.q167(documents(s, d),
      buckets = Oracles.DsirBuckets)),
    "q168_domain_gini"         -> ((s, d) => UrlCuration.q168(documents(s, d))),
    "q169_semantic_decontam"   -> ((s, d) => {
      val e = embeddings(s, d)
      val id = org.apache.spark.sql.functions.col("vec_id")
      Similarity.q169(e.filter(id >= Oracles.SemBenchIds),
        e.filter(id < Oracles.SemBenchIds), tau = Oracles.SemDecontamTau)
    }),
    "q170_temporal_split"      -> ((s, d) => Events.q170(events(s, d))),
    "q171_shard_rebalance"     -> ((s, d) => Sharding.q171(documents(s, d),
      n = Oracles.ShardN, m = Oracles.ShardM, vnodes = Oracles.ShardVnodes)),
    "q172_attribution"         -> ((s, d) => Events.q172(events(s, d))),
    "q173_hourly_anomaly"      -> ((s, d) => Events.q173(events(s, d))),
    "q174_triangle_count"      -> ((s, d) => Graphs.q174(documents(s, d))),
    "q175_khop_distances"      -> ((s, d) => Graphs.q175(documents(s, d),
      hops = Oracles.KhopHops)),
    "q176_dedup_savings"       -> ((s, d) => Dedup.q176(documents(s, d))),
    "q177_semdedup"            -> ((s, d) => KMeans.q177(embeddings(s, d),
      tau = Oracles.SemDedupTau)),
    "q178_gopher_rules"        -> ((s, d) => TextAnalysis.q178(documents(s, d))),
    "q179_epoch_schedule"      -> ((s, d) => TextAnalysis.q179(documents(s, d),
      budgetFactor = Oracles.EpochBudgetFactor,
      maxEpochs = Oracles.EpochMaxEpochs)),
    "q180_hits"                -> ((s, d) => Graphs.q180(documents(s, d),
      iters = Oracles.HitsIters)),
    "q181_domain_reweight"     -> ((s, d) => TextAnalysis.q181(documents(s, d),
      iters = Oracles.ReweightIters)),
    "q182_rejection_reasons"   -> ((s, d) => Pipeline.q182(documents(s, d),
      tau = Oracles.RejectContamTau,
      labels = Some(clusterLabels(s, d)))),
    "q183_k_anonymity"         -> ((s, d) => Events.q183(events(s, d),
      k = Oracles.KAnonK)),
    "q184_sketch_eval"         -> ((s, d) => Dedup.q184(documents(s, d),
      w = Oracles.MinimizerW, minShared = Oracles.MinimizerShared)),
    "q185_l_diversity"         -> ((s, d) => Events.q185(events(s, d),
      k = Oracles.KAnonK, l = Oracles.LDivL)),
    "q186_contam_runs"         -> ((s, d) => Dedup.q186(documents(s, d))),
    "q187_vocab_richness"      -> ((s, d) => TextAnalysis.q187(documents(s, d))),
    "q188_dup_weight"          -> ((s, d) => Dedup.q188(documents(s, d),
      precomputedLabels = Some(clusterLabels(s, d)))),
    "q189_ks_drift"            -> ((s, d) => TextAnalysis.q189(documents(s, d))),
    "q190_vocab_coverage"      -> ((s, d) => TextAnalysis.q190(documents(s, d))),
    "q191_cluster_purity"      -> ((s, d) => KMeans.q191(embeddings(s, d))),
    "q192_cluster_nmi"         -> ((s, d) => KMeans.q192(embeddings(s, d))),
    "q193_ann_recall"          -> ((s, d) =>
      Similarity.q193Driver(embeddings(s, d), Some(hnswIndexName(s, d)))),
    "q194_burstiness"          -> ((s, d) => TextAnalysis.q194(documents(s, d))),
    "q195_assortativity"       -> ((s, d) => Graphs.q195(documents(s, d))),
    "q196_cond_entropy"        -> ((s, d) => TextAnalysis.q196(documents(s, d))),
    "q197_audio_sample"        -> ((s, d) => Multimodal.q197AudioSample(s, documents(s, d))),
    "q198_audio_neardup"       -> ((s, d) => Multimodal.q198AudioNeardup(s, documents(s, d))),
    "q199_model_langid"        -> ((s, d) => TextAnalysis.q199(documents(s, d))),
    "q200_substring_dedup"     -> ((s, d) => Dedup.q200(documents(s, d))),
    "q201_substr_coverage"     -> ((s, d) => Dedup.q201(documents(s, d))),
    "q202_winnow_skew"         -> ((s, d) => Dedup.q202Driver(documents(s, d))),
    "q203_substr_scrub"        -> ((s, d) => Dedup.q203Driver(documents(s, d))),
    "q204_audio_overlap"       -> ((s, d) => Multimodal.q204Driver(s, documents(s, d))),
    "q205_image_overlap"       -> ((s, d) => Multimodal.q205ImageOverlap(s, documents(s, d))),
    "q206_audio_scrub"         -> ((s, d) => Multimodal.q206Driver(s, documents(s, d))),
    // rows-only: a statistical constellation matcher has no equality
    // oracle (the q204 perceptual lesson); planted attenuated +
    // non-aligned specs carry the correctness argument
    "q207_audio_landmarks"     -> ((s, d) => Multimodal.q207AudioLandmarks(s, documents(s, d))),
    // rows-only: render dims derive from a custom checksum no portable
    // SQL reproduces; area identities + planted scrub specs carry it
    "q208_image_scrub"         -> ((s, d) => Multimodal.q208Driver(s, documents(s, d))),
    // s28 ORC lake surface as a driver-gated row: oracle-exact only if
    // the partitioned-ORC round-trip of documents is value-lossless
    "q209_orc_roundtrip"       -> ((s, d) => graft.sources.Sources.q209OrcDocuments(s, documents(s, d), d)),
    "q213_avro_roundtrip"      -> ((s, d) => graft.sources.Sources.q213AvroDocuments(s, documents(s, d), d)),
    // rows-only: dHash bits are not portable SQL; the planted JPEG
    // re-encode / clip-in-compilation / gapped-diagonal specs carry
    // the correctness argument (the q93/q198/q204 pattern on video)
    "q210_video_neardup"       -> ((s, d) => Multimodal.q210VideoNeardup(s, documents(s, d))),
    "q211_video_overlap"       -> ((s, d) => Multimodal.q211VideoOverlap(s, documents(s, d))),
    "q212_video_scrub"         -> ((s, d) => Multimodal.q212Driver(s, documents(s, d)))
  )

  /** s27 serving path for the q64 family: ONE ClusterIndex fit per
    * (process, sf dir), after which q105/q133/q182/q188 read labels
    * from the bucketed table instead of each re-deriving the same CC
    * fixpoint (r15's single biggest perf lever — ~13% of the clean
    * bench). The first family query of a run pays the fit; the index
    * name is derived from the data dir so different sf dirs never
    * share tables. Labels are bit-identical to the inline path
    * (ClusterIndexSpec fit==inline parity), so the four oracle checks
    * are unchanged. */
  /** Wall-clock seconds spent in one-time ClusterIndex fits this
    * process (Bench reports it as `index_fit_sec` next to the total —
    * r16 review: the fit lands inside the FIRST family query's first
    * run and median-of-3 reads the served cost, so without this the
    * headline total silently omits the fit work the old inline
    * numbers included). */
  @volatile private[graft] var indexFitSec: Double = 0.0

  /** s29 fit-once per dataset (the clusterLabels cadence): the first
    * q193 run fits the persisted HNSW shard graphs and charges the fit
    * to indexFitSec; every later run serves from the loaded artifact —
    * exactly the fit-once/probe-forever split the bench reports. */
  private def hnswIndexName(s: SparkSession, d: String): String = {
    val nm = "graft_ci_" + d.replaceAll("[^A-Za-z0-9]", "_") + "_ann"
    if (!s.catalog.tableExists(
        graft.operators.AnnIndex.hnswTable(nm))) {
      val t0 = System.nanoTime()
      graft.operators.AnnIndex.fitHnsw(embeddings(s, d), nm)
      indexFitSec += (System.nanoTime() - t0) / 1e9
    }
    nm
  }

  private def clusterLabels(s: SparkSession, d: String): DataFrame = {
    val nm = "graft_ci_" + d.replaceAll("[^A-Za-z0-9]", "_")
    if (!s.catalog.tableExists(ClusterIndex.labelsTable(nm))) {
      val t0 = System.nanoTime()
      ClusterIndex.fit(documents(s, d), nm)
      indexFitSec += (System.nanoTime() - t0) / 1e9
    }
    ClusterIndex.labels(s, nm)
  }

  def oracleSql: Map[String, String] = Oracles.sql
}
