package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry corresponds to. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"          -> (Analytics.pricingSummary _),
    "q02_topk_revenue"             -> (Analytics.topkRevenue _),
    "q03_star_join"                -> (Analytics.starJoin _),
    "q04_representative_per_group" -> (Analytics.representativePerGroup _),
    "q05_validated_semi_join"      -> (Analytics.validatedSemiJoin _),
    "q06_new_records_anti_join"    -> (Analytics.newRecordsAntiJoin _),
    "q07_full_outer_enrich"        -> (Analytics.fullOuterEnrich _),
    "q08_rollup_facets"            -> (Analytics.rollupFacets _),
    "q09_distinct_facets"          -> (Analytics.distinctFacets _),
    "q10_explode_tags"             -> (Analytics.explodeTags _),
    "q11_running_window"           -> (Analytics.runningWindow _),
    "q12_conditional_agg"          -> (Analytics.conditionalAgg _),
    "q13_cleanse_metadata"         -> (Cleanse.cleanseMetadata _),
    "q14_cleanse_ugc"              -> (Cleanse.cleanseUgc _),
    "q15_merge_upsert"             -> (Merge.mergeUpsert _),
    "q16_curated_join"             -> (CuratedJoin.curatedJoin _),
    "q17_canonical_remap"          -> (CuratedJoin.canonicalRemap _),
    "q18_serving_export"           -> (Serving.servingExport _),
    "q19_tumbling_window_agg"      -> (graft.streaming.Streams.q19 _),
    "q20_sessionization"           -> (graft.streaming.Streams.q20 _),
    "q21_stream_dedup"             -> (graft.streaming.Streams.q21 _),
    "q22_dedup_exact"              -> (Dedup.exact _),
    "q23_dedup_ngram_jaccard"      -> (ApproxDedup.ngramJaccard _),
    "q24_dedup_minhash_lsh"        -> (ApproxDedup.minhashLsh _),
    "q25_dedup_simhash"            -> (ApproxDedup.simhash _),
    "q26_dedup_embedding"          -> (Dedup.embeddingThreshold _),
    "q27_ann_bruteforce_topk"      -> (Similarity.bruteForceTopK _),
    "q28_ann_lsh_topk"             -> (Similarity.lshTopK _),
    "q29_knn_join"                 -> (Similarity.knnJoin _),
    "q30_lang_id"                  -> (TextAnalysis.langId _),
    "q31_quality_score"            -> (TextAnalysis.qualityScore _),
    "q32_token_count"              -> (TextAnalysis.tokenCount _),
    "q33_fingerprint"              -> (TextAnalysis.fingerprint _),
    "q34_text_preprocess"          -> (TextAnalysis.preprocess _),
    "q35_multimodal_meta"          -> (Multimodal.multimodalMeta _),
    // The gated surface is the FLAT variant — every output column scalar
    // so the driver's sort/hash comparator can canonicalize it. The stub's
    // arithmetic is deterministic integer/double folds over the payload
    // bytes, so the oracle replays it in SQL (Multimodal
    // .imageFeaturizeOracleSql) — full value gate, not rows-only.
    "q36_image_featurize_stub"     -> (Multimodal.imageFeaturizeFlat _),
    "q37_promo_revenue"            -> (Analytics.promoRevenue _),
    "q38_count_distinct"           -> (Serving.countDistinct _),
    "q39_sample_paginate"          -> (Serving.samplePaginate _),
    "q40_dedup_embedding_blocked"  -> (Dedup.embeddingBlockedPairs _),
    "q41_knn_join_blocked"         -> ((s, dir) => Similarity.knnJoinLshBlocked(s, dir)),
    "q42_dedup_incremental"        -> (Dedup.dedupIncrementalQ _),
    "q43_pii_redact"               -> (Curation.piiRedact _),
    "q44_decontaminate"            -> (Curation.decontaminate _),
    "q45_corpus_filter"            -> (Curation.corpusFilter _),
    "q46_dedup_cc"                 -> (Cluster.dedupClusters _),
    "q47_stratified_sample"        -> (Sampling.stratifiedSample _),
    "q48_pack_sequences"           -> (Packing.packSequences _),
    "q49_domain_rebalance"         -> (Sampling.domainRebalance _),
    "q50_funnel"                   -> (Analytics.funnel _),
    "q51_group_quantiles"          -> (Analytics.groupQuantiles _),
    "q52_cdc_chunks"               -> (TextAnalysis.cdcChunksExploded _),
    "q53_salted_join"              -> (Skew.saltedJoinQ _),
    "q54_ann_multiprobe"           -> (Similarity.lshTopKMultiprobeQ _),
    "q55_facet_search"             -> (Serving.facetSearchQ _),
    "q56_envelope_parse"           -> (graft.sources.Ingest.parseEnvelopeQ _),
    "q57_asof_join"                -> (Temporal.asofJoin _),
    "q58_interval_join"            -> (Temporal.intervalJoin _),
    "q59_semdedup"                 -> (SemDedup.semDedup _),
    "q60_bm25"                     -> (Search.bm25 _),
    "q61_repetition_filter"        -> (Curation.repetitionFilter _),
    "q62_dup_passage"              -> (Curation.dupPassage _),
    "q63_kmeans"                   -> (KMeansOp.kmeans _),
    "q64_group_sample"             -> (Sampling.groupSample _),
    "q65_ann_ivf"                  -> (Similarity.ivfTopKExact _),
    "q66_int8_quantize"            -> (Quantize.int8Quantize _),
    "q67_lm_score"                 -> (Search.lmScore _),
    "q68_cms_counts"               -> (Sketch.cmsUserCounts _),
    "q69_tfidf_topterms"           -> (Search.tfidfTopTerms _),
    "q70_bloom_membership"         -> (Sketch.bloomMembership _),
    "q71_dedup_incremental_text"   -> (ApproxDedup.dedupIncrementalText _),
    "q72_ann_ivf_indexed"          -> (IvfIndex.ivfIndexedTopK _),
    "q73_zorder"                   -> (ZOrder.zorderEvents _),
    "q74_hll_distinct"             -> (Hll.hllDistinct _),
    "q75_doc_chunks"               -> (Chunking.docChunks _),
    "q76_bigram_counts"            -> (Curation.bigramCounts _),
    "q77_winsorize"                -> (Analytics.winsorize _),
    "q78_time_decay"               -> (Temporal.timeDecay _),
    "q79_containment"              -> (ApproxDedup.containmentPairs _),
    "q80_rolling_features"         -> (Analytics.rollingFeatures _),
    "q81_percentile_rank"          -> (Analytics.percentileRank _),
    "q82_schema_merge"             -> (graft.sources.Ingest.schemaMergeRead _),
    "q83_heavy_hitters"            -> (Analytics.heavyHitters _),
    "q84_profile_audit"            -> (Cleanse.profileAudit _),
    "q85_event_gaps"               -> (Temporal.eventGaps _),
    "q86_snapshot_diff"            -> (Merge.snapshotDiffQ _),
    "q87_pagerank"                 -> (Cluster.pagerank _),
    "q88_cohort_retention"         -> (Analytics.cohortRetention _),
    "q89_feature_hash"             -> (TextAnalysis.featureHash _),
    "q90_group_corr"               -> (Analytics.groupCorr _),
    "q91_value_histogram"          -> (Analytics.valueHistogram _),
    "q92_facet_cube"               -> (Analytics.facetCube _),
    "q93_dedup_survivor"           -> (Cluster.dedupSurvivor _),
    "q94_source_gate"              -> (Analytics.sourceGate _),
    "q95_hopping_window"           -> (graft.streaming.Streams.q95 _),
    "q96_rate_anomaly"             -> (Temporal.rateAnomaly _),
    "q97_group_quantiles_2pass"    -> (Analytics.groupQuantiles2Pass _),
    "q98_percentile_rank_2pass"    -> (Analytics.percentileRank2Pass _),
    "q99_winsorize_2pass"          -> (Analytics.winsorize2Pass _),
    "q100_csv_roundtrip"           -> (graft.sources.Ingest.csvRoundtrip _),
    "q101_orc_roundtrip"           -> (graft.sources.Ingest.orcRoundtrip _),
    "q102_dedup_canonical"         -> (Dedup.exactCanonical _),
    "q103_json_roundtrip"          -> (graft.sources.Ingest.jsonRoundtrip _),
    "q104_semdedup_trained"        -> (SemDedup.semDedupTrained(_, _)),
    "q105_frame_sample"            -> (Multimodal.frameSample _),
    "q106_resize_stub"             -> (Multimodal.imageResizeFlat _),
    "q107_events_gate"             -> (Curation.eventsGate _),
    "q108_embeddings_gate"         -> (Curation.embeddingsGate _),
    "q109_postings_lookup"         -> (PostingsIndex.lookup _),
    "q110_bpe_merges"              -> ((s: SparkSession, d: String) => BpeTrain.bpeMerges(s, d)),
    "q111_pq_adc"                  -> (PqOp.pqAdcTopK _),
    "q112_pq_rerank"               -> ((s: SparkSession, d: String) => PqOp.pqRerankTopK(s, d)),
    "q113_bpe_encode"              -> ((s: SparkSession, d: String) => BpeTrain.bpeEncode(s, d)),
    "q114_compaction"              -> (Compact.compactRead _),
    "q115_below_avg"               -> ((s: SparkSession, d: String) => Analytics.belowAvgRevenue(s, d)),
    "q116_lone_late_supplier"      -> ((s: SparkSession, d: String) => Analytics.loneLateSupplier(s, d)),
    "q117_label_propagation"       -> (Cluster.labelPropagation _),
    "q118_bigram_lm"               -> ((s: SparkSession, d: String) => Search.bigramLmScore(s, d)),
    "q119_related_terms"           -> ((s: SparkSession, d: String) => Serving.relatedTerms(s, d)),
    "q120_hll_window"              -> ((s: SparkSession, d: String) => Hll.hllWindowDistinct(s, d)),
    "q121_corpus_overlap"          -> ((s: SparkSession, d: String) => Curation.corpusOverlap(s, d)),
    "q122_event_transitions"       -> ((s: SparkSession, d: String) => Temporal.eventTransitions(s, d)),
    "q123_top_supplier"            -> ((s: SparkSession, d: String) => Analytics.topSupplier(s, d)),
    "q124_nation_concentration"    -> ((s: SparkSession, d: String) => Analytics.nationConcentration(s, d)),
    "q125_big_orders"              -> ((s: SparkSession, d: String) => Analytics.bigOrders(s, d)),
    "q126_dormant_customers"       -> ((s: SparkSession, d: String) => Analytics.dormantCustomers(s, d)),
    "q127_dominant_supplier"       -> ((s: SparkSession, d: String) => Analytics.dominantSupplier(s, d)),
    "q128_binary_ingest"           -> (graft.sources.Ingest.binaryIngest _),
    "q129_ann_recall"              -> (Similarity.annRecall _),
    "q130_embed_standardize"       -> (Quantize.standardize _),
    "q131_session_window"          -> (graft.streaming.Streams.q131 _),
    "q132_status_pivot"            -> ((s: SparkSession, d: String) => Reshape.statusPivot(s, d)),
    "q133_metrics_unpivot"         -> ((s: SparkSession, d: String) => Reshape.nationMetricsUnpivot(s, d)),
    "q134_grouping_sets"           -> ((s: SparkSession, d: String) => Reshape.facetGroupingSets(s, d)),
    "q135_scd2"                    -> ((s: SparkSession, d: String) => Temporal.scd2(s, d)),
    "q136_trade_volume"            -> ((s: SparkSession, d: String) => Analytics.tradeVolume(s, d)),
    "q137_market_share"            -> ((s: SparkSession, d: String) => Analytics.marketShare(s, d)),
    "q138_triangle_support"        -> ((s: SparkSession, d: String) => Cluster.triangleSupport(s, d)),
    "q139_partition_checksum"      -> ((s: SparkSession, d: String) => Cleanse.partitionChecksum(s, d)),
    "q140_incremental_agg"         -> ((s: SparkSession, d: String) => Merge.incrementalAgg(s, d)),
    "q141_split_leakage"           -> ((s: SparkSession, d: String) => Curation.splitLeakage(s, d)),
    "q142_ngram_novelty"           -> ((s: SparkSession, d: String) => Curation.ngramNovelty(s, d)),
    "q143_epoch_shuffle"           -> ((s: SparkSession, d: String) => Sampling.epochShuffle(s, d)),
    "q144_text_roundtrip"          -> ((s: SparkSession, d: String) => graft.sources.Ingest.textRoundtrip(s, d)),
    "q145_quality_budget"          -> ((s: SparkSession, d: String) => Sampling.qualityBudget(s, d)),
    "q146_group_trend"             -> ((s: SparkSession, d: String) => Analytics.groupTrend(s, d)),
    "q147_ref_integrity"           -> ((s: SparkSession, d: String) => Cleanse.refIntegrity(s, d)),
    "q148_quantile_audit"          -> ((s: SparkSession, d: String) => Analytics.approxQuantileAudit(s, d)),
    "q149_forget_cascade"          -> ((s: SparkSession, d: String) => Curation.forgetCascade(s, d)),
    "q150_cdc_apply"               -> ((s: SparkSession, d: String) => Merge.cdcApply(s, d)),
    "q151_point_in_time"           -> ((s: SparkSession, d: String) => Temporal.pointInTimeJoin(s, d)),
    "q152_rank_family"             -> ((s: SparkSession, d: String) => Analytics.rankFamily(s, d)),
    "q153_set_ops"                 -> ((s: SparkSession, d: String) => Analytics.setOps(s, d)),
    "q154_mad_outliers"            -> ((s: SparkSession, d: String) => Analytics.madOutliers(s, d)),
    "q155_domain_drift"            -> ((s: SparkSession, d: String) => Curation.domainDrift(s, d)),
    "q156_split_manifest"          -> ((s: SparkSession, d: String) => Sampling.splitManifest(s, d)),
    "q157_ivf_upsert"              -> ((s: SparkSession, d: String) => IvfIndex.ivfUpsertTopK(s, d)),
    "q158_contamination_hops"      -> ((s: SparkSession, d: String) => Cluster.contaminationHops(s, d)),
    "q159_nearest_event"           -> ((s: SparkSession, d: String) => Temporal.nearestEventJoin(s, d)),
    "q160_anti_entropy_repair"     -> ((s: SparkSession, d: String) => Cleanse.antiEntropyRepair(s, d)),
    "q161_pareto_front"            -> ((s: SparkSession, d: String) => Analytics.paretoFront(s, d)),
    "q162_hybrid_rrf"              -> ((s: SparkSession, d: String) => Fusion.hybridRrf(s, d)),
    "q163_fuzzy_match"             -> ((s: SparkSession, d: String) => ApproxDedup.fuzzyMatch(s, d)),
    "q164_ab_welch"                -> ((s: SparkSession, d: String) => Analytics.abWelch(s, d)),
    "q165_char_entropy"            -> ((s: SparkSession, d: String) => CharEntropy.charEntropy(s, d)),
    "q166_cusum_changepoint"       -> ((s: SparkSession, d: String) => Temporal.cusumChangepoint(s, d)),
    "q167_ann_filtered"            -> ((s: SparkSession, d: String) => Similarity.filteredTopK(s, d)),
    "q168_mmr_diversify"           -> ((s: SparkSession, d: String) => Mmr.mmrDiversify(s, d)),
    "q169_seasonal_anomaly"        -> ((s: SparkSession, d: String) => Temporal.seasonalAnomaly(s, d)),
    "q170_rfm_segment"             -> ((s: SparkSession, d: String) => Analytics.rfmSegment(s, d)),
    "q171_embedding_drift"         -> ((s: SparkSession, d: String) => Curation.embeddingDrift(s, d)),
    "q172_wilson_rank"             -> ((s: SparkSession, d: String) => Serving.wilsonRank(s, d)),
    "q173_boilerplate_ngrams"      -> ((s: SparkSession, d: String) => Curation.boilerplateNgrams(s, d)),
    "q174_dsir_weights"            -> ((s: SparkSession, d: String) => Curation.dsirWeights(s, d)),
    "q175_weighted_sample"         -> ((s: SparkSession, d: String) => Sampling.weightedSample(s, d)),
    "q176_embed_covariance"        -> ((s: SparkSession, d: String) => Quantize.embedCovariance(s, d)),
    "q177_tokenizer_fertility"     -> ((s: SparkSession, d: String) => BpeTrain.fertility(s, d)),
    "q178_line_dedup"              -> ((s: SparkSession, d: String) => Curation.lineDedup(s, d)),
    "q179_temperature_mix"         -> ((s: SparkSession, d: String) => Sampling.temperatureMix(s, d)),
    "q180_hard_negatives"          -> ((s: SparkSession, d: String) => Similarity.hardNegatives(s, d)),
    "q181_cluster_silhouette"      -> ((s: SparkSession, d: String) => KMeansOp.silhouette(s, d)),
    "q182_cooccurrence"            -> ((s: SparkSession, d: String) => Curation.cooccurrence(s, d)),
    "q183_pq_recall"               -> ((s: SparkSession, d: String) => PqOp.pqRecall(s, d)),
    "q184_zipf_fit"                -> ((s: SparkSession, d: String) => Search.zipfFit(s, d)),
    "q185_packing_efficiency"      -> ((s: SparkSession, d: String) => Packing.packingEfficiency(s, d)),
    "q186_langid_confusion"        -> ((s: SparkSession, d: String) => TextAnalysis.langidConfusion(s, d)),
    "q187_minhash_calibration"     -> ((s: SparkSession, d: String) => ApproxDedup.minhashCalibration(s, d)),
    "q188_ivfpq"                   -> ((s: SparkSession, d: String) => IvfPq.ivfpqTopK(s, d)),
    "q189_brand_affinity"          -> ((s: SparkSession, d: String) => Itemsets.brandAffinity(s, d)),
    "q190_jl_distortion"           -> ((s: SparkSession, d: String) => RandomProjection.jlDistortion(s, d)),
    "q191_cluster_terms"           -> ((s: SparkSession, d: String) => TopicProfile.clusterTerms(s, d)),
    "q192_auc"                     -> ((s: SparkSession, d: String) => Eval.aucOneVsRest(s, d)),
    "q193_gains"                   -> ((s: SparkSession, d: String) => Eval.gainsDeciles(s, d)),
    "q194_phrase_search"           -> ((s: SparkSession, d: String) => PhraseSearch.phraseSearch(s, d)),
    "q195_kcore"                   -> ((s: SparkSession, d: String) => Cluster.kcore(s, d)),
    "q196_rank_quality"            -> ((s: SparkSession, d: String) => Similarity.rankQuality(s, d)),
    "q197_bm25_wand"               -> (PostingsIndex.bm25TopK _),
    "q198_ivfpq_recall"            -> (IvfPq.ivfpqRecall _),
    "q199_attribution"             -> (graft.streaming.Streams.q199 _),
    "q200_calibration"             -> ((s: SparkSession, d: String) => Eval.calibration(s, d)),
    "q201_table_stats"             -> ((s: SparkSession, d: String) => TableStats.tableStats(s, d)),
    "q202_source_similarity"       -> ((s: SparkSession, d: String) => ApproxDedup.sourceSimilarity(s, d)),
    "q203_qdigest"                 -> ((s: SparkSession, d: String) => QDigest.qdigest(s, d)),
    "q204_term_burstiness"         -> ((s: SparkSession, d: String) => Curation.termBurstiness(s, d)),
    "q205_join_cardinality"        -> ((s: SparkSession, d: String) => Sketch.joinCardinality(s, d)),
    "q206_fd_audit"                -> ((s: SparkSession, d: String) => TableStats.fdAudit(s, d)),
    "q207_zonemap_audit"           -> ((s: SparkSession, d: String) => ZOrder.zonemapAudit(s, d)),
    "q208_common_neighbors"        -> ((s: SparkSession, d: String) => Cluster.commonNeighbors(s, d)),
    "q209_kmv_overlap"             -> ((s: SparkSession, d: String) => Sketch.kmvOverlap(s, d)),
    "q210_bucketed_join"           -> (Bucketing.bucketedJoin _),
    "q211_k_anonymity"             -> ((s: SparkSession, d: String) => Curation.kAnonymity(s, d)),
    "q212_join_skew_audit"         -> ((s: SparkSession, d: String) => Skew.joinSkewAudit(s, d)),
    "q213_table_stats_sketch"      -> ((s: SparkSession, d: String) => TableStats.tableStatsSketch(s, d)),
    "q214_bucketed_fact_join"      -> (Bucketing.bucketedLineitemJoin _),
    "q215_containment_blocked"     -> (ApproxDedup.containmentBlocked _),
    "q216_substring_dedup"         -> (SubstringDedup.duplicatedRegions _),
    "q217_quality_classifier"      -> ((s: SparkSession, d: String) => QualityClassifier.trainScore(s, d)),
    "q218_langid_classifier"       -> ((s: SparkSession, d: String) => LangClassifier.trainScore(s, d)),
    "q219_acceptance_report"       -> ((s: SparkSession, d: String) => Eval.acceptanceReport(s, d)),
  )

  /** Shared CTE block computing blocked 3-gram Jaccard candidate pairs
    * (`p`: a_id, b_id, common, na, nb) — the oracle core for q23/q24 and
    * the edge set for q46's transitive closure. */
  private val jaccardPairCtes: String =
    """w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ws FROM documents),
      |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN []
      |  ELSE list_distinct(list_transform(range(1, len(ws)-1),
      |         i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) END AS s FROM w),
      |e AS (SELECT doc_id, unnest(s) AS shingle, len(s) AS n FROM sh),
      |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common,
      |    any_value(a.n) AS na, any_value(b.n) AS nb
      |  FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  /** Exact blocked 3-gram Jaccard pairs at τ=0.8 — oracle for both q23
    * (which computes exactly this) and q24 (whose LSH candidates verify
    * to the same set; see the banding recall note at the map entry). */
  private val exactJaccardSql: String =
    s"""WITH $jaccardPairCtes
      |SELECT a_id, b_id, common, na, nb,
      |  CAST(common AS DOUBLE)/(na+nb-common) AS jaccard
      |FROM p WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.8
      |ORDER BY a_id, b_id""".stripMargin

  /** q138 oracle: ordered-edge triangle enumeration over the τ=0.8
    * Jaccard pairs — each a<b<c counted once by the wedge (a,b),(b,c)
    * closed by (a,c); every role credits its doc. */
  private val triangleSupportSql: String =
    s"""WITH $jaccardPairCtes,
      |pr AS (SELECT a_id, b_id FROM p
      |  WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.8),
      |tri AS (SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
      |  FROM pr e1 JOIN pr e2 ON e2.a_id = e1.b_id
      |  JOIN pr e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id),
      |roles AS (SELECT a AS doc_id FROM tri
      |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
      |FROM roles GROUP BY 1 ORDER BY 1""".stripMargin

  /** q46 oracle: transitive closure (recursive reachability) over the
    * τ=0.8 Jaccard pair edges; cluster id = min reachable doc_id. */
  private val dedupCcSql: String =
    s"""WITH RECURSIVE $jaccardPairCtes,
      |pairs AS (SELECT a_id, b_id FROM p
      |  WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.8),
      |und AS (SELECT a_id AS s, b_id AS d FROM pairs
      |  UNION SELECT b_id, a_id FROM pairs),
      |reach(s, d) AS (SELECT doc_id, doc_id FROM documents
      |  UNION SELECT r.s, u.d FROM reach r JOIN und u ON r.d = u.s),
      |lab AS (SELECT s AS doc_id, MIN(d) AS cluster_id FROM reach GROUP BY s)
      |SELECT doc_id, cluster_id,
      |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
      |FROM lab ORDER BY doc_id""".stripMargin

  /** q117 oracle: the same synchronous majority-vote label propagation
    * unrolled — edges from the shared pair CTE, seeds fixed, majority
    * tie-break (count desc, label asc), keep-previous when no labeled
    * neighbor. */
  private val labelPropSql: String = {
    val rounds = (1 to operators.Cluster.LpRounds).map { r =>
      s"""lpv$r AS (SELECT lpe.dst, l.label, COUNT(*) AS c
         |  FROM lpe JOIN lp${r - 1} l ON l.doc_id = lpe.src
         |  WHERE l.label IS NOT NULL GROUP BY lpe.dst, l.label),
         |lpb$r AS (SELECT dst, label FROM (
         |    SELECT dst, label, ROW_NUMBER() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn
         |    FROM lpv$r) WHERE rn = 1),
         |lp$r AS (SELECT l.doc_id,
         |    CASE WHEN l.doc_id % ${operators.Cluster.LpSeedMod} = 0 THEN l.label
         |         ELSE coalesce(b.label, l.label) END AS label
         |  FROM lp${r - 1} l LEFT JOIN lpb$r b ON b.dst = l.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $jaccardPairCtes,
      |lpj AS (SELECT a_id, b_id FROM p
      |  WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.8),
      |lpe AS (SELECT a_id AS src, b_id AS dst FROM lpj
      |  UNION ALL SELECT b_id, a_id FROM lpj),
      |lp0 AS (SELECT doc_id,
      |  CASE WHEN doc_id % ${operators.Cluster.LpSeedMod} = 0 THEN coalesce(lang, '') END AS label
      |  FROM documents),
      |$rounds
      |SELECT doc_id, coalesce(label, '') AS label
      |FROM lp${operators.Cluster.LpRounds} ORDER BY doc_id""".stripMargin
  }

  /** q121 oracle: A/B split, exact-hash membership, cross-boundary
    * filter over the shared τ=0.8 pair CTE, per-language rollup. */
  private val corpusOverlapSql: String =
    s"""WITH $jaccardPairCtes,
      |coj AS (SELECT a_id, b_id FROM p
      |  WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.8),
      |ah AS (SELECT DISTINCT md5(text) AS h FROM documents
      |  WHERE doc_id % 2 = 0 AND text IS NOT NULL),
      |eb AS (SELECT DISTINCT d.doc_id FROM documents d JOIN ah ON md5(d.text) = ah.h
      |  WHERE d.doc_id % 2 = 1 AND d.text IS NOT NULL),
      |nrb AS (SELECT DISTINCT doc_id FROM (
      |  SELECT a_id AS doc_id FROM coj WHERE a_id % 2 = 1 AND b_id % 2 = 0
      |  UNION ALL SELECT b_id FROM coj WHERE b_id % 2 = 1 AND a_id % 2 = 0)),
      |ob AS (SELECT d.doc_id, coalesce(d.lang, '') AS lang,
      |    CASE WHEN eb.doc_id IS NOT NULL THEN 1 ELSE 0 END AS ex,
      |    CASE WHEN nrb.doc_id IS NOT NULL THEN 1 ELSE 0 END AS nr
      |  FROM documents d LEFT JOIN eb ON eb.doc_id = d.doc_id
      |  LEFT JOIN nrb ON nrb.doc_id = d.doc_id
      |  WHERE d.doc_id % 2 = 1)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_incoming,
      |  CAST(SUM(ex) AS BIGINT) AS exact_dups,
      |  CAST(SUM(nr) AS BIGINT) AS near_dups,
      |  ROUND(CAST(SUM(nr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS near_frac_r
      |FROM ob GROUP BY lang ORDER BY lang""".stripMargin

  /** q87 oracle: the same integer fixed-point PageRank unrolled — edges
    * from the shared pair CTE, per-round floor-div contributions, the
    * isolated-node closed form via LEFT JOIN + COALESCE(base). */
  private val pagerankSql: String = {
    val R = operators.Cluster.PrMass
    val rounds = (1 to operators.Cluster.PrRounds).map { i =>
      val prev = if (i == 1) "rr0" else s"rr${i - 1}"
      s"""rr$i AS (SELECT u.d AS id,
         |  (SELECT base FROM consts) + 85 * CAST(SUM(p2.r // u.deg) AS BIGINT) // 100 AS r
         |  FROM undeg u JOIN $prev p2 ON p2.id = u.s GROUP BY u.d)""".stripMargin
    }.mkString(",\n")
    s"""WITH $jaccardPairCtes,
       |prs AS (SELECT a_id, b_id FROM p
       |  WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.8),
       |und AS (SELECT a_id AS s, b_id AS d FROM prs
       |  UNION ALL SELECT b_id, a_id FROM prs),
       |degs AS (SELECT s, COUNT(*) AS deg FROM und GROUP BY s),
       |undeg AS (SELECT und.s, und.d, degs.deg FROM und JOIN degs USING (s)),
       |consts AS (SELECT $R // COUNT(*) AS r0,
       |  15 * ($R // COUNT(*)) // 100 AS base FROM documents),
       |rr0 AS (SELECT DISTINCT s AS id, (SELECT r0 FROM consts) AS r FROM und),
       |$rounds
       |SELECT d.doc_id, COALESCE(rr${operators.Cluster.PrRounds}.r,
       |  (SELECT base FROM consts)) AS pr_int
       |FROM documents d LEFT JOIN rr${operators.Cluster.PrRounds}
       |  ON rr${operators.Cluster.PrRounds}.id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Winsorization oracle: exact rank-selected [p01, p99] clamp over
    * non-null values — shared by q77 (window-sort plan) and q99 (its
    * two-pass bucket-selection twin, identical output by construction). */
  private val winsorizeSql: String =
    """WITH r AS (SELECT event_type, value, event_id,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |  COUNT(*) OVER (PARTITION BY event_type) AS n
      | FROM events WHERE value IS NOT NULL),
      |b AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
      |  MAX(CASE WHEN rn = CEIL(n * 0.01) THEN value END) AS lo,
      |  MAX(CASE WHEN rn = CEIL(n * 0.99) THEN value END) AS hi
      | FROM r GROUP BY event_type)
      |SELECT e.event_type, MAX(b.n_events) AS n_events,
      |  MAX(b.lo) AS lo, MAX(b.hi) AS hi,
      |  CAST(SUM(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
      |  CAST(SUM(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
      |  CAST(SUM(CAST(FLOOR(LEAST(GREATEST(e.value, b.lo), b.hi) * 1e6) AS BIGINT)) AS BIGINT) AS clamped_sum_micro
      |FROM events e JOIN b USING (event_type)
      |WHERE e.value IS NOT NULL
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** DuckDB-equivalent SQL for each oracle-able query (same column names,
    * same ordering, DECIMAL-exact aggregates cast to DOUBLE). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_topk_revenue" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q03_star_join" ->
      """SELECT n_name,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q04_representative_per_group" ->
      """SELECT o_custkey, first_orderkey, first_orderdate FROM (
        | SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        | FROM orders) t WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q05_validated_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q06_new_records_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q07_full_outer_enrich" ->
      """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        | COALESCE(c.n_customers, 0) AS n_customers,
        | COALESCE(s.n_suppliers, 0) AS n_suppliers
        |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
        |ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin,
    "q08_rollup_facets" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        | CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, n_customers""".stripMargin,
    "q09_distinct_facets" ->
      "SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment",
    "q10_explode_tags" ->
      """SELECT word, COUNT(*) AS n
        |FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> '' GROUP BY word ORDER BY n DESC, word""".stripMargin,
    "q11_running_window" ->
      """SELECT user_id, ts, event_id,
        | COUNT(*) OVER w AS running_events,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(20,4))) OVER w AS VARCHAR) AS DOUBLE) AS running_value
        |FROM events WHERE user_id < 100
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q12_conditional_agg" ->
      """SELECT user_id,
        | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        | CAST(CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(20,4)) ELSE CAST(0 AS DECIMAL(20,4)) END) AS VARCHAR) AS DOUBLE) AS purchase_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q13_cleanse_metadata" ->
      """SELECT doc_id, text,
        | CASE WHEN TRIM(lang) = '' THEN NULL ELSE lang END AS lang,
        | CASE WHEN TRIM(source) = '' THEN NULL ELSE source END AS source,
        | n_chars
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY n_chars DESC, source ASC NULLS LAST) AS rn
        |      FROM documents
        |      WHERE doc_id IS NOT NULL AND text IS NOT NULL AND TRIM(text) <> '') t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q14_cleanse_ugc" ->
      """SELECT user_id, event_type, ts, event_id,
        | CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INTEGER) AS k, value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts, event_id) AS rn
        |      FROM events WHERE ts > TIMESTAMP '2024-01-10 00:00:00') t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q15_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |batch AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |         o_totalprice + 10.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM batch
        |UNION ALL
        |SELECT b.* FROM base b WHERE NOT EXISTS
        |  (SELECT 1 FROM batch x WHERE x.o_orderkey = b.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q16_curated_join" ->
      """SELECT c_custkey, c_name, c_nationkey,
        | COALESCE(a.n_orders, 0) AS n_orders,
        | COALESCE(a.total_spent, 0.0) AS total_spent
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders,
        |             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE) AS total_spent
        |           FROM orders GROUP BY o_custkey) a
        |ON c_custkey = a.o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q17_canonical_remap" ->
      """SELECT vec_id, label, canonical_id, cluster_size
        |FROM embeddings
        |JOIN (SELECT label, MIN(vec_id) AS canonical_id, COUNT(*) AS cluster_size
        |      FROM embeddings GROUP BY label) m USING (label)
        |ORDER BY vec_id""".stripMargin,
    "q18_serving_export" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS event_date,
        | UPPER(event_type) AS event_type,
        | CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS value,
        | CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q19_tumbling_window_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | COUNT(*) AS n_events,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q20_sessionization" ->
      """WITH x AS (SELECT user_id, ts, event_id, value,
        |  epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (SELECT user_id, ts, value,
        |  SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM x)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        | MIN(ts) AS session_start, MAX(ts) AS session_end,
        | COUNT(*) AS n_events,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM y GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "q21_stream_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts) AS rn
        |      FROM (SELECT * FROM events UNION ALL SELECT * FROM events))
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q22_dedup_exact" ->
      """WITH d AS (SELECT doc_id, md5(translate(lower(trim(text)), 'ς', 'σ')) AS content_hash FROM documents),
        |c AS (SELECT content_hash AS ch, MIN(doc_id) AS canonical_id, COUNT(*) AS cluster_size
        |      FROM d GROUP BY content_hash)
        |SELECT doc_id, content_hash, canonical_id, cluster_size
        |FROM d JOIN c ON d.content_hash IS NOT DISTINCT FROM c.ch
        |ORDER BY doc_id""".stripMargin,
    "q23_dedup_ngram_jaccard" -> exactJaccardSql,
    "q102_dedup_canonical" -> Dedup.exactCanonicalOracleSql,
    // oracle for the LSH path is the exact blocked Jaccard: at 32x4
    // banding a J>=0.8 pair is missed with probability < 1e-7, so the
    // verified LSH output must equal the exact result.
    "q24_dedup_minhash_lsh" -> exactJaccardSql,
    "q25_dedup_simhash" ->
      """WITH w AS (SELECT doc_id,
        |  list_transform(list_filter(string_split(text,' '), x -> x <> ''),
        |    w2 -> CAST(('0x'||substring(md5(w2),1,15)) AS BIGINT)) AS hw FROM documents),
        |sim AS (SELECT doc_id,
        |  CASE WHEN hw IS NULL THEN NULL ELSE
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(0,60), j -> CASE WHEN
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(hw, h -> 2*((h >> j) & 1) - 1)), (x,y) -> x+y) > 0
        |      THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE CAST(0 AS BIGINT) END)),
        |    (x,y) -> x+y) END AS simhash FROM w),
        |banded AS (SELECT doc_id, simhash, t.b AS band,
        |  (simhash >> (CAST(t.b AS INTEGER)*15)) & 32767 AS band_key
        |  FROM sim, range(0,4) t(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.simhash AS ha, b.simhash AS hb
        |  FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id <> b.doc_id),
        |counts AS (SELECT a_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_band_candidates,
        |    CAST(SUM(CASE WHEN bit_count(xor(ha,hb)) <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_hamming_le3
        |  FROM cand GROUP BY 1)
        |SELECT s.doc_id, s.simhash,
        |  COALESCE(c.n_band_candidates, 0) AS n_band_candidates,
        |  COALESCE(c.n_hamming_le3, 0) AS n_hamming_le3
        |FROM sim s LEFT JOIN counts c USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q26_dedup_embedding" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(range(1, len(e)+1), i -> e[i]*e[i])), (x,y) -> x+y)) AS nrm FROM v),
        |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i])), (x,y) -> x+y)
        |   / (a.nrm * b.nrm) AS sim
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id),
        |pf AS (SELECT * FROM p WHERE sim >= 0.97),
        |nb AS (SELECT a_id AS vec_id, b_id AS nbr FROM pf
        |       UNION ALL SELECT b_id, a_id FROM pf),
        |ag AS (SELECT vec_id, MIN(nbr) AS min_nbr, COUNT(*) AS n_neighbors FROM nb GROUP BY vec_id)
        |SELECT e.vec_id,
        |  LEAST(e.vec_id, COALESCE(ag.min_nbr, e.vec_id)) AS canonical_id,
        |  COALESCE(ag.n_neighbors, 0) AS n_neighbors
        |FROM (SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL) e
        |LEFT JOIN ag USING (vec_id) ORDER BY vec_id""".stripMargin,
    "q27_ann_bruteforce_topk" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(range(1, len(e)+1), i -> e[i]*e[i])), (x,y) -> x+y)) AS nrm FROM v),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(range(1, len(q.e)+1), i -> q.e[i]*c.e[i])), (x,y) -> x+y)
        |   / (q.nrm * c.nrm) AS sim
        |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM p)
        |SELECT query_id, neighbor_id, rank, ROUND(sim, 9) AS sim_r
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "q28_ann_lsh_topk" -> Similarity.lshTopKOracleSql,
    "q29_knn_join" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(range(1, len(e)+1), i -> e[i]*e[i])), (x,y) -> x+y)) AS nrm FROM v),
        |p AS (SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i])), (x,y) -> x+y)
        |   / (a.nrm * b.nrm) AS sim
        |  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
        |r AS (SELECT src_id, nbr_id, sim,
        |  ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY sim DESC, nbr_id) AS rank
        |  FROM p)
        |SELECT src_id, nbr_id, rank, ROUND(sim, 9) AS sim_r
        |FROM r WHERE rank <= 3 ORDER BY src_id, rank""".stripMargin,
    "q30_lang_id" ->
      """WITH t AS (SELECT doc_id,
        |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['the','a','of','and','to','in','is'], w))) AS score_en,
        |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['el','la','de','y','que','en','un'], w))) AS score_es,
        |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['der','die','das','und','ist','ein','nicht'], w))) AS score_de,
        |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['le','la','de','et','les','des','un'], w))) AS score_fr
        | FROM documents)
        |SELECT doc_id, score_en, score_es, score_de, score_fr,
        | CASE WHEN score_en=0 AND score_es=0 AND score_de=0 AND score_fr=0 THEN 'unknown'
        |      WHEN score_en>=score_es AND score_en>=score_de AND score_en>=score_fr THEN 'en'
        |      WHEN score_es>=score_de AND score_es>=score_fr THEN 'es'
        |      WHEN score_de>=score_fr THEN 'de'
        |      ELSE 'fr' END AS pred_lang
        |FROM t ORDER BY doc_id""".stripMargin,
    "q31_quality_score" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(length(text) AS DOUBLE) AS n_chars_f,
        |  CAST(len(list_filter(string_split(text,' '), w -> w <> '')) AS DOUBLE) AS n_words,
        |  CAST(len(list_distinct(list_filter(string_split(text,' '), w -> w <> ''))) AS DOUBLE) AS n_uniq,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) AS n_punct,
        |  CAST(len(list_filter(string_split(lower(text),' '), w -> list_contains(['the','a','of','and','to','in','is'], w))) AS DOUBLE) AS n_stop
        | FROM documents),
        |r AS (SELECT doc_id, n_words,
        |  CASE WHEN n_words > 0 THEN n_uniq / n_words ELSE 0.0 END AS uniq_ratio,
        |  CASE WHEN n_chars_f > 0 THEN n_punct / n_chars_f ELSE 0.0 END AS punct_ratio,
        |  CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0 END AS stop_ratio FROM f)
        |SELECT doc_id, n_words, uniq_ratio, punct_ratio, stop_ratio,
        | 0.3 * least(n_words / 200.0, 1.0) + 0.3 * uniq_ratio
        | + 0.2 * (1.0 - punct_ratio) + 0.2 * least(stop_ratio * 5.0, 1.0) AS quality
        |FROM r ORDER BY doc_id""".stripMargin,
    "q32_token_count" ->
      """SELECT doc_id,
        | len(list_filter(string_split(text,' '), w -> w <> '')) AS n_ws_tokens,
        | len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS n_re_tokens,
        | length(text) AS n_chars_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_fingerprint" ->
      """SELECT doc_id,
        | CASE WHEN text IS NULL THEN NULL ELSE
        | list_reduce(
        |   list_prepend(CAST(0 AS BIGINT),
        |     list_transform(list_filter(string_split(text,' '), w -> w <> ''),
        |       w -> CAST(('0x' || substring(md5(w),1,15)) AS BIGINT) % 1000000007)),
        |   (acc, x) -> (acc * 31 + x) % 1000000007) END AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q34_text_preprocess" ->
      """SELECT doc_id,
        | translate(lower(trim(substring(concat_ws(' ', COALESCE(source,''), COALESCE(lang,''), text), 1, 150))), 'ς', 'σ') AS clip_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q36_image_featurize_stub" -> Multimodal.imageFeaturizeOracleSql,
    "q35_multimodal_meta" ->
      """SELECT doc_id, hex(encode(text)) AS payload_hex,
        | CAST(strlen(text) AS BIGINT) AS n_bytes,
        | md5(text) AS content_hash,
        | 'image/png' AS mime,
        | CAST(('0x' || substring(md5(text),1,15)) AS BIGINT) % 1920 + 1 AS width,
        | (CAST(('0x' || substring(md5(text),1,15)) AS BIGINT) >> 8) % 1080 + 1 AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q37_promo_revenue" ->
      """SELECT p_type, COUNT(*) AS n_items,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
        | CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
        |   THEN CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))
        |   ELSE CAST(0 AS DECIMAL(12,4)) END) AS VARCHAR) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
    "q38_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events WHERE value > 5.0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q39_sample_paginate" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':seed42') AS page_key
        |FROM documents ORDER BY page_key, doc_id LIMIT 25 OFFSET 50""".stripMargin,
    "q40_dedup_embedding_blocked" -> Dedup.embeddingBlockedOracleSql,
    "q41_knn_join_blocked" -> Similarity.knnJoinLshOracleSql(),
    "q42_dedup_incremental" -> Dedup.dedupIncrementalOracleSql,
    "q43_pii_redact" ->
      s"""SELECT doc_id,
         | CAST(len(regexp_extract_all(text, '${Curation.UrlPat}')) AS BIGINT) AS n_urls,
         | CAST(len(regexp_extract_all(text, '${Curation.EmailPat}')) AS BIGINT) AS n_emails,
         | CAST(len(regexp_extract_all(text, '${Curation.PhonePat}')) AS BIGINT) AS n_phones,
         | regexp_replace(regexp_replace(regexp_replace(text,
         |   '${Curation.UrlPat}', '[URL]', 'g'),
         |   '${Curation.EmailPat}', '[EMAIL]', 'g'),
         |   '${Curation.PhonePat}', '[PHONE]', 'g') AS redacted
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q44_decontaminate" -> Curation.decontaminateOracleSql,
    "q46_dedup_cc" -> dedupCcSql,
    "q47_stratified_sample" -> Sampling.stratifiedSampleOracleSql,
    "q48_pack_sequences" -> Packing.packSequencesOracleSql(),
    "q49_domain_rebalance" -> Sampling.domainRebalanceOracleSql,
    "q50_funnel" ->
      """WITH s1 AS (SELECT user_id, ts, event_type,
        |  MIN(CASE WHEN event_type = 'view' THEN ts END)
        |    OVER (PARTITION BY user_id) AS view_ts
        | FROM events),
        |s2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > view_ts
        |    THEN ts END) OVER (PARTITION BY user_id) AS click_ts FROM s1),
        |s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > click_ts
        |    THEN ts END) OVER (PARTITION BY user_id) AS purchase_ts FROM s2),
        |g AS (SELECT user_id, MIN(view_ts) AS view_ts, MIN(click_ts) AS click_ts,
        |    MIN(purchase_ts) AS purchase_ts FROM s3 GROUP BY user_id)
        |SELECT user_id, view_ts, click_ts, purchase_ts,
        |  CAST(CASE WHEN purchase_ts IS NOT NULL THEN 3
        |            WHEN click_ts IS NOT NULL THEN 2
        |            WHEN view_ts IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS stage
        |FROM g ORDER BY user_id""".stripMargin,
    "q52_cdc_chunks" -> TextAnalysis.cdcChunksOracleSql(),
    "q53_salted_join" -> Skew.saltedJoinOracleSql,
    "q54_ann_multiprobe" -> Similarity.multiprobeOracleSql(),
    "q55_facet_search" -> Serving.facetSearchOracleSql,
    "q56_envelope_parse" -> graft.sources.Ingest.parseEnvelopeOracleSql,
    "q57_asof_join" -> Temporal.asofJoinOracleSql,
    "q58_interval_join" -> Temporal.intervalJoinOracleSql,
    "q59_semdedup" -> SemDedup.semDedupOracleSql,
    "q60_bm25" -> Search.bm25OracleSql,
    "q61_repetition_filter" -> Curation.repetitionFilterOracleSql,
    "q62_dup_passage" -> Curation.dupPassageOracleSql,
    "q63_kmeans" -> KMeansOp.kmeansOracleSql,
    "q64_group_sample" -> Sampling.groupSampleOracleSql,
    "q65_ann_ivf" -> Similarity.ivfExactOracleSql(),
    "q66_int8_quantize" -> Quantize.int8OracleSql,
    // q72 reads the persisted exact IVF index; its result is defined to
    // equal q65's in-memory pipeline, so it shares the generated oracle
    "q72_ann_ivf_indexed" -> Similarity.ivfExactOracleSql(),
    "q73_zorder" -> ZOrder.zorderOracleSql,
    "q67_lm_score" -> Search.lmScoreOracleSql,
    "q68_cms_counts" -> Sketch.cmsOracleSql,
    "q69_tfidf_topterms" -> Search.tfidfOracleSql,
    "q70_bloom_membership" -> Sketch.bloomOracleSql,
    "q74_hll_distinct" -> Hll.hllOracleSql,
    "q75_doc_chunks" -> Chunking.chunkOracleSql,
    "q76_bigram_counts" -> Curation.bigramOracleSql,
    "q77_winsorize" -> winsorizeSql,
    // q99 computes q77's exact output through the two-pass bucket
    // selection (no whole-group sort) — same oracle by construction
    "q99_winsorize_2pass" -> winsorizeSql,
    "q98_percentile_rank_2pass" -> Analytics.percentileRank2PassOracleSql,
    "q78_time_decay" -> Temporal.timeDecayOracleSql,
    "q80_rolling_features" ->
      """SELECT event_id, user_id,
        |  CAST(COUNT(*) OVER w5 AS BIGINT) AS roll5_n,
        |  CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) OVER w5 AS BIGINT) AS roll5_sum_micro,
        |  CAST(COUNT(*) OVER wh AS BIGINT) AS hour_n
        |FROM events
        |WHERE ts IS NOT NULL
        |WINDOW w5 AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
        |  wh AS (PARTITION BY user_id
        |    ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q81_percentile_rank" ->
      """WITH r AS (SELECT doc_id, lang, n_chars,
        |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY lang) AS n
        | FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  CAST(rn - 1 AS DOUBLE) / CAST(GREATEST(n - 1, 1) AS DOUBLE) AS pct_rank,
        |  CAST(rn AS DOUBLE) / CAST(n AS DOUBLE) AS cume
        |FROM r ORDER BY doc_id""".stripMargin,
    "q82_schema_merge" -> graft.sources.Ingest.schemaMergeOracleSql,
    "q100_csv_roundtrip" -> graft.sources.Ingest.csvRoundtripOracleSql,
    "q101_orc_roundtrip" -> graft.sources.Ingest.orcRoundtripOracleSql,
    "q103_json_roundtrip" -> graft.sources.Ingest.jsonRoundtripOracleSql,
    "q104_semdedup_trained" -> SemDedup.semDedupTrainedOracleSql,
    "q105_frame_sample" -> Multimodal.frameSampleOracleSql,
    "q106_resize_stub" -> Multimodal.imageResizeOracleSql,
    "q107_events_gate" -> Curation.eventsGateOracleSql,
    "q108_embeddings_gate" -> Curation.embeddingsGateOracleSql,
    "q109_postings_lookup" -> PostingsIndex.lookupOracleSql,
    "q110_bpe_merges" -> BpeTrain.bpeOracleSql,
    "q111_pq_adc" -> PqOp.pqAdcOracleSql,
    "q112_pq_rerank" -> PqOp.pqRerankOracleSql,
    "q113_bpe_encode" -> BpeTrain.bpeEncodeOracleSql,
    "q114_compaction" -> Compact.compactOracleSql,
    "q115_below_avg" -> Analytics.belowAvgRevenueOracleSql,
    "q116_lone_late_supplier" -> Analytics.loneLateSupplierOracleSql,
    "q117_label_propagation" -> labelPropSql,
    "q118_bigram_lm" -> Search.bigramLmOracleSql,
    "q119_related_terms" -> Serving.relatedTermsOracleSql,
    "q120_hll_window" -> Hll.hllWindowOracleSql,
    "q121_corpus_overlap" -> corpusOverlapSql,
    "q122_event_transitions" -> Temporal.eventTransitionsOracleSql,
    "q123_top_supplier" -> Analytics.topSupplierOracleSql,
    "q124_nation_concentration" -> Analytics.nationConcentrationOracleSql,
    "q125_big_orders" -> Analytics.bigOrdersOracleSql,
    "q126_dormant_customers" -> Analytics.dormantCustomersOracleSql,
    "q127_dominant_supplier" -> Analytics.dominantSupplierOracleSql,
    "q128_binary_ingest" -> graft.sources.Ingest.binaryIngestOracleSql,
    "q129_ann_recall" -> Similarity.annRecallOracleSql,
    "q130_embed_standardize" -> Quantize.standardizeOracleSql,
    "q131_session_window" -> graft.streaming.Streams.sessionizeBuiltinOracleSql,
    "q132_status_pivot" -> Reshape.statusPivotOracleSql,
    "q133_metrics_unpivot" -> Reshape.nationMetricsUnpivotOracleSql,
    "q134_grouping_sets" -> Reshape.facetGroupingSetsOracleSql,
    "q135_scd2" -> Temporal.scd2OracleSql,
    "q136_trade_volume" -> Analytics.tradeVolumeOracleSql,
    "q137_market_share" -> Analytics.marketShareOracleSql,
    "q138_triangle_support" -> triangleSupportSql,
    "q139_partition_checksum" -> Cleanse.partitionChecksumOracleSql,
    "q140_incremental_agg" -> Merge.incrementalAggOracleSql,
    "q141_split_leakage" -> Curation.splitLeakageOracleSql(jaccardPairCtes),
    "q142_ngram_novelty" -> Curation.ngramNoveltyOracleSql(jaccardPairCtes),
    "q143_epoch_shuffle" -> Sampling.epochShuffleOracleSql,
    "q144_text_roundtrip" -> graft.sources.Ingest.textRoundtripOracleSql,
    "q145_quality_budget" -> Sampling.qualityBudgetOracleSql,
    "q146_group_trend" -> Analytics.groupTrendOracleSql,
    "q147_ref_integrity" -> Cleanse.refIntegrityOracleSql,
    "q148_quantile_audit" -> Analytics.approxQuantileAuditOracleSql,
    "q149_forget_cascade" -> Curation.forgetCascadeOracleSql,
    "q150_cdc_apply" -> Merge.cdcApplyOracleSql,
    "q151_point_in_time" -> Temporal.pointInTimeJoinOracleSql,
    "q152_rank_family" -> Analytics.rankFamilyOracleSql,
    "q153_set_ops" -> Analytics.setOpsOracleSql,
    "q154_mad_outliers" -> Analytics.madOutliersOracleSql,
    "q155_domain_drift" -> Curation.domainDriftOracleSql,
    "q156_split_manifest" -> Sampling.splitManifestOracleSql,
    "q157_ivf_upsert" -> IvfIndex.ivfUpsertOracleSql(),
    "q158_contamination_hops" -> Cluster.contaminationHopsOracleSql(jaccardPairCtes),
    "q159_nearest_event" -> Temporal.nearestEventJoinOracleSql,
    "q160_anti_entropy_repair" -> Cleanse.antiEntropyRepairOracleSql,
    "q161_pareto_front" -> Analytics.paretoFrontOracleSql,
    "q162_hybrid_rrf" -> Fusion.hybridRrfOracleSql,
    "q163_fuzzy_match" -> ApproxDedup.fuzzyMatchOracleSql,
    "q164_ab_welch" -> Analytics.abWelchOracleSql,
    "q165_char_entropy" -> CharEntropy.charEntropyOracleSql,
    "q166_cusum_changepoint" -> Temporal.cusumChangepointOracleSql,
    "q167_ann_filtered" -> Similarity.filteredTopKOracleSql,
    "q168_mmr_diversify" -> Mmr.mmrDiversifyOracleSql,
    "q169_seasonal_anomaly" -> Temporal.seasonalAnomalyOracleSql,
    "q170_rfm_segment" -> Analytics.rfmSegmentOracleSql,
    "q171_embedding_drift" -> Curation.embeddingDriftOracleSql,
    "q172_wilson_rank" -> Serving.wilsonRankOracleSql,
    "q173_boilerplate_ngrams" -> Curation.boilerplateNgramsOracleSql,
    "q174_dsir_weights" -> Curation.dsirWeightsOracleSql,
    "q175_weighted_sample" -> Sampling.weightedSampleOracleSql,
    "q176_embed_covariance" -> Quantize.embedCovarianceOracleSql,
    "q177_tokenizer_fertility" -> BpeTrain.fertilityOracleSql,
    "q178_line_dedup" -> Curation.lineDedupOracleSql,
    "q179_temperature_mix" -> Sampling.temperatureMixOracleSql,
    "q180_hard_negatives" -> Similarity.hardNegativesOracleSql,
    "q181_cluster_silhouette" -> KMeansOp.silhouetteOracleSql,
    "q182_cooccurrence" -> Curation.cooccurrenceOracleSql,
    "q183_pq_recall" -> PqOp.pqRecallOracleSql,
    "q184_zipf_fit" -> Search.zipfFitOracleSql,
    "q185_packing_efficiency" -> Packing.packingEfficiencyOracleSql(),
    "q186_langid_confusion" -> TextAnalysis.langidConfusionOracleSql,
    "q187_minhash_calibration" -> ApproxDedup.minhashCalibrationOracleSql,
    "q188_ivfpq" -> IvfPq.ivfpqOracleSql,
    "q189_brand_affinity" -> Itemsets.brandAffinityOracleSql,
    "q190_jl_distortion" -> RandomProjection.jlDistortionOracleSql,
    "q191_cluster_terms" -> TopicProfile.clusterTermsOracleSql,
    "q192_auc" -> Eval.aucOneVsRestOracleSql,
    "q193_gains" -> Eval.gainsDecilesOracleSql,
    "q194_phrase_search" -> PhraseSearch.phraseSearchOracleSql,
    "q195_kcore" -> Cluster.kcoreOracleSql(jaccardPairCtes),
    "q196_rank_quality" -> Similarity.rankQualityOracleSql,
    "q197_bm25_wand" -> PostingsIndex.bm25TopKOracleSql,
    "q198_ivfpq_recall" -> IvfPq.ivfpqRecallOracleSql,
    "q199_attribution" -> graft.streaming.Streams.attributionOracleSql,
    "q200_calibration" -> Eval.calibrationOracleSql,
    "q201_table_stats" -> TableStats.tableStatsOracleSql,
    "q202_source_similarity" -> ApproxDedup.sourceSimilarityOracleSql,
    "q203_qdigest" -> QDigest.qdigestOracleSql,
    "q204_term_burstiness" -> Curation.termBurstinessOracleSql,
    "q205_join_cardinality" -> Sketch.joinCardinalityOracleSql,
    "q206_fd_audit" -> TableStats.fdAuditOracleSql,
    "q207_zonemap_audit" -> ZOrder.zonemapAuditOracleSql,
    "q208_common_neighbors" -> Cluster.commonNeighborsOracleSql,
    "q209_kmv_overlap" -> Sketch.kmvOverlapOracleSql,
    "q210_bucketed_join" -> Bucketing.bucketedJoinOracleSql,
    "q211_k_anonymity" -> Curation.kAnonymityOracleSql,
    "q212_join_skew_audit" -> Skew.joinSkewAuditOracleSql,
    "q213_table_stats_sketch" -> TableStats.tableStatsSketchOracleSql,
    "q214_bucketed_fact_join" -> Bucketing.bucketedLineitemJoinOracleSql,
    "q215_containment_blocked" -> ApproxDedup.containmentBlockedOracleSql,
    "q216_substring_dedup" -> SubstringDedup.duplicatedRegionsOracleSql,
    "q217_quality_classifier" -> QualityClassifier.trainScoreOracleSql,
    "q218_langid_classifier" -> LangClassifier.trainScoreOracleSql,
    "q219_acceptance_report" -> Eval.acceptanceReportOracleSql,
    "q83_heavy_hitters" ->
      """WITH c AS (SELECT COALESCE(lang, '') AS lang, COALESCE(source, '') AS source,
        |  COUNT(*) AS cnt FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, source, CAST(cnt AS BIGINT) AS cnt,
        |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, source) AS rank FROM c)
        |SELECT lang, source, cnt, rank FROM r WHERE rank <= 3
        |ORDER BY lang, rank""".stripMargin,
    "q84_profile_audit" -> Cleanse.profileAuditOracleSql,
    "q85_event_gaps" -> Temporal.eventGapsOracleSql,
    "q86_snapshot_diff" -> Merge.snapshotDiffOracleSql,
    "q87_pagerank" -> pagerankSql,
    "q88_cohort_retention" ->
      """WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT c.cohort_day,
        |  CAST(date_diff('day', c.cohort_day, e.day) AS BIGINT) AS day_offset,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q89_feature_hash" -> TextAnalysis.featureHashOracleSql,
    "q90_group_corr" -> Analytics.groupCorrOracleSql,
    "q91_value_histogram" -> Analytics.valueHistogramOracleSql,
    "q92_facet_cube" ->
      """WITH d AS (SELECT COALESCE(lang, '') AS lang,
        |  COALESCE(source, '') AS source, n_chars FROM documents)
        |SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM d GROUP BY CUBE (lang, source)
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    // q93 replays q46's reachability closure, then picks each cluster's
    // survivor by (n_chars DESC, doc_id) — the same total order the
    // Spark side packs into its single heap score
    "q93_dedup_survivor" ->
      s"""WITH RECURSIVE $jaccardPairCtes,
        |prs AS (SELECT a_id, b_id FROM p
        |  WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.8),
        |und AS (SELECT a_id AS s, b_id AS d FROM prs
        |  UNION SELECT b_id, a_id FROM prs),
        |reach(s, d) AS (SELECT doc_id, doc_id FROM documents
        |  UNION SELECT r.s, u.d FROM reach r JOIN und u ON r.d = u.s),
        |lab AS (SELECT s AS doc_id, MIN(d) AS cluster_id FROM reach GROUP BY s),
        |rr AS (SELECT lab.doc_id, lab.cluster_id, dd.n_chars,
        |  ROW_NUMBER() OVER (PARTITION BY lab.cluster_id
        |    ORDER BY dd.n_chars DESC, lab.doc_id) AS rn
        |  FROM lab JOIN documents dd USING (doc_id)),
        |sv AS (SELECT cluster_id, doc_id AS survivor_id FROM rr WHERE rn = 1)
        |SELECT rr.doc_id, rr.cluster_id, sv.survivor_id,
        |  rr.doc_id = sv.survivor_id AS is_survivor
        |FROM rr JOIN sv USING (cluster_id) ORDER BY rr.doc_id""".stripMargin,
    // each event lands in exactly 2 second-aligned 10-min/5-min-slide
    // windows: starts floor(t/300)*300 and that minus 300
    "q95_hopping_window" ->
      """WITH e AS (SELECT event_type, value, epoch_us(ts) AS tu
        |  FROM events WHERE ts IS NOT NULL),
        |f AS (SELECT event_type, value,
        |  -- FLOOR division: Spark's window() floors the epoch offset,
        |  -- but DuckDB's // (and date_diff) truncate toward zero, which
        |  -- mis-buckets pre-1970 fractional timestamps by one hop
        |  CASE WHEN tu >= 0 OR tu % 300000000 = 0 THEN tu // 300000000
        |       ELSE tu // 300000000 - 1 END AS b FROM e),
        |x AS (SELECT event_type, value,
        |  (b - i) * 300 AS s FROM f, (SELECT unnest([0, 1]) AS i) u)
        |SELECT TIMESTAMP '1970-01-01 00:00:00' + to_seconds(s) AS window_start,
        |  TIMESTAMP '1970-01-01 00:00:00' + to_seconds(s + 600) AS window_end,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM x GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,
    "q96_rate_anomaly" -> Temporal.rateAnomalyOracleSql,
    "q97_group_quantiles_2pass" -> Analytics.groupQuantiles2PassOracleSql,
    "q94_source_gate" ->
      """WITH c AS (SELECT COALESCE(lang, '') AS lang, COALESCE(source, '') AS source,
        |  COUNT(*) AS cnt FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, source,
        |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, source) AS rank FROM c),
        |top AS (SELECT lang, source FROM r WHERE rank <= 3)
        |SELECT d.doc_id, COALESCE(d.lang, '') AS lang, COALESCE(d.source, '') AS source
        |FROM documents d JOIN top t
        |  ON COALESCE(d.lang, '') = t.lang AND COALESCE(d.source, '') = t.source
        |ORDER BY d.doc_id""".stripMargin,
    // ordered containment pairs from the shared unordered pair CTE:
    // each unordered pair tests both directions
    "q79_containment" ->
      s"""WITH $jaccardPairCtes
        |SELECT a_id, b_id, CAST(common AS BIGINT) AS common,
        |  CAST(na AS BIGINT) AS na,
        |  CAST(common AS DOUBLE) / CAST(na AS DOUBLE) AS containment
        |FROM p WHERE CAST(common AS DOUBLE) / CAST(na AS DOUBLE) >= 0.9e0
        |UNION ALL
        |SELECT b_id AS a_id, a_id AS b_id, CAST(common AS BIGINT) AS common,
        |  CAST(nb AS BIGINT) AS na,
        |  CAST(common AS DOUBLE) / CAST(nb AS DOUBLE) AS containment
        |FROM p WHERE CAST(common AS DOUBLE) / CAST(nb AS DOUBLE) >= 0.9e0
        |ORDER BY a_id, b_id""".stripMargin,
    // batch×corpus pairs fall out of the shared pair CTE because the
    // split boundary orders them: corpus ids < boundary ≤ batch ids, and
    // p already has a_id < b_id. LSH recall at τ=0.8 is ~1 (the q24
    // argument), which this exact-Jaccard oracle checks.
    "q71_dedup_incremental_text" ->
      s"""WITH $jaccardPairCtes,
        |m AS (SELECT b_id, a_id, CAST(common AS DOUBLE)/(na+nb-common) AS j,
        |  ROW_NUMBER() OVER (PARTITION BY b_id
        |    ORDER BY CAST(common AS DOUBLE)/(na+nb-common) DESC, a_id) AS rn
        |  FROM p WHERE a_id < ${ApproxDedup.IncrementalCorpusMax}
        |    AND b_id >= ${ApproxDedup.IncrementalCorpusMax}
        |    AND CAST(common AS DOUBLE)/(na+nb-common) >= 0.8),
        |best AS (SELECT b_id, a_id, j FROM m WHERE rn = 1)
        |SELECT d.doc_id, COALESCE(best.a_id, d.doc_id) AS canonical_id,
        |  best.a_id IS NOT NULL AS matched,
        |  ROUND(COALESCE(best.j, 0.0), 9) AS best_j_r
        |FROM documents d LEFT JOIN best ON d.doc_id = best.b_id
        |WHERE d.doc_id >= ${ApproxDedup.IncrementalCorpusMax}
        |ORDER BY d.doc_id""".stripMargin,
    "q51_group_quantiles" ->
      """WITH r AS (SELECT event_type, value, event_id,
        |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY event_type) AS n
        | FROM events)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
        |  MAX(CASE WHEN rn = CEIL(n * 0.5) THEN value END) AS p50,
        |  MAX(CASE WHEN rn = CEIL(n * 0.9) THEN value END) AS p90,
        |  MAX(CASE WHEN rn = CEIL(n * 0.99) THEN value END) AS p99
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q45_corpus_filter" ->
      s"""WITH f AS (SELECT doc_id,
         |  CAST(len(list_filter(string_split(text,' '), w -> w <> '')) AS BIGINT) AS n_words,
         |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) AS n_nonspace,
         |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) AS n_sym,
         |  CAST(length(text) AS DOUBLE) AS n_chars_f,
         |  CAST(len(list_filter(string_split(lower(text),' '),
         |    w -> list_contains(['the','a','of','and','to','in','is'], w))) AS BIGINT) AS n_stop
         | FROM documents),
         |r AS (SELECT doc_id, n_words, n_nonspace / n_words AS mean_word_len,
         |  n_sym / n_chars_f AS symbol_ratio, n_stop FROM f),
         |g AS (SELECT doc_id, n_words, mean_word_len, symbol_ratio, n_stop,
         |  CAST(CASE WHEN n_words >= ${Curation.MinWords} AND n_words <= ${Curation.MaxWords}
         |    THEN 1 ELSE 0 END AS BIGINT) AS ok_words,
         |  CAST(CASE WHEN mean_word_len >= ${Curation.MinMeanWordLen}
         |    AND mean_word_len <= ${Curation.MaxMeanWordLen}
         |    THEN 1 ELSE 0 END AS BIGINT) AS ok_word_len,
         |  CAST(CASE WHEN symbol_ratio < ${Curation.MaxSymbolRatio}
         |    THEN 1 ELSE 0 END AS BIGINT) AS ok_symbols,
         |  CAST(CASE WHEN n_stop > 0 THEN 1 ELSE 0 END AS BIGINT) AS ok_stopwords
         | FROM r)
         |SELECT *, CAST(CASE WHEN ok_words + ok_word_len + ok_symbols + ok_stopwords = 4
         |  THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM g ORDER BY doc_id""".stripMargin,
  )
}
