package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.pipelines._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SupplierPerformance.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_supplier_performance" -> ((s, dir) => SupplierPerformance.build(s, dir)),
    "q_product_performance" -> ((s, dir) => ProductPerformance.build(s, dir)),
    "q_customer_sales_report" -> ((s, dir) => CustomerSalesReport.build(s, dir)),
    "q_text_stats" -> ((s, dir) => graft.ops.TextAnalysis.stats(s, dir)),
    "q_text_langid" -> ((s, dir) => graft.ops.TextAnalysis.langid(s, dir)),
    "q_text_quality" -> ((s, dir) => graft.ops.TextAnalysis.quality(s, dir)),
    "q_text_fingerprint" -> ((s, dir) => graft.ops.TextAnalysis.fingerprint(s, dir)),
    "q_dedup_exact" -> ((s, dir) => graft.ops.Dedup.exact(s, dir)),
    "q_dedup_jaccard" -> ((s, dir) => graft.ops.Dedup.jaccardPairs(s, dir)),
    "q_dedup_minhash_lsh" -> ((s, dir) => graft.ops.Dedup.minhashLsh(s, dir)),
    "q_dedup_simhash" -> ((s, dir) => graft.ops.Dedup.simhash(s, dir)),
    "q_dedup_simhash_pairs" -> ((s, dir) => graft.ops.Dedup.simhashPairs(s, dir)),
    "q_sim_bruteforce" -> ((s, dir) => graft.ops.Similarity.bruteForceTopK(s, dir)),
    "q_sim_ann_lsh" -> ((s, dir) => graft.ops.Similarity.lshTopK(s, dir)),
    "q_dedup_embedding" -> ((s, dir) => graft.ops.Similarity.nearDupPairs(s, dir)),
    "q_events_windowed" -> ((s, dir) => graft.streaming.EventOps.windowedQuery(s, dir)),
    "q_events_sessions" -> ((s, dir) => graft.streaming.EventOps.sessionQuery(s, dir)),
    "q_multimodal_features" -> ((s, dir) => graft.ops.Multimodal.features(s, dir)),
    "q_reconcile_diff" -> ((s, dir) => graft.ops.EngineQueries.reconcileDiff(s, dir)),
    "q_validate_dups" -> ((s, dir) => graft.ops.EngineQueries.validateDups(s, dir)),
    "q_schema_conform" -> ((s, dir) => graft.ops.EngineQueries.schemaConform(s, dir)),
    "q_events_rollup" -> ((s, dir) => graft.streaming.EventOps.rollupQuery(s, dir)),
    "q_pii_scrub" -> ((s, dir) => graft.ops.PiiScrub.query(s, dir)),
    "q_events_funnel" -> ((s, dir) => graft.ops.Funnel.query(s, dir)),
    "q_corpus_clean" -> ((s, dir) => graft.ops.CorpusClean.query(s, dir)),
    "q_text_vocab" -> ((s, dir) => graft.ops.TextAnalysis.vocab(s, dir)),
    "q_sample_split" -> ((s, dir) => graft.ops.Sampling.query(s, dir)),
    "q_set_ops" -> ((s, dir) => graft.ops.EngineQueries.setOps(s, dir)),
    "q_dedup_incremental" -> ((s, dir) => graft.ops.IncrementalDedup.query(s, dir)),
    "q_events_anomalies" -> ((s, dir) => graft.streaming.EventOps.anomalies(s, dir)),
    "q_seq_packing" -> ((s, dir) => graft.ops.Packing.packQuery(s, dir)),
    "q_source_mix" -> ((s, dir) => graft.ops.Packing.mixQuery(s, dir)),
    "q_dedup_clusters" -> ((s, dir) => graft.ops.Dedup.clusters(s, dir)),
    "q_text_tfidf" -> ((s, dir) => graft.ops.TextAnalysis.tfidf(s, dir)),
    "q_events_attribution" -> ((s, dir) => graft.ops.Temporal.attribution(s, dir)),
    "q_events_trailing_window" -> ((s, dir) => graft.ops.Temporal.trailingWindow(s, dir)),
    "q_events_retention" -> ((s, dir) => graft.ops.Funnel.retention(s, dir)),
    "q_sim_ann_ivf" -> ((s, dir) => graft.ops.Similarity.ivfTopK(s, dir)),
    "q_emb_centroids" -> ((s, dir) => graft.ops.Embeddings.labelCentroids(s, dir)),
    "q_emb_label_stats" -> ((s, dir) => graft.ops.Embeddings.labelStats(s, dir)),
    "q_stats_moments" -> ((s, dir) => graft.ops.Stats.moments(s, dir)),
    "q_text_histogram" -> ((s, dir) => graft.ops.Stats.qualityHistogram(s, dir)),
    "q_events_pivot" -> ((s, dir) => graft.ops.Reshape.eventPivot(s, dir)),
    "q_part_unpivot" -> ((s, dir) => graft.ops.Reshape.partUnpivot(s, dir)),
    "q_events_click_attr" -> ((s, dir) => graft.streaming.EventOps.clickPurchaseQuery(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_supplier_performance" -> SupplierPerformance.oracle,
    "q_product_performance" -> ProductPerformance.oracle,
    "q_customer_sales_report" -> CustomerSalesReport.oracle,
    "q_text_stats" -> graft.ops.TextAnalysis.statsOracle,
    "q_text_langid" -> graft.ops.TextAnalysis.langidOracle,
    "q_text_quality" -> graft.ops.TextAnalysis.qualityOracle,
    "q_text_fingerprint" -> graft.ops.TextAnalysis.fingerprintOracle,
    "q_dedup_exact" -> graft.ops.Dedup.exactOracle,
    "q_dedup_jaccard" -> graft.ops.Dedup.jaccardPairsOracle,
    "q_dedup_minhash_lsh" -> graft.ops.Dedup.minhashLshOracle,
    "q_dedup_simhash" -> graft.ops.Dedup.simhashOracle,
    "q_dedup_simhash_pairs" -> graft.ops.Dedup.simhashPairsOracle,
    "q_sim_bruteforce" -> graft.ops.Similarity.bruteForceOracle,
    "q_sim_ann_lsh" -> graft.ops.Similarity.lshOracle,
    "q_dedup_embedding" -> graft.ops.Similarity.nearDupOracle,
    "q_events_windowed" -> graft.streaming.EventOps.windowedOracle,
    "q_events_sessions" -> graft.streaming.EventOps.sessionOracle,
    "q_multimodal_features" -> graft.ops.Multimodal.featuresOracle,
    "q_reconcile_diff" -> graft.ops.EngineQueries.reconcileDiffOracle,
    "q_validate_dups" -> graft.ops.EngineQueries.validateDupsOracle,
    "q_schema_conform" -> graft.ops.EngineQueries.schemaConformOracle,
    "q_events_rollup" -> graft.streaming.EventOps.rollupOracle,
    "q_pii_scrub" -> graft.ops.PiiScrub.oracle,
    "q_events_funnel" -> graft.ops.Funnel.oracle,
    "q_corpus_clean" -> graft.ops.CorpusClean.oracle,
    "q_text_vocab" -> graft.ops.TextAnalysis.vocabOracle,
    "q_sample_split" -> graft.ops.Sampling.oracle,
    "q_set_ops" -> graft.ops.EngineQueries.setOpsOracle,
    "q_dedup_incremental" -> graft.ops.IncrementalDedup.oracle,
    "q_events_anomalies" -> graft.streaming.EventOps.anomaliesOracle,
    "q_seq_packing" -> graft.ops.Packing.packOracle,
    "q_source_mix" -> graft.ops.Packing.mixOracle,
    "q_dedup_clusters" -> graft.ops.Dedup.clustersOracle,
    "q_text_tfidf" -> graft.ops.TextAnalysis.tfidfOracle,
    "q_events_attribution" -> graft.ops.Temporal.attributionOracle,
    "q_events_trailing_window" -> graft.ops.Temporal.trailingWindowOracle,
    "q_events_retention" -> graft.ops.Funnel.retentionOracle,
    "q_sim_ann_ivf" -> graft.ops.Similarity.ivfOracle,
    "q_emb_centroids" -> graft.ops.Embeddings.labelCentroidsOracle,
    "q_emb_label_stats" -> graft.ops.Embeddings.labelStatsOracle,
    "q_stats_moments" -> graft.ops.Stats.momentsOracle,
    "q_text_histogram" -> graft.ops.Stats.qualityHistogramOracle,
    "q_events_pivot" -> graft.ops.Reshape.eventPivotOracle,
    "q_part_unpivot" -> graft.ops.Reshape.partUnpivotOracle,
    "q_events_click_attr" -> graft.streaming.EventOps.clickPurchaseOracle
  )
}
