package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is an implemented operator from SURVEY.md §2
  * (or a driver-mandated extension); each `oracleSql` entry is the
  * equivalent DuckDB SQL over the same parquet tables. Column names
  * and types are aligned on both sides (see ParityQueries scaladoc for
  * the hash-stability conventions).
  */
object SparkEntry {
  import graft.queries._

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the full reference pipeline — payload reshape → align → three
    * upserts → combined dashboard overview — in one plan. */
  def entry(spark: SparkSession): DataFrame =
    etl.Flagship.run(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"             -> (ParityQueries.q1Agg _),
    "q2_latest_per_key"  -> (ParityQueries.q2LatestPerKey _),
    "q3_asof_change"     -> (ParityQueries.q3AsOfChange _),
    "q4_daily_ohlc"      -> (ParityQueries.q4DailyOhlc _),
    "q5_sparkline"       -> (ParityQueries.q5Sparkline _),
    "q6_search_filter"   -> (ParityQueries.q6SearchFilter _),
    "q7_null_ordering"   -> (ParityQueries.q7NullOrdering _),
    "q8_topk"            -> (ParityQueries.q8TopK _),
    "q9_upsert_events"   -> (ParityQueries.q9UpsertEvents _),
    "q10_upsert_preserve" -> (ParityQueries.q10UpsertPreserve _),
    "q11_revenue"        -> (ParityQueries.q11Revenue _),
    "q12_hourly"         -> (ParityQueries.q12Hourly _),
    "q13_wordcount"      -> (ParityQueries.q13Wordcount _),
    "q14_json_extract"   -> (ParityQueries.q14JsonExtract _),
    "q15_cosine_topk"    -> (ExtQueries.q15CosineTopK _),
    "q16_lsh_recall"     -> (ExtQueries.q16LshRecall _),
    "q17_exact_dedup"    -> (ExtQueries.q17ExactDedup _),
    "q18_neardup_text"   -> (ExtQueries.q18NearDupText _),
    "q19_v_latest"       -> (RefViewQueries.q19VLatest _),
    "q20_v_change24h"    -> (RefViewQueries.q20VChange24h _),
    "q21_v_daily_ohlc"   -> (RefViewQueries.q21VDailyOhlc _),
    "q22_v_sparkline"    -> (RefViewQueries.q22VSparkline _),
    "q23_text_profile"   -> (ExtQueries.q23TextProfile _),
    "q24_quality"        -> (ExtQueries.q24Quality _),
    "q25_langid"         -> (ExtQueries.q25LangId _),
    "q26_fingerprint"    -> (ExtQueries.q26Fingerprint _),
    "q27_multimodal"     -> (ExtQueries.q27Multimodal _),
    "q28_frame_sample"   -> (ExtQueries.q28FrameSample _),
    "q29_curation"       -> (ExtQueries.q29Curation _),
    "q30_simhash_neardup" -> (ExtQueries.q30SimhashNearDup _),
    "q31_overview"       -> (RefViewQueries.q31Overview _),
    "q32_align_roundtrip" -> (RefViewQueries.q32AlignRoundtrip _),
    "q33_ivf_recall"     -> (ExtQueries.q33IvfRecall _),
    "q34_kpis"           -> (RefViewQueries.q34Kpis _),
    "q35_embed_neardup"  -> (ExtQueries.q35EmbedNearDup _),
    "q36_profile"        -> (ExtQueries.q36Profile _),
    "q37_top_tokens"     -> (ExtQueries.q37TopTokens _),
    "q38_chars_hist"     -> (ExtQueries.q38CharsHist _),
    "q39_rollup"         -> (ExtQueries.q39Rollup _),
    "q40_semi"           -> (ExtQueries.q40Semi _),
    "q41_median"         -> (ExtQueries.q41Median _),
    "q42_hll_distinct"   -> (ExtQueries.q42HllDistinct _),
    "q43_approx_quantile" -> (ExtQueries.q43ApproxQuantile _),
    "q44_dedup_clusters" -> (ExtQueries.q44DedupClusters _),
    "q45_ivf_neardup"    -> (ExtQueries.q45IvfNearDup _),
    "q46_split"          -> (ExtQueries.q46Split _),
    "q47_stratified_sample" -> (ExtQueries.q47StratifiedSample _),
    "q48_chunks"         -> (ExtQueries.q48Chunks _),
    "q49_redact"         -> (ExtQueries.q49Redact _),
    "q50_mixture"        -> (ExtQueries.q50Mixture _),
    "q51_packing"        -> (ExtQueries.q51Packing _),
    "q52_repetition"     -> (ExtQueries.q52Repetition _),
    "q53_winnow"         -> (ExtQueries.q53Winnow _),
    "q54_meanpool"       -> (ExtQueries.q54MeanPool _),
    "q55_sessionize"     -> (ExtQueries.q55Sessionize _),
    "q56_tfidf"          -> (ExtQueries.q56TfIdf _),
    "q57_contamination"  -> (ExtQueries.q57Contamination _),
    "q58_incremental_neardup" -> (ExtQueries.q58IncrementalNearDup _),
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"             -> ParityQueries.q1AggSql,
    "q2_latest_per_key"  -> ParityQueries.q2LatestPerKeySql,
    "q3_asof_change"     -> ParityQueries.q3AsOfChangeSql,
    "q4_daily_ohlc"      -> ParityQueries.q4DailyOhlcSql,
    "q5_sparkline"       -> ParityQueries.q5SparklineSql,
    "q6_search_filter"   -> ParityQueries.q6SearchFilterSql,
    "q7_null_ordering"   -> ParityQueries.q7NullOrderingSql,
    "q8_topk"            -> ParityQueries.q8TopKSql,
    "q9_upsert_events"   -> ParityQueries.q9UpsertEventsSql,
    "q10_upsert_preserve" -> ParityQueries.q10UpsertPreserveSql,
    "q11_revenue"        -> ParityQueries.q11RevenueSql,
    "q12_hourly"         -> ParityQueries.q12HourlySql,
    "q13_wordcount"      -> ParityQueries.q13WordcountSql,
    "q14_json_extract"   -> ParityQueries.q14JsonExtractSql,
    "q15_cosine_topk"    -> ExtQueries.q15CosineTopKSql,
    "q16_lsh_recall"     -> ExtQueries.q16LshRecallSql,
    "q17_exact_dedup"    -> ExtQueries.q17ExactDedupSql,
    "q18_neardup_text"   -> ExtQueries.q18NearDupTextSql,
    "q19_v_latest"       -> RefViewQueries.q19VLatestSql,
    "q20_v_change24h"    -> RefViewQueries.q20VChange24hSql,
    "q21_v_daily_ohlc"   -> RefViewQueries.q21VDailyOhlcSql,
    "q22_v_sparkline"    -> RefViewQueries.q22VSparklineSql,
    "q23_text_profile"   -> ExtQueries.q23TextProfileSql,
    "q24_quality"        -> ExtQueries.q24QualitySql,
    "q25_langid"         -> ExtQueries.q25LangIdSql,
    "q26_fingerprint"    -> ExtQueries.q26FingerprintSql,
    "q27_multimodal"     -> ExtQueries.q27MultimodalSql,
    "q28_frame_sample"   -> ExtQueries.q28FrameSampleSql,
    "q29_curation"       -> ExtQueries.q29CurationSql,
    "q30_simhash_neardup" -> ExtQueries.q30SimhashNearDupSql,
    "q31_overview"       -> RefViewQueries.q31OverviewSql,
    "q32_align_roundtrip" -> RefViewQueries.q32AlignRoundtripSql,
    "q33_ivf_recall"     -> ExtQueries.q33IvfRecallSql,
    "q34_kpis"           -> RefViewQueries.q34KpisSql,
    "q35_embed_neardup"  -> ExtQueries.q35EmbedNearDupSql,
    "q36_profile"        -> ExtQueries.q36ProfileSql,
    "q37_top_tokens"     -> ExtQueries.q37TopTokensSql,
    "q38_chars_hist"     -> ExtQueries.q38CharsHistSql,
    "q39_rollup"         -> ExtQueries.q39RollupSql,
    "q40_semi"           -> ExtQueries.q40SemiSql,
    "q41_median"         -> ExtQueries.q41MedianSql,
    "q42_hll_distinct"   -> ExtQueries.q42HllDistinctSql,
    "q43_approx_quantile" -> ExtQueries.q43ApproxQuantileSql,
    "q44_dedup_clusters" -> ExtQueries.q44DedupClustersSql,
    "q45_ivf_neardup"    -> ExtQueries.q45IvfNearDupSql,
    "q46_split"          -> ExtQueries.q46SplitSql,
    "q47_stratified_sample" -> ExtQueries.q47StratifiedSampleSql,
    "q48_chunks"         -> ExtQueries.q48ChunksSql,
    "q49_redact"         -> ExtQueries.q49RedactSql,
    "q50_mixture"        -> ExtQueries.q50MixtureSql,
    "q51_packing"        -> ExtQueries.q51PackingSql,
    "q52_repetition"     -> ExtQueries.q52RepetitionSql,
    "q53_winnow"         -> ExtQueries.q53WinnowSql,
    "q54_meanpool"       -> ExtQueries.q54MeanPoolSql,
    "q55_sessionize"     -> ExtQueries.q55SessionizeSql,
    "q56_tfidf"          -> ExtQueries.q56TfIdfSql,
    "q57_contamination"  -> ExtQueries.q57ContaminationSql,
    "q58_incremental_neardup" -> ExtQueries.q58IncrementalNearDupSql,
  )
}
