package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{MultimodalOps => M, RelationalQueries => R, TextQueries => T, SimilarityQueries => X}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names carry the SURVEY §2 operator ids they demonstrate; EVERY
  * query has a DuckDB oracle below — including the minhash/simhash/LSH
  * family, whose hashing is engine-portable (md5-prefix based) precisely
  * so it can be re-derived in an independent SQL engine.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    R.j5ThreeWayJoin(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scans / set-ops
    "s2_scan_union_by_name" -> (R.s2ScanUnionByName _),
    "u1_union_distinct" -> (R.u1UnionDistinct _),
    "u2_union_all" -> (R.u2UnionAll _),
    "u4_intersect_except" -> (R.u4IntersectExcept _),
    // filters
    "f1_validity_split" -> (R.f1ValiditySplit _),
    "f2_predicate_compile" -> (R.f2PredicateCompile _),
    "f5_custom_sql_filter" -> (R.f5CustomSqlFilter _),
    "f6_id_filter" -> (R.f6IdFilter _),
    "f7_between_prefilter" -> (R.f7BetweenPrefilter _),
    "f9_nonempty" -> (R.f9NonEmpty _),
    // joins
    "j1_semi_join" -> (R.j1SemiJoin _),
    "j2_anti_closure" -> (R.j2AntiClosure _),
    "j4_inner_join" -> (R.j4InnerJoin _),
    "j5_three_way_join" -> (R.j5ThreeWayJoin _),
    "j8_anti_two_key" -> (R.j8AntiTwoKey _),
    "jx_range_join" -> (R.jxRangeJoin _),
    "jx_spatial_join" -> (graft.osm.SpatialJoin.jxGate _),
    // aggregations
    "q1_agg" -> (R.q1Agg _),
    "a1_ordered_list_agg" -> (R.a1OrderedListAgg _),
    "a2a3_bool_aggs" -> (R.a2a3BoolAggs _),
    "a5_first_value" -> (R.a5FirstValue _),
    "a7_extent_agg" -> (R.a7ExtentAgg _),
    "a8_distinct" -> (R.a8Distinct _),
    "a9_count_if" -> (R.a9CountIf _),
    "ax_rollup" -> (R.axRollup _),
    "dx_halfway_grid" -> (R.dxHalfwayGrid _),
    "ax_pivot" -> (R.axPivot _),
    "ax_percentiles" -> (R.axPercentiles _),
    "ax_approx_distinct" -> (R.axApproxDistinct _),
    // windows
    "w1_global_chunk" -> (R.w1GlobalChunk _),
    "w2_partitioned_row_number" -> (R.w2PartitionedRowNumber _),
    "w3_qualify_dedup" -> (R.w3QualifyDedup _),
    "wx_running_sum" -> (R.wxRunningSum _),
    "wx_lag_gap" -> (R.wxLagGap _),
    "wx_asof_join" -> (R.wxAsofJoin _),
    "wx_sessionize" -> (R.wxSessionize _),
    "e1_window_batch" -> (R.e1WindowBatch _),
    // sorts / top-k
    "o1_order_by" -> (R.o1OrderBy _),
    "o2_topk" -> (R.o2TopK _),
    // unnest
    "g1_posexplode" -> (R.g1Posexplode _),
    "g3_distinct_explode" -> (R.g3DistinctExplode _),
    // derived columns / scalar functions
    "t3_case_chain" -> (R.t3CaseChain _),
    "fx_scalar_funcs" -> (R.fxScalarFuncs _),
    "fx_json_extract" -> (R.fxJsonExtract _),
    // text / dedup pipeline
    "d1_exact_dedup" -> (T.d1ExactDedup _),
    "d2_dedup_survivors" -> (T.d2DedupSurvivors _),
    "d3_text_stats" -> (T.d3TextStats _),
    "d4_lang_profile" -> (T.d4LangProfile _),
    "d5_quality_score" -> (T.d5QualityScore _),
    "d6_lang_id" -> (T.d6LangId _),
    "d7_fingerprint" -> (T.d7Fingerprint _),
    "d8_token_count" -> (T.d8TokenCount _),
    "d9_stratified_sample" -> (T.d9StratifiedSample _),
    "d10_decontaminate" -> (T.d10Decontaminate _),
    "x32_contamination" -> (operators.SimilarityQueries.x32Contamination _),
    "x33_vec_admit" -> (operators.SimilarityQueries.x33VecAdmit _),
    "x34_trained_recall" -> (operators.RetrievalOps.x34TrainedRecall _),
    "x35_bucketed_admit" -> (operators.SimilarityQueries.x35BucketedAdmit _),
    "x36_sample_trained" -> (operators.RetrievalOps.x36SampleTrained _),
    "d11_repetition_quality" -> (T.d11RepetitionQuality _),
    "d12_boilerplate_ngrams" -> (T.d12BoilerplateNgrams _),
    "d13_pii_scrub" -> (T.d13PiiScrub _),
    "d14_tfidf_keywords" -> (T.d14TfidfKeywords _),
    "d15_length_deciles" -> (T.d15LengthDeciles _),
    "d16_domain_profile" -> (T.d16DomainProfile _),
    "d17_chunk_documents" -> (T.d17ChunkDocuments _),
    "d18_pack_sequences" -> (T.d18PackSequences _),
    "d19_dup_passages" -> (T.d19DupPassages _),
    "d20_cut_passages" -> (T.d20CutPassages _),
    "d21_domain_mix" -> (T.d21DomainMix _),
    "d22_token_budget" -> (T.d22TokenBudget _),
    "d23_quality_classifier" -> (T.d23QualityClassifier _),
    "d24_shuffle_shards" -> (T.d24ShuffleShards _),
    "d25_bigram_lm" -> (T.d25BigramLm _),
    "d26_curate" -> (T.d26Curate _),
    "d27_increment_admit" -> (T.d27IncrementAdmit _),
    "d28_split" -> (T.d28Split _),
    "d29_temperature_mix" -> (T.d29TemperatureMix _),
    "d30_epoch_repeat" -> (T.d30EpochRepeat _),
    // similarity / embeddings
    "x1_cosine_topk" -> (X.x1CosineTopK _),
    "x2_minhash_lsh" -> (X.x2MinhashLsh _),
    "x3_simhash" -> (X.x3Simhash _),
    "x4_ngram_jaccard" -> (X.x4NgramJaccard _),
    "x5_ann_buckets" -> (X.x5AnnBuckets _),
    "x6_embedding_near_dup" -> (X.x6EmbeddingNearDup _),
    "x7_ivf_topk" -> (operators.IvfAnn.x7IvfTopK _),
    "x8_dedup_clusters" -> (X.x8DedupClusters _),
    "x9_dedup_corpus" -> (X.x9DedupCorpus _),
    "x10_simhash_near_dup" -> (X.x10SimhashNearDup _),
    "x11_int8_quantize" -> (X.x11Int8Quantize _),
    "x12_pq_encode" -> (operators.ProductQuantizer.x12PqEncode _),
    "x13_fingerprint_overlap" -> (X.x13FingerprintOverlap _),
    "x14_semdedup" -> (operators.IvfAnn.x14SemDedup _),
    "x15_ivfpq_topk" -> (operators.IvfPq.x15IvfPqTopK _),
    "x16_filtered_topk" -> (X.x16FilteredTopK _),
    // retrieval / contrastive mining
    "x17_bm25_topk" -> (operators.RetrievalOps.x17Bm25TopK _),
    "x18_hybrid_rrf" -> (operators.RetrievalOps.x18HybridRrf _),
    "x19_hard_negatives" -> (operators.RetrievalOps.x19HardNegatives _),
    "x20_mmr_rerank" -> (operators.RetrievalOps.x20MmrRerank _),
    "x21_bm25_indexed" -> (operators.RetrievalOps.x21Bm25Indexed _),
    "x31_bm25_append" -> (operators.RetrievalOps.x31Bm25Append _),
    "x22_retrieval_eval" -> (operators.RetrievalOps.x22RetrievalEval _),
    "x23_phrase_match" -> (operators.RetrievalOps.x23PhraseMatch _),
    "x24_model_rerank" -> (operators.RetrievalOps.x24ModelRerank _),
    "x26_proximity_match" -> (operators.RetrievalOps.x26ProximityMatch _),
    "x27_bm25_batch" -> (operators.RetrievalOps.x27Bm25Batch _),
    "x28_cosine_batch" -> (operators.RetrievalOps.x28CosineBatch _),
    "x29_ivf_batch" -> (operators.RetrievalOps.x29IvfBatch _),
    "x30_map_eval" -> (operators.RetrievalOps.x30MapEval _),
    "x25_ann_recall" -> (operators.RetrievalOps.x25AnnRecall _),
    "d31_bpe_pairs" -> (T.d31BpePairs _),
    "d32_bpe_train" -> (T.d32BpeTrain _),
    "d35_bpe_deep" -> (T.d35BpeDeep _),
    "d36_wordpiece" -> (T.d36Wordpiece _),
    "d37_viterbi_segment" -> (T.d37ViterbiSegment _),
    "d38_token_ids" -> (T.d38TokenIds _),
    "d39_pack_ids" -> (T.d39PackIds _),
    "d40_decode_roundtrip" -> (T.d40DecodeRoundtrip _),
    "d41_artifact_encode" -> (T.d41ArtifactEncode _),
    "d42_admit_from_store" -> (T.d42AdmitFromStore _),
    "d33_bpe_chars" -> (T.d33BpeChars _),
    "d34_bpe_vocab" -> (T.d34BpeVocab _),
    // multimodal (binary payload) pipeline
    "m1_media_stats" -> (M.m1MediaStats _),
    "m2_frame_sample" -> (M.m2FrameSample(_, _)),
    "m3_resize" -> (M.m3Resize _),
  )

  /** DuckDB-runnable oracle per SQL-expressible query (same column names,
    * same ordering, integer aggregates cast to BIGINT to match Spark). */
  def oracleSql: Map[String, String] = Map(
    "s2_scan_union_by_name" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_linenumber = 1
        |UNION ALL BY NAME
        |SELECT l_orderkey, l_linenumber, CAST(NULL AS DOUBLE) AS l_quantity FROM lineitem WHERE l_linenumber = 2
        |ORDER BY l_orderkey, l_linenumber, l_quantity NULLS FIRST""".stripMargin,
    "u1_union_distinct" ->
      """SELECT DISTINCT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
        |  UNION ALL
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY custkey""".stripMargin,
    "u2_union_all" ->
      """SELECT bucket, count(*) AS cnt FROM (
        |  SELECT l_orderkey, l_linenumber, 'small' AS bucket FROM lineitem WHERE l_quantity < 5
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'large' AS bucket FROM lineitem WHERE l_quantity > 45)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "u4_intersect_except" ->
      """SELECT custkey, 'both' AS tag FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT custkey, 'high_only' AS tag FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY custkey, tag""".stripMargin,
    "f1_validity_split" ->
      """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |round(value, 4) AS value_r FROM events
        |WHERE event_type = 'click' AND value IS NOT NULL ORDER BY event_id""".stripMargin,
    "f2_predicate_compile" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus FROM lineitem
        |WHERE (l_returnflag = 'A' OR l_returnflag = 'N')
        |  AND NOT (l_linestatus = 'F') AND l_quantity >= 30
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus""".stripMargin,
    "f5_custom_sql_filter" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price_r FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 150000.0 ORDER BY o_orderkey""".stripMargin,
    "f6_id_filter" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_orderkey IN (1, 7, 32, 69, 134, 322, 517, 1000)
        |   OR o_custkey IN (5, 13)
        |ORDER BY o_orderkey""".stripMargin,
    "f7_between_prefilter" ->
      """SELECT l_returnflag, count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_extendedprice BETWEEN 10000 AND 20000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "f9_nonempty" ->
      """SELECT lang, count(*) AS cnt FROM documents
        |WHERE text IS NOT NULL AND length(text) > 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "j1_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,
    "j2_anti_closure" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_orderkey NOT IN (
        |  SELECT DISTINCT l_orderkey FROM lineitem
        |  WHERE l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size > 10))
        |ORDER BY o_orderkey""".stripMargin,
    "j4_inner_join" ->
      """SELECT n_nationkey, n_name, r_name FROM nation
        |JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey""".stripMargin,
    "j5_three_way_join" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "j8_anti_two_key" ->
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem e
        |  WHERE e.l_returnflag = 'R' AND e.l_orderkey = l.l_orderkey
        |    AND e.l_linenumber = l.l_linenumber)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a1_ordered_list_agg" ->
      """SELECT l_orderkey,
        |string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey) AS parts_seq
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a2a3_bool_aggs" ->
      """SELECT l_returnflag, bool_or(l_quantity > 45) AS any_large,
        |bool_and(l_discount <= 0.1) AS all_low_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a5_first_value" ->
      """SELECT o_custkey, min(o_orderkey) AS first_order, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "a7_extent_agg" ->
      """SELECT event_type, round(min(value), 4) AS min_v, round(max(value), 4) AS max_v,
        |strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
        |strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a8_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a9_count_if" ->
      """SELECT lang, count(*) FILTER (WHERE n_chars > 500) AS long_docs,
        |count(*) AS all_docs FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "ax_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "ax_pivot" ->
      """SELECT lang,
        |count(*) FILTER (WHERE q = 'ok') AS n_ok,
        |count(*) FILTER (WHERE q = 'punct_heavy') AS n_punct_heavy,
        |count(*) FILTER (WHERE q = 'short') AS n_short
        |FROM (
        |  SELECT lang, CASE WHEN length(text) < 100 THEN 'short'
        |    WHEN ((length(text) - length(replace(text, '.', '')))
        |        + (length(text) - length(replace(text, ',', '')))
        |        + (length(text) - length(replace(text, '!', '')))
        |        + (length(text) - length(replace(text, '?', '')))) * 20 > length(text)
        |    THEN 'punct_heavy' ELSE 'ok' END AS q
        |  FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "ax_percentiles" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // halfway-grid residue gate: each exact ratio sits ON the k-decimal
    // halfway point (num·10^k/den ≡ den/2 mod den); both engines compute
    // the identical exact-integer half-up rounding (ExactRound doc) —
    // the one place round(double, k) is allowed to disagree cross-engine
    "dx_halfway_grid" ->
      s"""WITH cases(case_id, num, den, k) AS (VALUES
        |  ('ratio_33_32_s4', 33, 32, 4),
        |  ('ratio_1_128_s6', 1, 128, 6),
        |  ('ratio_161_32_s4', 161, 32, 4)),
        |mcases(case_id, x) AS (VALUES
        |  ('mean_pos_half_micro', 0.000002::DOUBLE),
        |  ('mean_pos_half_micro', 0.000003::DOUBLE),
        |  ('mean_neg_half_micro', -0.000002::DOUBLE),
        |  ('mean_neg_half_micro', -0.000003::DOUBLE)),
        |magg AS (
        |  SELECT case_id, SUM(CAST(floor(x * 1e12 + 0.5) AS HUGEINT)) AS s,
        |    COUNT(*)::HUGEINT AS n
        |  FROM mcases GROUP BY case_id),
        |ar AS (SELECT range AS doc, range AS r FROM range(1, 101)),
        |br(doc, r) AS (VALUES (204, 4), (4, 68), (268, 580)),
        |rrff AS (
        |  SELECT COALESCE(ar.doc, br.doc) AS doc,
        |    CASE WHEN ar.r IS NOT NULL AND br.r IS NOT NULL
        |         THEN 120 + ar.r + br.r ELSE 1 END AS rn,
        |    CASE WHEN ar.r IS NOT NULL AND br.r IS NOT NULL
        |         THEN (60 + ar.r) * (60 + br.r)
        |         ELSE 60 + COALESCE(ar.r, br.r) END AS rd
        |  FROM ar FULL OUTER JOIN br ON ar.doc = br.doc),
        |bmdocs AS (
        |  SELECT i AS doc_id,
        |    CASE WHEN i = 0 THEN 'needle' || repeat(' w', 22)
        |         WHEN i = 79 THEN repeat('w ', 63)
        |         ELSE repeat('w ', 27) END AS text
        |  FROM range(0, 80) r(i)),
        |bmdl AS (
        |  SELECT doc_id, len(ws)::BIGINT AS dl, ws FROM (
        |    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
        |      x -> len(x) > 0) AS ws
        |    FROM bmdocs) w),
        |bmstats AS (SELECT count(*)::BIGINT AS n, sum(dl)::HUGEINT AS s FROM bmdl),
        |bmtf AS (
        |  SELECT doc_id, count(*)::BIGINT AS tf, max(dl) AS dl
        |  FROM (SELECT doc_id, dl, unnest(ws) AS term FROM bmdl)
        |  WHERE term = 'needle' GROUP BY doc_id),
        |bmdf AS (SELECT count(*)::BIGINT AS df FROM bmtf),
        |bmcm AS (
        |  SELECT doc_id, CAST((cnum * 2000000 + cden) // (cden * 2) AS BIGINT) AS cm
        |  FROM (
        |    SELECT doc_id,
        |      22::HUGEINT * tf * s * (2*n - 2*df + 1) AS cnum,
        |      (2*df + 1)::HUGEINT * (10*tf*s + 3*s + 9*dl*n) AS cden
        |    FROM bmtf CROSS JOIN bmdf CROSS JOIN bmstats) q)
        |SELECT * FROM (
        |  SELECT 'eval_recall_1_128' AS case_id, 1::BIGINT AS num,
        |    128::BIGINT AS den, 6::BIGINT AS k,
        |    CAST((1::HUGEINT * 2000000 + 128) // 256 AS DOUBLE) / 1000000.0 AS value
        |  UNION ALL
        |  SELECT case_id, CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den,
        |    CAST(k AS BIGINT) AS k,
        |    CASE WHEN k = 4
        |      THEN CAST((num::HUGEINT * 20000 + den) // (den::HUGEINT * 2) AS DOUBLE) / 10000.0
        |      ELSE CAST((num::HUGEINT * 2000000 + den) // (den::HUGEINT * 2) AS DOUBLE) / 1000000.0
        |    END AS value
        |  FROM cases
        |  UNION ALL
        |  SELECT case_id, 0, 0, 6,
        |    CAST(CASE WHEN s >= 0 THEN (2*s + n*1000000) // (2*n*1000000)
        |              ELSE -((2*(-s) + n*1000000) // (2*n*1000000)) END
        |         AS DOUBLE) / 1000000.0 AS value
        |  FROM magg
        |  UNION ALL
        |  SELECT 'rrf_doc_' || lpad(doc::VARCHAR, 3, '0') AS case_id,
        |    rn::BIGINT AS num, rd::BIGINT AS den, 6::BIGINT AS k,
        |    ${R6("rn", "rd")} AS value
        |  FROM rrff
        |  UNION ALL
        |  SELECT 'bm25_needle_halfway' AS case_id, 7667616::BIGINT AS num,
        |    135168::BIGINT AS den, 6::BIGINT AS k,
        |    sum(cm)::DOUBLE / 1000000.0 AS value
        |  FROM bmcm)
        |ORDER BY case_id""".stripMargin,
    "w1_global_chunk" ->
      """SELECT grp, count(*) AS cnt, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM (SELECT o_orderkey,
        |      CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 1000) AS BIGINT) AS grp
        |      FROM orders)
        |GROUP BY grp ORDER BY grp""".stripMargin,
    "w2_partitioned_row_number" ->
      """SELECT l_orderkey, l_linenumber, rn FROM (
        |  SELECT l_orderkey, l_linenumber,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 2 ORDER BY l_orderkey, rn""".stripMargin,
    "w3_qualify_dedup" ->
      """SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "wx_running_sum" ->
      """SELECT user_id, event_id,
        |round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_v
        |FROM events WHERE user_id < 50 ORDER BY user_id, event_id""".stripMargin,
    "wx_lag_gap" ->
      """SELECT user_id, event_id,
        |date_diff('second', lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
        |FROM events WHERE user_id < 50 ORDER BY user_id, event_id""".stripMargin,
    // DuckDB's native ASOF JOIN is the oracle for the engine's union-tag +
    // window composition
    "wx_asof_join" ->
      """SELECT l.user_id, l.event_id,
        |strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |round(r.v, 4) AS asof_v
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, max(value) AS v FROM events
        |  WHERE event_type = 'view' AND value IS NOT NULL
        |  GROUP BY user_id, ts) r
        |ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY event_id""".stripMargin,
    // floor(epoch()) for the same truncation-vs-rounding reason as
    // jx_range_join; 30-min gap threshold
    "wx_sessionize" ->
      """SELECT user_id, event_id,
        |CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
        |  OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS session_seq
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    CAST(floor(epoch(ts)) AS BIGINT) -
        |    CAST(floor(epoch(lag(ts, 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_s
        |  FROM events WHERE user_id < 50)
        |ORDER BY user_id, event_id""".stripMargin,
    "o1_order_by" ->
      "SELECT s_suppkey, s_name, s_nationkey FROM supplier ORDER BY s_suppkey",
    "o2_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price_r FROM orders
        |ORDER BY price_r DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "g1_posexplode" ->
      """SELECT p_partkey, unnest(range(len(str_split(p_type, ' ')))) AS pos,
        |unnest(str_split(p_type, ' ')) AS token
        |FROM part ORDER BY p_partkey, pos""".stripMargin,
    "g3_distinct_explode" ->
      """SELECT DISTINCT unnest(str_split(p_type, ' ')) AS token FROM part
        |ORDER BY token""".stripMargin,
    "t3_case_chain" ->
      """SELECT 'customer/' || c_custkey AS feature_id,
        |CASE WHEN c_acctbal < 0 THEN 'negative'
        |     WHEN c_acctbal < 5000 THEN 'regular'
        |     ELSE 'premium' END AS tier,
        |c_mktsegment FROM customer ORDER BY feature_id""".stripMargin,
    "fx_scalar_funcs" ->
      """SELECT p_partkey, round(p_retailprice / 7.0, 7) AS price7,
        |CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part
        |WHERE p_name LIKE '%green%' OR starts_with(p_type, 'STANDARD')
        |ORDER BY p_partkey""".stripMargin,
    "fx_json_extract" ->
      """SELECT event_type,
        |count(*) FILTER (WHERE k >= 50) AS high_k,
        |round(avg(k), 4) AS avg_k
        |FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY h ORDER BY h""".stripMargin,
    "d2_dedup_survivors" ->
      "SELECT count(*) AS n_unique FROM (SELECT md5(text) AS h FROM documents GROUP BY h)",
    // oracle is the naive inequality join; the engine runs the bucketed
    // equi-join decomposition — results must be identical. floor(epoch())
    // NOT CAST(epoch() AS BIGINT): the cast ROUNDS fractional seconds
    // where Spark's unix_timestamp truncates (off-by-one on sub-second
    // timestamps)
    "jx_range_join" ->
      """SELECT e.event_id AS err_id, c.event_id AS click_id,
        |CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT) AS gap_s
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id
        | AND abs(CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT)) <= 3600
        |ORDER BY err_id, click_id""".stripMargin,
    // distributed spatial join (no equi key): the oracle states the
    // containment as BETWEEN over the boxes' exact-binary bounds; the
    // engine buckets both sides onto a 1-degree grid and JTS-verifies —
    // identical pairs prove the grid+verify decomposition exact
    "jx_spatial_join" ->
      """WITH pts AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS pid,
        |    (c_custkey % 320)::DOUBLE / 16.0 - 10.0 AS px,
        |    ((c_custkey * 7) % 320)::DOUBLE / 16.0 - 10.0 AS py
        |  FROM customer),
        |boxes AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS box_id,
        |    (n_nationkey % 5)::DOUBLE * 4.0 - 10.0 AS x0,
        |    (n_nationkey // 5)::DOUBLE * 4.0 - 10.0 AS y0
        |  FROM nation)
        |SELECT p.pid, b.box_id
        |FROM pts p JOIN boxes b
        |  ON p.px BETWEEN b.x0 AND b.x0 + 3.0
        | AND p.py BETWEEN b.y0 AND b.y0 + 3.0
        |ORDER BY p.pid, b.box_id""".stripMargin,
    "d9_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(text), 1, 7))::BIGINT % 100 <
        |  CASE WHEN lang = 'en' THEN 20 ELSE 5 END
        |ORDER BY doc_id""".stripMargin,
    "d3_text_stats" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len,
        |CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d4_lang_profile" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "d5_quality_score" ->
      """SELECT doc_id,
        |CAST((length(text) - length(replace(text, '.', '')))
        |   + (length(text) - length(replace(text, ',', '')))
        |   + (length(text) - length(replace(text, '!', '')))
        |   + (length(text) - length(replace(text, '?', ''))) AS BIGINT) AS n_punct,
        |CASE WHEN length(text) < 100 THEN 'short'
        |     WHEN ((length(text) - length(replace(text, '.', '')))
        |         + (length(text) - length(replace(text, ',', '')))
        |         + (length(text) - length(replace(text, '!', '')))
        |         + (length(text) - length(replace(text, '?', '')))) * 20 > length(text)
        |     THEN 'punct_heavy' ELSE 'ok' END AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d6_lang_id" ->
      """SELECT doc_id, lang,
        |CASE WHEN text LIKE '% the %' OR text LIKE '% and %' OR text LIKE '% of %' THEN 'en'
        |     WHEN text LIKE '% der %' OR text LIKE '% und %' OR text LIKE '% die %' THEN 'de'
        |     WHEN text LIKE '% le %' OR text LIKE '% la %' OR text LIKE '% et %' THEN 'fr'
        |     ELSE 'unknown' END AS lang_pred
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d7_fingerprint" ->
      """SELECT doc_id, md5(left(text, 32) || right(text, 32) || CAST(n_chars AS VARCHAR)) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d8_token_count" ->
      """SELECT doc_id,
        |CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        |CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_est
        |FROM documents ORDER BY doc_id""".stripMargin,
    "e1_window_batch" ->
      """SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        |event_type, count(*) AS n, round(sum(value), 4) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "m1_media_stats" ->
      """SELECT CASE WHEN vec_id % 3 = 0 THEN 'image'
        |            WHEN vec_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |count(*) AS n, CAST(count(*) * 32 AS BIGINT) AS total_bytes,
        |CAST(max(vec_id % 640 + 32) AS INTEGER) AS max_w,
        |CAST(max(vec_id % 480 + 32) AS INTEGER) AS max_h
        |FROM embeddings GROUP BY 1 ORDER BY kind""".stripMargin,
    "m2_frame_sample" ->
      """SELECT media_id, CAST(frame_ts_ms / 5000 AS BIGINT) AS frame_idx, frame_ts_ms FROM (
        |  SELECT vec_id AS media_id,
        |  unnest(range(0, (vec_id % 30000) + 1001, 5000)) AS frame_ts_ms
        |  FROM embeddings WHERE vec_id % 3 = 2)
        |ORDER BY media_id, frame_idx""".stripMargin,
    // the resize stub's integer math (w*256 // max(w,h), floor on
    // positives) is replicated exactly; dims come from the same
    // synthetic-media mapping as m1
    "m3_resize" ->
      """SELECT out_w, out_h, count(*) AS n, min(media_id) AS min_id FROM (
        |  SELECT media_id,
        |    CASE WHEN greatest(w, h) <= 256 THEN w
        |         ELSE CAST(w * 256 // greatest(w, h) AS INTEGER) END AS out_w,
        |    CASE WHEN greatest(w, h) <= 256 THEN h
        |         ELSE CAST(h * 256 // greatest(w, h) AS INTEGER) END AS out_h
        |  FROM (
        |    SELECT vec_id AS media_id,
        |      CAST(vec_id % 640 + 32 AS INTEGER) AS w,
        |      CAST(vec_id % 480 + 32 AS INTEGER) AS h
        |    FROM embeddings WHERE vec_id % 3 = 0))
        |GROUP BY out_w, out_h ORDER BY out_w, out_h""".stripMargin,
    "x1_cosine_topk" ->
      """SELECT vec_id,
        |round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cosine
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    // filtered search: identical ranking convention, the metadata
    // predicate simply bounds the scored set
    "x16_filtered_topk" ->
      """SELECT vec_id,
        |round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cosine
        |FROM embeddings WHERE label = 3 AND vec_id <> 0
        |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    // The x2-x6 oracles reproduce the engine's PORTABLE hashing (28-bit
    // md5-prefix + affine rehash mod 1e9+7; literal ±1 hyperplanes) — the
    // whole near-dup/LSH surface is hash-verified, not rows-only.
    "x2_minhash_lsh" -> (MinhashOracleCtes +
      """
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i])) / 16.0 AS est_jaccard
        |FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""").stripMargin,
    "x3_simhash" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    UNNEST(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |  FROM documents
        |), wh AS (
        |  SELECT doc_id, ('0x' || substr(md5(w), 1, 7))::BIGINT AS wh FROM w
        |), bits AS (
        |  SELECT doc_id, b,
        |    CASE WHEN sum(CASE WHEN (wh >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
        |         THEN 1 << b ELSE 0 END AS bit
        |  FROM wh, range(0, 16) AS r(b) GROUP BY doc_id, b
        |)
        |SELECT doc_id, sum(bit)::BIGINT AS simhash FROM bits
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // simhash near-dup: k+1-band Hamming LSH (lossless for distance <= 1)
    // over the same portable word-hash simhash as x3
    "x10_simhash_near_dup" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    UNNEST(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |  FROM documents
        |), wh AS (
        |  SELECT doc_id, ('0x' || substr(md5(w), 1, 7))::BIGINT AS wh FROM w
        |), bits AS (
        |  SELECT doc_id, b,
        |    CASE WHEN sum(CASE WHEN (wh >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
        |         THEN 1 << b ELSE 0 END AS bit
        |  FROM wh, range(0, 16) AS r(b) GROUP BY doc_id, b
        |), sh AS (
        |  SELECT doc_id, sum(bit)::BIGINT AS simhash FROM bits GROUP BY doc_id
        |), banded AS (
        |  SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS byte
        |  FROM sh, range(0, 2) AS bb(band)
        |)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        |FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
        |ORDER BY doc_a, doc_b""".stripMargin,
    "x4_ngram_jaccard" -> (MinhashOracleCtes +
      """,
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        |), sets AS (
        |  SELECT doc_id, list(shash) AS s FROM shash GROUP BY doc_id
        |)
        |SELECT doc_a, doc_b,
        |  round(len(list_intersect(sa.s, sb.s)) /
        |    (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))::DOUBLE, 6) AS jaccard
        |FROM pairs JOIN sets sa ON pairs.doc_a = sa.doc_id
        |           JOIN sets sb ON pairs.doc_b = sb.doc_id
        |ORDER BY doc_a, doc_b""").stripMargin,
    "x5_ann_buckets" -> {
      val bucket = (0 until 8).map(p =>
        s"(CASE WHEN list_inner_product(embedding::DOUBLE[], " +
          s"${operators.SimilarityQueries.planeSignsSql(p)}) > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH proj AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v, $bucket AS bucket FROM embeddings
         |)
         |SELECT b.vec_id, round(list_cosine_similarity(b.v, q.v), 6) AS cosine
         |FROM proj b JOIN proj q ON b.bucket = q.bucket AND q.vec_id = 0
         |WHERE b.vec_id <> 0
         |ORDER BY cosine DESC, b.vec_id ASC LIMIT 10""".stripMargin
    },
    "x6_embedding_near_dup" -> {
      val bucket = (0 until 6).map(p =>
        s"(CASE WHEN list_inner_product(embedding::DOUBLE[], " +
          s"${operators.SimilarityQueries.planeSignsSql(p)}) > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH proj AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v, $bucket AS bucket FROM embeddings
         |)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_cosine_similarity(a.v, b.v), 6) AS cosine
         |FROM proj a JOIN proj b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE round(list_cosine_similarity(a.v, b.v), 6) > 0.4
         |ORDER BY id_a, id_b""".stripMargin
    },
    // cross-corpus vector admission: the incoming split minus every
    // vector with round-6 cosine >= 0.4 against ANY existing vector —
    // exact (no bucketing), decisions on the rounded value both engines
    // agree on (the x6 convention). The CASE mirrors the engine's NaN
    // convention (EmbeddingOps.admitVectors: a degenerate zero/NaN
    // vector's NaN cosine maps to -2, below any threshold, so it is
    // near NOTHING and admits) — without it DuckDB's NaN-greatest
    // ordering would make round(NaN, 6) >= 0.4 TRUE and REJECT the
    // same vector the engine admits, a latent gate divergence the
    // moment the corpus grows a zero embedding.
    "x33_vec_admit" ->
      """WITH inc AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |ex AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 5 <> 0),
        |hits AS (
        |  SELECT DISTINCT inc.vec_id FROM inc JOIN ex
        |  ON (CASE WHEN isnan(list_cosine_similarity(inc.v, ex.v)) THEN -2
        |      ELSE round(list_cosine_similarity(inc.v, ex.v), 6) END) >= 0.4)
        |SELECT vec_id, label FROM inc
        |WHERE vec_id NOT IN (SELECT vec_id FROM hits) ORDER BY vec_id""".stripMargin,
    "x7_ivf_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |sims AS (
        |  SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.cv) AS sim
        |  FROM e CROSS JOIN c
        |), cells AS (
        |  SELECT vec_id, v, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |    FROM sims)
        |  WHERE rn = 1
        |), qcells AS (
        |  SELECT cid AS cell FROM (
        |    SELECT cid, row_number() OVER (ORDER BY sim DESC, cid) AS rn
        |    FROM sims WHERE vec_id = 0)
        |  WHERE rn <= 2
        |), q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        |SELECT cells.vec_id, round(list_cosine_similarity(cells.v, q.qv), 6) AS cosine
        |FROM cells JOIN qcells ON cells.cell = qcells.cell CROSS JOIN q
        |WHERE cells.vec_id <> 0
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    // connected components over the LSH candidate graph: the recursive
    // CTE computes min-reachable-id per node — identical semantics to the
    // engine's label-propagation loop.
    "x8_dedup_clusters" -> ("WITH RECURSIVE " +
      MinhashOracleCtes.stripPrefix("WITH ") +
      """,
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        |  WHERE len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i])) / 16.0 >= 0.5
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM cand
        |  UNION SELECT doc_b, doc_a FROM cand
        |), reach(node, m) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.m
        |)
        |SELECT node AS doc_id, min(m) AS cluster_id FROM reach
        |GROUP BY node ORDER BY doc_id""").stripMargin,
    // decontamination: corpus docs sharing any word 3-gram with the
    // synthetic benchmark set (doc_id % 97 == 0); only the shash CTE of
    // the shared prefix is referenced (DuckDB inlines CTEs lazily)
    "d10_decontaminate" -> (MinhashOracleCtes +
      """
        |SELECT DISTINCT c.doc_id FROM shash c
        |JOIN (SELECT DISTINCT shash FROM shash WHERE doc_id % 97 = 0) b USING (shash)
        |WHERE c.doc_id % 97 <> 0
        |ORDER BY doc_id""").stripMargin,
    // containment scoring: the fraction of each corpus doc's distinct
    // grams found in the benchmark set (d10 refined to HOW contaminated)
    "x32_contamination" -> (MinhashOracleCtes +
      """,
        |ds AS (SELECT DISTINCT doc_id, shash FROM shash WHERE doc_id % 97 <> 0),
        |bs AS (SELECT DISTINCT shash AS bsh FROM shash WHERE doc_id % 97 = 0),
        |agg AS (
        |  SELECT d.doc_id, count(*) AS n_grams, count(b.bsh) AS n_hit
        |  FROM ds d LEFT JOIN bs b ON b.bsh = d.shash GROUP BY d.doc_id)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |  CAST(n_hit AS BIGINT) AS n_hit,
        |  CAST((n_hit::HUGEINT * 2000000 + n_grams) // (n_grams::HUGEINT * 2) AS DOUBLE) / 1000000.0 AS containment
        |FROM agg WHERE n_hit > 0
        |ORDER BY containment DESC, doc_id LIMIT 20""").stripMargin,
    // within-doc repetition: words hashed with the same portable 28-bit
    // md5 prefix the engine uses map-side (collisions identical per engine)
    "d11_repetition_quality" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    UNNEST(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |  FROM documents
        |), wh AS (
        |  SELECT doc_id, ('0x' || substr(md5(w), 1, 7))::BIGINT AS wh FROM w
        |), cnt AS (
        |  SELECT doc_id, wh, count(*) AS c FROM wh GROUP BY doc_id, wh
        |), per AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |    count(*) AS n_distinct, max(c) AS top_cnt
        |  FROM cnt GROUP BY doc_id
        |)
        |SELECT doc_id, n_words, n_distinct,
        |  CAST((top_cnt::HUGEINT * 2000000 + n_words) // (n_words::HUGEINT * 2) AS DOUBLE) / 1000000.0 AS top_word_share,
        |  top_cnt * 10 >= n_words AS repetitive
        |FROM per ORDER BY doc_id""".stripMargin,
    // corpus boilerplate: doc frequency of 3-gram shingle hashes; only the
    // shash CTE of the shared prefix is referenced
    "d12_boilerplate_ngrams" -> (MinhashOracleCtes +
      """
        |SELECT shash, count(*) AS n_docs FROM shash GROUP BY shash
        |ORDER BY n_docs DESC, shash LIMIT 20""").stripMargin,
    // PII scrub: the oracle performs the same deterministic doc_id-derived
    // enrichment as the engine, then matches/redacts with identical
    // patterns (Java-regex ∩ RE2 dialect; DuckDB needs the 'g' flag where
    // Spark's regexp_replace is global by default)
    "d13_pii_scrub" ->
      """WITH enriched AS (
        |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail-' || CAST(doc_id % 7 AS VARCHAR)
        |    || '.example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)
        |    || '.0.' || CAST(doc_id % 250 AS VARCHAR) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')) AS scrubbed_md5
        |FROM enriched ORDER BY doc_id""".stripMargin,
    // tf-idf with ratio idf (N/df, no log): the score tf·N/df is an
    // integer ratio, rounded at 4 via EXACT integer arithmetic on both
    // engines (graft.functions.ExactRound doc) — a 2^a·5^b df could put
    // the true score ON the 4-decimal halfway grid where two engines'
    // doubles legitimately round apart; the window orders by the exact
    // rounded score + term for a total order
    "d14_tfidf_keywords" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, rank, term, tfidf FROM (
        |  SELECT doc_id, term,
        |    CAST((tf::HUGEINT * n_docs * 20000 + df) // (df::HUGEINT * 2) AS DOUBLE) / 10000.0 AS tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY CAST((tf::HUGEINT * n_docs * 20000 + df) // (df::HUGEINT * 2) AS DOUBLE) / 10000.0 DESC, term) AS rank
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // domain profile: enrichment + group-1 regex extraction mirrored in
    // RE2; the blocked flag is a literal-prefix LIKE on both sides
    "d16_domain_profile" ->
      """WITH enriched AS (
        |  SELECT doc_id, text || ' see https://site-' || CAST(doc_id % 13 AS VARCHAR)
        |    || '.example.org/page/' || CAST(doc_id AS VARCHAR)
        |    || ' and http://www.ref-' || CAST(doc_id % 5 AS VARCHAR) || '.net/x' AS t
        |  FROM documents),
        |doms AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
        |  FROM enriched)
        |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  count(*) AS n_urls, domain LIKE 'www.ref-%' AS blocked
        |FROM doms GROUP BY domain ORDER BY domain""".stripMargin,
    "d15_length_deciles" ->
      """SELECT lang, decile, count(*) AS n_docs,
        |  min(n_chars) AS lo, max(n_chars) AS hi
        |FROM (SELECT lang, n_chars,
        |      ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS decile
        |      FROM documents)
        |GROUP BY lang, decile ORDER BY lang, decile""".stripMargin,
    // int8 quantization: float32 → double is exact and every op after it
    // is correctly-rounded IEEE; floor lands on integral doubles, where
    // Spark's truncating int cast and DuckDB's rounding int cast agree
    "x11_int8_quantize" ->
      """SELECT vec_id,
        |  array_to_string(list_transform(v, x -> CAST(CAST(
        |    CASE WHEN hi = lo THEN 0
        |         ELSE least(floor((x - lo) * 255.0 / (hi - lo)), 255.0) END
        |    AS INT) AS VARCHAR)), ',') AS qvec,
        |  round((hi - lo) / 255.0, 6) AS scale,
        |  round(lo, 6) AS zero_point
        |FROM (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi
        |      FROM (SELECT vec_id,
        |            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |            FROM embeddings))
        |ORDER BY vec_id""".stripMargin,
    // context-window chunking: 64-word windows, stride 48; the md5 of
    // each chunk's exact text makes the oracle verify content
    "d17_chunk_documents" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |ww AS (SELECT doc_id, w, len(w) AS nw FROM w WHERE len(w) > 0),
        |ch AS (SELECT doc_id, w, nw, unnest(range(0, nw, 48)) AS start FROM ww)
        |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
        |  CAST(least(64, nw - start) AS BIGINT) AS n_chunk_words,
        |  md5(array_to_string(list_slice(w, start + 1, start + 64), ' ')) AS chunk_md5
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    // concat-and-chunk packing: shard-local (lang) running token count,
    // bin = where the doc STARTS; all-integer arithmetic
    "d18_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang, CAST(ceil(length(text) / 4.0) AS BIGINT) AS toks
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id, toks,
        |    sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT lang, CAST(floor((cum - toks) / 2048) AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS bin_tokens,
        |  min(doc_id) AS first_doc
        |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    // duplicate-passage spans: word 16-grams hashed with full md5, dup =
    // seen in 2+ distinct docs, consecutive dup positions merge via
    // gaps-and-islands; a doc with < 16 words shingles to ONE whole-doc
    // gram (the word_ngrams kernel contract), hence the CASE and the
    // least(...) span clamp
    "d19_dup_passages" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, len(w) AS nw, CAST(p AS BIGINT) AS pos,
        |    md5(CASE WHEN len(w) < 16 THEN array_to_string(w, ' ')
        |        ELSE array_to_string(list_slice(w, p + 1, p + 16), ' ') END) AS gh
        |  FROM w, unnest(range(0, greatest(len(w) - 15, 1))) t(p)),
        |dup AS (SELECT gh FROM g GROUP BY gh HAVING min(doc_id) < max(doc_id)),
        |d AS (SELECT g.doc_id, g.nw, g.pos FROM g JOIN dup USING (gh)),
        |i AS (SELECT doc_id, nw, pos,
        |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        |      FROM d)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(least(max(pos) + 16, min(nw)) - min(pos) AS BIGINT) AS span_words
        |FROM i GROUP BY doc_id, isl ORDER BY doc_id, span_start""".stripMargin,
    // cut-passages: d19's span CTEs, then an indexed list_filter drops
    // every word position covered by a span (DuckDB lambda index is
    // 1-based, hence i - 1); output text is the split_words-normalized
    // rejoin for cut and uncut docs alike
    "d20_cut_passages" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, len(ws) AS nw, CAST(p AS BIGINT) AS pos,
        |    md5(CASE WHEN len(ws) < 16 THEN array_to_string(ws, ' ')
        |        ELSE array_to_string(list_slice(ws, p + 1, p + 16), ' ') END) AS gh
        |  FROM w, unnest(range(0, greatest(len(ws) - 15, 1))) t(p)),
        |dup AS (SELECT gh FROM g GROUP BY gh HAVING min(doc_id) < max(doc_id)),
        |d AS (SELECT g.doc_id, g.nw, g.pos FROM g JOIN dup USING (gh)),
        |i AS (SELECT doc_id, nw, pos,
        |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        |      FROM d),
        |sp AS (SELECT doc_id, min(pos) AS s,
        |         least(max(pos) + 16, min(nw)) - min(pos) AS wd
        |       FROM i GROUP BY doc_id, isl),
        |sl AS (SELECT doc_id, list(struct_pack(s := s, w := wd)) AS spans
        |       FROM sp GROUP BY doc_id),
        |k AS (
        |  SELECT w.doc_id, ws, CASE WHEN spans IS NULL THEN ws
        |    ELSE list_filter(ws, (x, i) -> len(list_filter(spans,
        |      q -> i - 1 >= q.s AND i - 1 < q.s + q.w)) = 0) END AS kept
        |  FROM w LEFT JOIN sl USING (doc_id))
        |SELECT doc_id, coalesce(array_to_string(kept, ' '), '') AS clean_text,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  CAST(len(ws) - len(kept) AS BIGINT) AS n_cut
        |FROM k ORDER BY doc_id""".stripMargin,
    // domain mixing: weight = source_number % 4 + 1, binding group =
    // smallest n/weight (IEEE-double ratio, name tie-break — the engine
    // replays the same ordering), quota = floor(n_bind * w / w_bind),
    // members picked in content-hash order
    // selection order per domain = (hash mod 64, hash, id): the engine's
    // (domain × subbucket)-histogram walk keeps whole subbuckets in
    // ascending order and row_numbers only the boundary cell, which
    // equals this one flat window rule stated directly
    "d21_domain_mix" ->
      """WITH c AS (
        |  SELECT source, count(*) AS n,
        |    CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS wt
        |  FROM documents GROUP BY source),
        |b AS (SELECT n AS bn, wt AS bw FROM c ORDER BY n * 1.0 / wt, source LIMIT 1),
        |q AS (SELECT source, bn * wt // bw AS quota FROM c, b),
        |r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ('0x' || substr(md5(text), 1, 7))::BIGINT % 64,
        |        ('0x' || substr(md5(text), 1, 7))::BIGINT, doc_id) AS rn
        |  FROM documents)
        |SELECT r.doc_id, r.source FROM r JOIN q USING (source)
        |WHERE rn <= quota ORDER BY doc_id""".stripMargin,
    // token-budget selection: the engine's histogram-seeded prefix equals
    // a running sum over the global order (bucket DESC, hash-subbucket,
    // hash, id) capped at the budget — the oracle states it directly
    "d22_token_budget" ->
      """WITH b AS (
        |  SELECT doc_id, least(9, n_chars // 64) AS bucket,
        |    CAST(ceil(n_chars / 4.0) AS BIGINT) AS toks,
        |    ('0x' || substr(md5(text), 1, 7))::BIGINT AS h
        |  FROM documents),
        |c AS (SELECT *, sum(toks) OVER
        |        (ORDER BY bucket DESC, h % 64, h, doc_id) AS cum
        |      FROM b)
        |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, toks FROM c
        |WHERE cum <= 20000 ORDER BY doc_id""".stripMargin,
    // hashed linear classifier: exact integer word-weight sum and count
    // only — the mean is a library-side double whose round-half ties are
    // not portable, so the gate never compares floats
    "d23_quality_classifier" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ws
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(ws,
        |      x -> ('0x' || substr(md5(x), 1, 7))::BIGINT % 2001 - 1000)), 0) AS BIGINT) AS weight_sum
        |  FROM w)
        |SELECT doc_id, weight_sum, n_words,
        |  CASE WHEN weight_sum > 0 THEN 'keep' ELSE 'drop' END AS label
        |FROM s ORDER BY doc_id""".stripMargin,
    // deterministic shuffle: shard + in-shard rank both derive from the
    // portable hash of seed:doc_id, so any engine replays the permutation
    "d24_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT AS h
        |  FROM documents)
        |SELECT doc_id, h % 8 AS shard,
        |  row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
        |FROM h ORDER BY doc_id""".stripMargin,
    // bigram LM: per-doc tf over hashed word bigrams, corpus frequency =
    // sum of tf, hits = sum(tf * cf) — all integers, so exact both sides;
    // docs under 2 words coalesce to (0, 0)
    "d25_bigram_lm" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(ws[p + 1] || ' ' || ws[p + 2]), 1, 7))::BIGINT AS h
        |  FROM w, unnest(range(0, len(ws) - 1)) t(p)
        |  WHERE len(ws) >= 2),
        |tf AS (SELECT doc_id, h, count(*) AS tf FROM g GROUP BY doc_id, h),
        |cf AS (SELECT h, sum(tf) AS cf FROM tf GROUP BY h),
        |hits AS (
        |  SELECT doc_id, sum(tf * cf) AS bigram_hits, sum(tf) AS n_bigrams
        |  FROM tf JOIN cf USING (h) GROUP BY doc_id)
        |SELECT w.doc_id,
        |  CAST(coalesce(bigram_hits, 0) AS BIGINT) AS bigram_hits,
        |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams
        |FROM w LEFT JOIN hits USING (doc_id) ORDER BY doc_id""".stripMargin,
    // incremental crawl admit: the increment (doc_id % 5 == 0) minus
    // exact copies of the existing corpus (md5 anti) minus cross-corpus
    // LSH near-duplicates at 0.5 — signatures are per-doc properties, so
    // the shared minhash chain over all documents serves both sides
    "d27_increment_admit" -> IncrementAdmitOracle,
    // d42 shares d27's oracle BY CONSTRUCTION (one val, divergence
    // impossible): the gate proves dedupeIncrementFromStore (digest +
    // minhash signatures only, no corpus-text reads) admits the
    // identical set dedupeIncrement derives from text
    "d42_admit_from_store" -> IncrementAdmitOracle,
    // hash-sliced split assignment: slot = portable hash of seed:id into
    // 100 integer slots; the CASE restates the cumulative 96/2/2 bounds
    "d28_split" ->
      """SELECT doc_id,
        |  CASE WHEN slot < 96 THEN 'train' WHEN slot < 98 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |    ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
        |      % 100 AS slot
        |  FROM documents) ORDER BY doc_id""".stripMargin,
    // temperature mixture: integer weights floor(sqrt(n)), integer-division
    // targets capped at the domain size, selection restated as one flat
    // per-domain window in the engine's (hash mod 64, hash, id) order
    "d29_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |w AS (SELECT source, n, CAST(floor(sqrt(n)) AS BIGINT) AS wt FROM c),
        |t AS (SELECT sum(wt) AS tw FROM w),
        |q AS (SELECT source, least(n, 5000 * wt // tw) AS quota FROM w, t),
        |r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ('0x' || substr(md5(text), 1, 7))::BIGINT % 64,
        |        ('0x' || substr(md5(text), 1, 7))::BIGINT, doc_id) AS rn
        |  FROM documents)
        |SELECT r.doc_id, r.source FROM r JOIN q USING (source)
        |WHERE rn <= quota ORDER BY doc_id""".stripMargin,
    // epoch-weighted upsampling: floor(e/100) copies for every doc, the
    // e%100 fractional remainder selected by content-hash slot — all
    // integer arithmetic, one UNNEST(range(n)) per doc
    "d30_epoch_repeat" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(text), 1, 7))::BIGINT % 100 AS h,
        |    (CAST(substr(source, 4) AS BIGINT) % 3) * 100 + 50 AS e
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    e // 100 + CASE WHEN h < e % 100 THEN 1 ELSE 0 END AS n
        |  FROM b)
        |SELECT doc_id, CAST(UNNEST(range(n)) AS BIGINT) AS copy
        |FROM c WHERE n > 0 ORDER BY doc_id, copy""".stripMargin,
    // the composed curation pipeline: scrub -> quality gates -> exact
    // dedup -> banded-LSH near dedup (the shared minhash CTE chain,
    // rebased from `documents` onto the exact-survivor relation `ep`) ->
    // decontamination; stage = first rejecting stage, priority stated by
    // the one coalesce
    "d26_curate" -> ("WITH RECURSIVE " +
      """scrub AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS text
        |  FROM documents),
        |repw AS (
        |  SELECT doc_id, ('0x' || substr(md5(w), 1, 7))::BIGINT AS wh
        |  FROM (SELECT doc_id, UNNEST(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS w FROM scrub)),
        |repc AS (SELECT doc_id, wh, count(*) AS c FROM repw GROUP BY doc_id, wh),
        |rep AS (SELECT doc_id,
        |    CAST((max(c)::HUGEINT * 2000000 + CAST(sum(c) AS BIGINT)) // (CAST(sum(c) AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 AS tws
        |  FROM repc GROUP BY doc_id),
        |quality AS (
        |  SELECT s.doc_id, s.text,
        |    CASE WHEN len(s.text) < 100 THEN 'too_short'
        |         WHEN len(s.text) > 1048576 THEN 'too_long'
        |         WHEN r.tws > 0.2 THEN 'repetitive' END AS q
        |  FROM scrub s LEFT JOIN rep r USING (doc_id)),
        |qp AS (SELECT doc_id, text FROM quality WHERE q IS NULL),
        |keep AS (SELECT md5(text) AS h, min(doc_id) AS keeper FROM qp GROUP BY 1),
        |ep AS (SELECT qp.doc_id, qp.text FROM qp JOIN keep ON md5(qp.text) = keep.h
        |  WHERE qp.doc_id = keep.keeper),
        |""".stripMargin +
      MinhashOracleCtes.stripPrefix("WITH ").replace("FROM documents", "FROM ep") +
      """,
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        |  WHERE len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i])) / 16.0 >= 0.5
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM cand
        |  UNION SELECT doc_b, doc_a FROM cand
        |), reach(node, m) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.m
        |), clusters AS (
        |  SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node
        |), near AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id),
        |cws AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM scrub),
        |cshl AS (
        |  SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |    ELSE list_transform(range(0, len(ws) - 2),
        |      i -> array_to_string(list_slice(ws, i + 1, i + 3), ' ')) END AS shingles
        |  FROM cws),
        |cshash AS (
        |  SELECT DISTINCT doc_id, ('0x' || substr(md5(sh), 1, 7))::BIGINT AS shash
        |  FROM (SELECT doc_id, UNNEST(shingles) AS sh FROM cshl)),
        |bws AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM documents WHERE doc_id % 97 = 0),
        |bshl AS (
        |  SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |    ELSE list_transform(range(0, len(ws) - 2),
        |      i -> array_to_string(list_slice(ws, i + 1, i + 3), ' ')) END AS shingles
        |  FROM bws),
        |bshash AS (
        |  SELECT DISTINCT ('0x' || substr(md5(sh), 1, 7))::BIGINT AS shash
        |  FROM (SELECT UNNEST(shingles) AS sh FROM bshl)),
        |contam AS (SELECT DISTINCT c.doc_id FROM cshash c JOIN bshash b USING (shash))
        |SELECT s.doc_id,
        |  coalesce(q.q,
        |    CASE WHEN k.keeper IS NOT NULL AND s.doc_id <> k.keeper THEN 'exact_dup' END,
        |    CASE WHEN n.doc_id IS NOT NULL THEN 'near_dup' END,
        |    CASE WHEN ct.doc_id IS NOT NULL THEN 'contaminated' END,
        |    'kept') AS stage
        |FROM scrub s
        |LEFT JOIN quality q USING (doc_id)
        |LEFT JOIN keep k ON md5(s.text) = k.h
        |LEFT JOIN near n USING (doc_id)
        |LEFT JOIN contam ct USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin),
    // substring-fingerprint overlap: char 24-grams, deterministic h%8
    // sample, boilerplate cap, >=3 shared — every rule is plain SQL over
    // the portable 28-bit hash, so the oracle replays it exactly
    "x13_fingerprint_overlap" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(range(1, length(text) - 24 + 2)) AS pos, text
        |  FROM documents WHERE length(text) >= 24),
        |fp AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(substr(text, pos, 24)), 1, 7))::BIGINT AS h
        |  FROM g
        |  WHERE ('0x' || substr(md5(substr(text, pos, 24)), 1, 7))::BIGINT % 8 = 0),
        |kept AS (
        |  SELECT doc_id, h FROM fp
        |  WHERE h IN (SELECT h FROM fp GROUP BY h HAVING count(*) <= 50)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, shared FROM pairs
        |WHERE shared >= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // SemDeDup drops: nearest of the first-16 centroids (x7's cells CTE,
    // same sim-desc/cid-asc tie-break), pairwise cosine ONLY within a
    // cell, rounded to 6 before the tau comparison (the x6 convention);
    // a vector is dropped when a smaller same-cell id exceeds tau
    "x14_semdedup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |sims AS (
        |  SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.cv) AS sim
        |  FROM e CROSS JOIN c),
        |cells AS (
        |  SELECT vec_id, v, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |    FROM sims)
        |  WHERE rn = 1),
        |pr AS (
        |  SELECT b.vec_id, b.cell,
        |    round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id)
        |SELECT vec_id, cell, CAST(count(*) AS BIGINT) AS n_similar,
        |  max(cos) AS max_cos
        |FROM pr WHERE cos > 0.4 GROUP BY vec_id, cell ORDER BY vec_id""".stripMargin,
    // PQ encode with the untrained first-K codebook (the x7 trick): the
    // squared-L2 is the same |a|²-2ab+|b|² expansion over
    // list_inner_product, rounded to 6 BEFORE the argmin so tie-breaks
    // are engine-identical; qerr is a sum of already-rounded values whose
    // true total is a multiple of 1e-6 — far from every rounding
    // boundary, so accumulation order cannot change the rounded result
    "x12_pq_encode" ->
      """WITH emb AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |sv AS (
        |  SELECT vec_id, sub, list_slice(v, sub*16 + 1, sub*16 + 16) AS sv
        |  FROM emb CROSS JOIN (SELECT unnest(range(4)) AS sub)),
        |ids AS (
        |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
        |  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |cb AS (
        |  SELECT s.sub, i.code, s.sv AS cv FROM sv s JOIN ids i USING (vec_id)),
        |dist AS (
        |  SELECT s.vec_id, s.sub, c.code,
        |    round(list_inner_product(s.sv, s.sv)
        |      - 2.0 * list_inner_product(s.sv, c.cv)
        |      + list_inner_product(c.cv, c.cv), 6) AS d
        |  FROM sv s JOIN cb c ON s.sub = c.sub),
        |best AS (
        |  SELECT vec_id, sub, code, d,
        |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
        |  FROM dist)
        |SELECT vec_id,
        |  string_agg(CAST(code AS VARCHAR), ',' ORDER BY sub) AS codes,
        |  round(sum(d), 6) AS qerr
        |FROM best WHERE rn = 1
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // the composed IVF-PQ serving path (build -> write -> load -> probe):
    // coarse cells = first-4 vectors, residual codebook = first-16
    // residual subvectors, ADC over the vec-0 query's 2 probed cells —
    // each stage restated as the flat relational rule it implements
    "x15_ivfpq_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
        |sims AS (
        |  SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.cv) AS sim
        |  FROM e CROSS JOIN c),
        |cells AS (
        |  SELECT vec_id, v, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |    FROM sims) WHERE rn = 1),
        |res AS (
        |  SELECT cl.vec_id, cl.cell,
        |    list_transform(range(1, 65), i -> cl.v[i] - c.cv[i]) AS r
        |  FROM cells cl JOIN c ON cl.cell = c.cid),
        |sv AS (
        |  SELECT vec_id, cell, sub, list_slice(r, sub*16 + 1, sub*16 + 16) AS s
        |  FROM res CROSS JOIN (SELECT unnest(range(4)) AS sub)),
        |ids AS (
        |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
        |  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |cb AS (SELECT s.sub, i.code, s.s AS cv FROM sv s JOIN ids i USING (vec_id)),
        |dist AS (
        |  SELECT s.vec_id, s.cell, s.sub, b.code,
        |    round(list_inner_product(s.s, s.s)
        |      - 2.0 * list_inner_product(s.s, b.cv)
        |      + list_inner_product(b.cv, b.cv), 6) AS d
        |  FROM sv s JOIN cb b ON s.sub = b.sub),
        |best AS (
        |  SELECT vec_id, cell, sub, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
        |    FROM dist) WHERE rn = 1),
        |qcells AS (
        |  SELECT cid AS cell FROM (
        |    SELECT cid, row_number() OVER (ORDER BY sim DESC, cid) AS rn
        |    FROM sims WHERE vec_id = 0) WHERE rn <= 2),
        |qres AS (
        |  SELECT c.cid AS cell,
        |    list_transform(range(1, 65), i -> q.v[i] - c.cv[i]) AS qr
        |  FROM c JOIN qcells ON c.cid = qcells.cell
        |    CROSS JOIN (SELECT v FROM e WHERE vec_id = 0) q),
        |lut AS (
        |  SELECT r.cell, b.sub, b.code,
        |    list_inner_product(list_slice(r.qr, b.sub*16 + 1, b.sub*16 + 16),
        |      list_slice(r.qr, b.sub*16 + 1, b.sub*16 + 16))
        |    - 2.0 * list_inner_product(list_slice(r.qr, b.sub*16 + 1, b.sub*16 + 16), b.cv)
        |    + list_inner_product(b.cv, b.cv) AS ld
        |  FROM qres r CROSS JOIN cb b),
        |adc AS (
        |  SELECT bs.vec_id, round(sum(l.ld), 6) AS adc_dist
        |  FROM best bs JOIN lut l
        |    ON bs.cell = l.cell AND bs.sub = l.sub AND bs.code = l.code
        |  GROUP BY bs.vec_id)
        |SELECT vec_id, adc_dist FROM adc
        |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin,
    // end-to-end dedup: the x8 clusters joined back to the corpus — every
    // cluster keeps its minimum doc_id, the rest are anti-joined away
    "x9_dedup_corpus" -> ("WITH RECURSIVE " +
      MinhashOracleCtes.stripPrefix("WITH ") +
      """,
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        |  WHERE len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i])) / 16.0 >= 0.5
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM cand
        |  UNION SELECT doc_b, doc_a FROM cand
        |), reach(node, m) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.m
        |), clusters AS (
        |  SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node
        |)
        |SELECT d.doc_id, d.lang, CAST(length(d.text) AS BIGINT) AS text_len
        |FROM documents d
        |ANTI JOIN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id) x
        |  ON d.doc_id = x.doc_id
        |ORDER BY d.doc_id""").stripMargin,
    // BM25 with ratio idf (N-df+0.5)/(df+0.5): like d14, every score op is
    // a correctly-rounded IEEE primitive; per-term contributions round to
    // micro-unit BIGINTs so the sum is order-independent on both engines
    "x17_bm25_topk" -> (Bm25OracleCtes +
      """
        |SELECT doc_id, sum(cm)::DOUBLE / 1000000.0 AS bm25
        |FROM contrib GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 10""").stripMargin,
    // indexed BM25: same math served from the bucket-partitioned
    // postings index — the oracle is x17's full-scan restatement, so a
    // hash match proves the pruned probe ranks identically
    "x21_bm25_indexed" -> (Bm25OracleCtes +
      """
        |SELECT doc_id, sum(cm)::DOUBLE / 1000000.0 AS bm25
        |FROM contrib GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 10""").stripMargin,
    // incremental growth: base(80%) + appended(20%) must serve the FULL
    // corpus's BM25 — the oracle is x21's over all documents, unchanged
    "x31_bm25_append" -> (Bm25OracleCtes +
      """
        |SELECT doc_id, sum(cm)::DOUBLE / 1000000.0 AS bm25
        |FROM contrib GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 10""").stripMargin,
    // hybrid retrieval: BM25 top-50 + cosine top-50 (query doc/vec 0),
    // reciprocal-rank fusion with c=60 (Cormack et al. 2009). The rrf
    // score is rounded via the exact integer-rational mirror (R6) of
    // rrfFuse's ExactRound path: one-sided 1/(60+r), two-sided
    // (120+ra+rb)/((60+ra)(60+rb)) — the 1/(60+r) family CAN sit dead
    // on the 6-decimal halfway grid (rank 68 → 1/128; ResidueFreeSpec)
    "x18_hybrid_rrf" -> (Bm25OracleCtes +
      s""",
        |bm AS (
        |  SELECT doc_id, sum(cm)::DOUBLE / 1000000.0 AS bm25
        |  FROM contrib WHERE doc_id <> 0 GROUP BY doc_id
        |  ORDER BY bm25 DESC, doc_id LIMIT 50),
        |bmr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM bm),
        |cs AS (
        |  SELECT vec_id AS doc_id,
        |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cosine
        |  FROM embeddings WHERE vec_id <> 0 ORDER BY cosine DESC, doc_id LIMIT 50),
        |csr AS (SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS r FROM cs)
        |SELECT doc_id, ${R6("rn", "rd")} AS rrf FROM (
        |  SELECT COALESCE(bmr.doc_id, csr.doc_id) AS doc_id,
        |    CASE WHEN bmr.r IS NOT NULL AND csr.r IS NOT NULL
        |         THEN 120 + bmr.r + csr.r ELSE 1 END AS rn,
        |    CASE WHEN bmr.r IS NOT NULL AND csr.r IS NOT NULL
        |         THEN (60 + bmr.r) * (60 + csr.r)
        |         ELSE 60 + COALESCE(bmr.r, csr.r) END AS rd
        |  FROM bmr FULL OUTER JOIN csr ON bmr.doc_id = csr.doc_id) t
        |ORDER BY rrf DESC, doc_id LIMIT 20""").stripMargin,
    // contrastive hard negatives: anchors 0-3 broadcast against the
    // different-label corpus, per-anchor top-5 by rounded cosine
    "x19_hard_negatives" ->
      """WITH anch AS (
        |  SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS qv, label AS albl
        |  FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
        |scored AS (
        |  SELECT a.anchor_id, e.vec_id AS neg_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), a.qv), 6) AS cosine
        |  FROM embeddings e JOIN anch a ON e.label <> a.albl)
        |SELECT anchor_id, CAST(rank AS BIGINT) AS rank, neg_id, cosine FROM (
        |  SELECT anchor_id, neg_id, cosine,
        |    row_number() OVER (PARTITION BY anchor_id ORDER BY cosine DESC, neg_id) AS rank
        |  FROM scored) t WHERE rank <= 5 ORDER BY anchor_id, rank""".stripMargin,
    // IVF batch serving: per-query probe cells over the x7 deterministic
    // centroids, self included (the batch API's self-first contract)
    "x29_ivf_batch" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |sims AS (
        |  SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.cv) AS sim
        |  FROM e CROSS JOIN c
        |), cells AS (
        |  SELECT vec_id, v, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |    FROM sims)
        |  WHERE rn = 1
        |), q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
        |qc AS (
        |  SELECT qid, cid AS cell FROM (
        |    SELECT q.qid, s.cid, row_number() OVER (PARTITION BY q.qid ORDER BY s.sim DESC, s.cid) AS rn
        |    FROM sims s JOIN q ON s.vec_id = q.qid) t
        |  WHERE rn <= 2),
        |scored AS (
        |  SELECT qc.qid, cells.vec_id,
        |    round(list_cosine_similarity(cells.v, q.qv), 6) AS cosine
        |  FROM cells JOIN qc ON cells.cell = qc.cell JOIN q ON q.qid = qc.qid)
        |SELECT qid AS query_id, CAST(rank AS BIGINT) AS rank, vec_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
        |  FROM scored) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // the TRAINED IVF-PQ operating point, fully replayed (see
    // trainedRecallOracle doc — portable round-6 training on both sides)
    "x34_trained_recall" -> trainedRecallOracle,
    "x36_sample_trained" -> sampleTrainedOracle,
    // BUCKETED admission oracled end-to-end: both bands' bucket ids
    // recompute from the same baked hyperplane sign literals (the x5
    // machinery; band b uses planes [8b, 8b+8)), a pair is a candidate
    // when it co-buckets in EITHER band, and only candidates can
    // reject — the replay must reproduce every wide-angle MISS too
    "x35_bucketed_admit" -> {
      def bucket(band: Int): String = (0 until 8).map(p =>
        s"(CASE WHEN list_inner_product(v, " +
          s"${operators.SimilarityQueries.planeSignsSql(band * 8 + p)}) " +
          s"> 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v, label,
         |  ${bucket(0)} AS b0, ${bucket(1)} AS b1 FROM embeddings),
         |inc AS (SELECT * FROM base WHERE vec_id % 5 = 0),
         |ex AS (SELECT * FROM base WHERE vec_id % 5 <> 0),
         |hits AS (
         |  SELECT DISTINCT inc.vec_id FROM inc JOIN ex
         |  ON (inc.b0 = ex.b0 OR inc.b1 = ex.b1)
         |  AND (CASE WHEN isnan(list_cosine_similarity(inc.v, ex.v)) THEN -2
         |      ELSE round(list_cosine_similarity(inc.v, ex.v), 6) END) >= 0.4)
         |SELECT vec_id, label FROM inc
         |WHERE vec_id NOT IN (SELECT vec_id FROM hits) ORDER BY vec_id""".stripMargin
    },
    // ANN quality: the x7 IVF probe's top-10 evaluated against the exact
    // cosine top-10 as ground truth with the x22 metric arithmetic,
    // swept over nprobe 1 and 2 (per-nprobe suffixed CTE chains)
    "x25_ann_recall" ->
      ("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |sims AS (
        |  SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.cv) AS sim
        |  FROM e CROSS JOIN c
        |), cells AS (
        |  SELECT vec_id, v, cid AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |    FROM sims)
        |  WHERE rn = 1
        |), q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |exact AS (
        |  SELECT vec_id AS id FROM (
        |    SELECT vec_id, round(list_cosine_similarity(v, q.qv), 6) AS cosine
        |    FROM e CROSS JOIN q WHERE vec_id <> 0
        |    ORDER BY cosine DESC, vec_id LIMIT 10) t),""".stripMargin +
        Seq(1, 2).map(annRecallCtes).mkString(",") + "," +
        PqSweepPrefix + "," +
        Seq(1, 2).map(pqSweepCtes).mkString(",") + """
        |SELECT 'ivf' AS path, 1::BIGINT AS nprobe, n_rel, hits, recall, mrr, ndcg FROM met_1
        |UNION ALL
        |SELECT 'ivf', 2::BIGINT, n_rel, hits, recall, mrr, ndcg FROM met_2
        |UNION ALL
        |SELECT 'ivfpq', 1::BIGINT, n_rel, hits, recall, mrr, ndcg FROM pmet_1
        |UNION ALL
        |SELECT 'ivfpq', 2::BIGINT, n_rel, hits, recall, mrr, ndcg FROM pmet_2
        |ORDER BY path, nprobe""".stripMargin),
    // generate-then-rerank: BM25 top-20 candidates re-scored by the
    // batched stub pair model (portable md5 score — the oracle replays
    // it, hash-verifying the candidate→batch→score plumbing)
    "x24_model_rerank" -> (Bm25OracleCtes +
      """,
        |cand AS (
        |  SELECT doc_id, sum(cm)::DOUBLE / 1000000.0 AS bm25
        |  FROM contrib GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20)
        |SELECT doc_id, model_score FROM (
        |  SELECT d.doc_id,
        |    round((('0x' || substr(md5('vector hash join' || d.text), 1, 7))::BIGINT % 1000000) / 1000000.0, 6) AS model_score
        |  FROM documents d JOIN cand USING (doc_id)) t
        |ORDER BY model_score DESC, doc_id LIMIT 10""").stripMargin,
    // phrase search: the oracle states the consecutive-word semantics
    // directly over the text; the engine answers from the positional
    // index's offset-array fold — a hash match proves them equivalent
    "x23_phrase_match" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ws
        |  FROM documents)
        |SELECT doc_id, n_occurrences FROM (
        |  SELECT doc_id, CAST(len(list_filter(range(1, len(ws)),
        |    i -> ws[i] = 'table' AND ws[i + 1] = 'hash')) AS BIGINT) AS n_occurrences
        |  FROM d) t
        |WHERE n_occurrences > 0
        |ORDER BY n_occurrences DESC, doc_id LIMIT 10""".stripMargin,
    // batch serving: three query term-bags from one index, per-query
    // top-5; suffixed per-query CTE chains share the dl/stats prefix
    "x27_bm25_batch" -> (Bm25OracleCtes +
      graft.operators.RetrievalOps.GateBatchQueries
        .map { case (qid, terms) => bm25TermCtes(terms, s"_q$qid") }
        .mkString("") +
      graft.operators.RetrievalOps.GateBatchQueries.map { case (qid, _) =>
        s"""
           |SELECT $qid::BIGINT AS query_id, rank, doc_id, bm25 FROM (
           |  SELECT doc_id, bm25, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
           |  FROM (SELECT doc_id, sum(cm)::DOUBLE / 1000000.0 AS bm25
           |        FROM contrib_q$qid GROUP BY doc_id) s$qid) r$qid
           |WHERE rank <= 5""".stripMargin
      }.mkString("\nUNION ALL") + "\nORDER BY query_id, rank"),
    // embedding batch serving: 3-query cosine top-5, self included
    // (the API's self-first contract), the x1 rounded-ranking convention
    "x28_cosine_batch" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id IN (0, 1, 2)),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
        |  FROM embeddings e CROSS JOIN q)
        |SELECT qid AS query_id, CAST(rank AS BIGINT) AS rank, vec_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
        |  FROM scored) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // ordered proximity (slop 1): the oracle counts distinct end
    // positions j of the second word with the first word ≤ 2 back
    "x26_proximity_match" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ws
        |  FROM documents)
        |SELECT doc_id, n_occurrences FROM (
        |  SELECT doc_id, CAST(len(list_filter(range(1, len(ws) + 1),
        |    j -> ws[j] = 'hash' AND len(list_filter(range(greatest(1, j - 2), j),
        |      i -> ws[i] = 'table')) > 0)) AS BIGINT) AS n_occurrences
        |  FROM d) t
        |WHERE n_occurrences > 0
        |ORDER BY n_occurrences DESC, doc_id LIMIT 10""".stripMargin,
    // average precision at 10 over the x22 ranking: running-relevant
    // window per query, micro-unit precision terms
    "x30_map_eval" ->
      """WITH anch AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS albl
        |  FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
        |ranked AS (
        |  SELECT qid, id, rank FROM (
        |    SELECT a.qid, e.vec_id AS id,
        |      row_number() OVER (PARTITION BY a.qid ORDER BY
        |        round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), a.qv), 6) DESC,
        |        e.vec_id) AS rank
        |    FROM embeddings e JOIN anch a ON e.vec_id <> a.qid) t
        |  WHERE rank <= 10),
        |qrels AS (
        |  SELECT a.qid, e.vec_id AS id
        |  FROM embeddings e JOIN anch a ON e.label = a.albl AND e.vec_id <> a.qid),
        |nrel AS (SELECT qid, count(*)::BIGINT AS n_rel FROM qrels GROUP BY qid),
        |flags AS (
        |  SELECT r.qid, r.rank, (q.id IS NOT NULL) AS rel
        |  FROM ranked r LEFT JOIN qrels q ON r.qid = q.qid AND r.id = q.id),
        |cum AS (
        |  SELECT qid, rank, rel,
        |    sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (PARTITION BY qid ORDER BY rank) AS cr
        |  FROM flags),
        |apm AS (
        |  SELECT qid, sum(CASE WHEN rel THEN
        |    CAST(round(1000000.0 * cr::DOUBLE / rank::DOUBLE) AS BIGINT) ELSE 0 END) AS am
        |  FROM cum GROUP BY qid)
        |SELECT a.qid AS query_id, n.n_rel,
        |  CAST((a.am::HUGEINT * 2000000 + least(n.n_rel, 10)::HUGEINT * 1000000)
        |    // (least(n.n_rel, 10)::HUGEINT * 2000000) AS DOUBLE) / 1000000.0 AS ap
        |FROM apm a JOIN nrel n ON a.qid = n.qid
        |ORDER BY query_id""".stripMargin,
    // retrieval evaluation: recall/MRR/nDCG of per-anchor cosine top-10
    // vs same-label relevance; DCG terms round to micro-unit BIGINTs
    // before summing and the ideal DCG unrolls from least(n_rel, k)
    "x22_retrieval_eval" ->
      """WITH anch AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS albl
        |  FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
        |ranked AS (
        |  SELECT qid, id, rank FROM (
        |    SELECT a.qid, e.vec_id AS id,
        |      row_number() OVER (PARTITION BY a.qid ORDER BY
        |        round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), a.qv), 6) DESC,
        |        e.vec_id) AS rank
        |    FROM embeddings e JOIN anch a ON e.vec_id <> a.qid) t
        |  WHERE rank <= 10),
        |qrels AS (
        |  SELECT a.qid, e.vec_id AS id
        |  FROM embeddings e JOIN anch a ON e.label = a.albl AND e.vec_id <> a.qid),
        |nrel AS (SELECT qid, count(*)::BIGINT AS n_rel FROM qrels GROUP BY qid),
        |flags AS (
        |  SELECT r.qid, r.rank, (q.id IS NOT NULL) AS rel
        |  FROM ranked r LEFT JOIN qrels q ON r.qid = q.qid AND r.id = q.id),
        |m AS (
        |  SELECT qid,
        |    sum(CASE WHEN rel THEN 1 ELSE 0 END)::BIGINT AS hits,
        |    min(CASE WHEN rel THEN rank END) AS minr,
        |    sum(CASE WHEN rel THEN CAST(round(1000000.0 / log2(rank::DOUBLE + 1.0)) AS BIGINT) ELSE 0 END) AS dcg_m
        |  FROM flags GROUP BY qid)
        |SELECT m.qid AS query_id, n.n_rel, m.hits,
        |  CAST((m.hits::HUGEINT * 2000000 + n.n_rel) // (n.n_rel::HUGEINT * 2) AS DOUBLE) / 1000000.0 AS recall,
        |  CASE WHEN m.minr IS NULL THEN 0.0
        |    ELSE CAST((2000000 + m.minr::HUGEINT) // (m.minr::HUGEINT * 2) AS DOUBLE) / 1000000.0 END AS mrr,
        |  CAST((m.dcg_m::HUGEINT * 2000000 + list_sum(list_transform(range(1, least(n.n_rel, 10) + 1),
        |      r -> CAST(round(1000000.0 / log2(r::DOUBLE + 1.0)) AS BIGINT)))::HUGEINT)
        |    // (list_sum(list_transform(range(1, least(n.n_rel, 10) + 1),
        |      r -> CAST(round(1000000.0 / log2(r::DOUBLE + 1.0)) AS BIGINT)))::HUGEINT * 2) AS DOUBLE) / 1000000.0 AS ndcg
        |FROM m JOIN nrel n ON m.qid = n.qid
        |ORDER BY query_id""".stripMargin,
    // greedy MMR (λ=0.5) over the top-20 cosine candidates, replayed as a
    // recursive CTE: each step's arg-max over (rounded) mmr, ties on id —
    // the same rounded-similarity convention as the engine's driver loop.
    // The combined score rounds at SEVEN decimals (similarities at six):
    // half of a round-6 difference has exactly seven decimals, so a
    // six-decimal round would sit ON the halfway grid where the two
    // engines' last-ulp doubles legitimately split (RetrievalOps
    // .mmrRerank r7 doc); at seven the λ=0.5 grid is exact
    "x20_mmr_rerank" ->
      """WITH RECURSIVE cand AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS simq
        |  FROM embeddings WHERE vec_id <> 0
        |  ORDER BY simq DESC, vec_id LIMIT 20),
        |pairs AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib,
        |    round(list_cosine_similarity(a.v, b.v), 6) AS sim
        |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
        |sel(step, picked, score, sel_ids) AS (
        |  SELECT 1, f.vec_id, round(0.5 * f.simq, 7), [f.vec_id]
        |  FROM (SELECT vec_id, simq FROM cand
        |        ORDER BY round(0.5 * simq, 7) DESC, vec_id LIMIT 1) f
        |  UNION ALL
        |  SELECT s.step + 1, nxt.vec_id, nxt.mmr, list_append(s.sel_ids, nxt.vec_id)
        |  FROM sel s, LATERAL (
        |    SELECT c.vec_id,
        |      round(0.5 * c.simq - 0.5 * (
        |        SELECT max(p.sim) FROM pairs p
        |        WHERE p.ia = c.vec_id AND list_contains(s.sel_ids, p.ib)), 7) AS mmr
        |    FROM cand c WHERE NOT list_contains(s.sel_ids, c.vec_id)
        |    ORDER BY mmr DESC, c.vec_id LIMIT 1) nxt
        |  WHERE s.step < 8)
        |SELECT CAST(step AS BIGINT) AS step, picked AS vec_id, score AS mmr
        |FROM sel ORDER BY step""".stripMargin,
    // iterated BPE trainer: 3 unrolled rounds, each = arg-max pair then
    // greedy left-to-right non-overlapping merge. The engine merges with
    // a map-side pending-fold; the oracle replays the SAME greedy
    // semantics relationally (run-parity windows pick every other
    // candidate inside an aaa-run) — DuckDB 1.0 segfaults on chained
    // correlated list_reduce, so lambdas are off-limits here
    "d32_bpe_train" -> ("WITH ws0 AS (\n" +
      "  SELECT doc_id, list_filter(string_split_regex(lower(text), " +
      "'\\s+'), x -> len(x) > 0) AS ws\n  FROM documents)," +
      (1 to 3).map(bpeRoundCtes).mkString(",") + """
        |SELECT 1::BIGINT AS round, wa, wb, n FROM b1
        |UNION ALL SELECT 2::BIGINT, wa, wb, n FROM b2
        |UNION ALL SELECT 3::BIGINT, wa, wb, n FROM b3
        |ORDER BY round""".stripMargin),
    // deep trainer (12 rounds — crosses the engine's parquet-cut
    // materialization at round 8): same unrolled round CTEs, so a hash
    // match proves the bounded-lineage trainer changes nothing
    "d35_bpe_deep" -> ("WITH ws0 AS (\n" +
      "  SELECT doc_id, list_filter(string_split_regex(lower(text), " +
      "'\\s+'), x -> len(x) > 0) AS ws\n  FROM documents)," +
      (1 to 12).map(bpeRoundCtes).mkString(",") + "\n" +
      (1 to 12).map(r =>
        if (r == 1) "SELECT 1::BIGINT AS round, wa, wb, n FROM b1"
        else s"UNION ALL SELECT $r::BIGINT, wa, wb, n FROM b$r")
        .mkString("\n") +
      "\nORDER BY round"),
    // WordPiece tokenizer: vocab = top-200 char n-grams (n<=4) + all
    // single chars; encode = greedy longest-prefix match per DISTINCT
    // word (recursive CTE with a LATERAL max-length probe), weighted by
    // word occurrence count
    "d36_wordpiece" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |  FROM documents),
        |grams AS (
        |  SELECT substr(w, i, n) AS g
        |  FROM toks, unnest(range(1, len(w) + 1)) r(i), unnest(range(1, 5)) s(n)
        |  WHERE i + n - 1 <= len(w)),
        |topg AS (
        |  SELECT g AS piece FROM (
        |    SELECT g, count(*) AS c FROM grams GROUP BY g
        |    ORDER BY c DESC, g LIMIT 200) t),
        |chars AS (SELECT DISTINCT substr(w, i, 1) AS piece FROM toks, unnest(range(1, len(w) + 1)) r(i)),
        |vocab AS (SELECT DISTINCT piece FROM (SELECT piece FROM topg UNION ALL SELECT piece FROM chars)),
        |words AS (SELECT w, count(*) AS wn FROM toks GROUP BY w),
        |seg AS (
        |  WITH RECURSIVE s(w, wn, pos, piece) AS (
        |    SELECT w, wn, 0, CAST(NULL AS VARCHAR) FROM words
        |    UNION ALL
        |    SELECT s.w, s.wn, s.pos + m.l, substr(s.w, s.pos + 1, m.l)
        |    FROM s, LATERAL (
        |      SELECT max(len(v.piece)) AS l FROM vocab v
        |      WHERE v.piece = substr(s.w, s.pos + 1, len(v.piece))) m
        |    WHERE s.pos < len(s.w) AND m.l IS NOT NULL)
        |  SELECT * FROM s WHERE piece IS NOT NULL)
        |SELECT piece, CAST(sum(wn) AS BIGINT) AS n FROM seg GROUP BY piece
        |ORDER BY n DESC, piece LIMIT 30""".stripMargin,
    // optimal Viterbi segmentation: unrolled layered DP (best cost to
    // consume k chars, k = 1..12), cost = n_pieces*2^40 - freq_sum so a
    // single integer min is the lexicographic (fewest pieces, max freq)
    // objective; layers MATERIALIZED (each is referenced by the next 4)
    "d37_viterbi_segment" -> (
      """WITH toks AS MATERIALIZED (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |  FROM documents),
        |grams AS (
        |  SELECT substr(w, i, n) AS g
        |  FROM toks, unnest(range(1, len(w) + 1)) r(i), unnest(range(1, 5)) s(n)
        |  WHERE i + n - 1 <= len(w)),
        |gcounts AS MATERIALIZED (SELECT g, count(*) AS f FROM grams GROUP BY g),
        |topg AS (
        |  SELECT g AS piece FROM (
        |    SELECT g, f FROM gcounts ORDER BY f DESC, g LIMIT 200) t),
        |chars AS (SELECT DISTINCT g AS piece FROM gcounts WHERE len(g) = 1),
        |vocabf AS MATERIALIZED (
        |  SELECT v.piece, gc.f FROM (SELECT DISTINCT piece FROM (SELECT piece FROM topg UNION ALL SELECT piece FROM chars)) v
        |  JOIN gcounts gc ON gc.g = v.piece),
        |words AS (SELECT w, count(*) AS wn FROM toks GROUP BY w),
        |sel AS MATERIALIZED (SELECT w FROM words WHERE len(w) <= 12 ORDER BY wn DESC, w LIMIT 30),
        |b0 AS MATERIALIZED (SELECT w, 0::BIGINT AS c FROM sel),""".stripMargin +
        (1 to 12).map(viterbiLayerCte).mkString(",") + ",\n" +
        "fin AS (" + (1 to 12).map(k =>
          s"SELECT w, c FROM b$k WHERE len(w) = $k").mkString(" UNION ALL ") +
        "),\n" +
        // the packed objective c = n_pieces*2^40 - freq_sum orders
        // correctly only while every candidate freq_sum < 2^40; the
        // tightest cheap bound is max piece freq × max word length
        // (12) — guard it so a corpus big enough to break the packing
        // fails LOUDLY instead of silently mis-ranking segmentations
        """guard AS (
          |  SELECT CASE WHEN max(f) * 12 >= 1099511627776
          |    THEN error('d37 oracle: freq_sum may reach 2^40 — packing invalid at this scale')
          |    ELSE 0 END AS ok FROM vocabf)
          |SELECT w, CAST((c + 1099511627776 - 1) // 1099511627776 AS BIGINT) AS n_pieces,
          |  CAST(((c + 1099511627776 - 1) // 1099511627776) * 1099511627776 - c AS BIGINT) AS freq_sum
          |FROM fin, guard ORDER BY w""".stripMargin),
    // model-input token ids: greedy WordPiece against the d36 vocab in
    // (count desc, piece asc) ID order; per-doc id-stream digest
    "d38_token_ids" -> (tokenIdCtes +
      """
        |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_tokens,
        |  md5(coalesce(array_to_string(ids, ','), '')) AS ids_md5,
        |  CAST(ids[1] AS BIGINT) AS first_id,
        |  CAST(ids[len(ids)] AS BIGINT) AS last_id
        |FROM alldocs ORDER BY doc_id""".stripMargin),
    // d41 encodes through the persisted tokenizer artifact (save → load
    // → encode); the oracle is EXACTLY d38's — the artifact round-trip
    // must be invisible in the output
    "d41_artifact_encode" -> (tokenIdCtes +
      """
        |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_tokens,
        |  md5(coalesce(array_to_string(ids, ','), '')) AS ids_md5,
        |  CAST(ids[1] AS BIGINT) AS first_id,
        |  CAST(ids[len(ids)] AS BIGINT) AS last_id
        |FROM alldocs ORDER BY doc_id""".stripMargin),
    // fixed-length LM packing: per-lang stream (doc_id order, one EOS =
    // |vocab| after each doc) cut into exact 256-id rows. The oracle
    // builds each shard's whole stream as one list (single-node
    // privilege); the engine's slice-explode + (shard, seq) shuffle
    // must produce identical rows
    "d39_pack_ids" -> (tokenIdCtes +
      """,
        |dl AS (SELECT doc_id, lang,
        |    list_append(ids, (SELECT CAST(count(*) AS INTEGER) FROM vid)) AS ids
        |  FROM alldocs),
        |stream AS (SELECT lang, flatten(list(ids ORDER BY doc_id)) AS st
        |  FROM dl GROUP BY lang),
        |chunks AS (SELECT lang, CAST(s // 256 AS BIGINT) AS seq_idx,
        |    list_slice(st, s + 1, least(s + 256, len(st))) AS ids
        |  FROM stream, unnest(range(0, len(st), 256)) r(s))
        |SELECT lang, seq_idx, CAST(len(ids) AS BIGINT) AS n_ids,
        |  md5(array_to_string(ids, ',')) AS ids_md5
        |FROM chunks ORDER BY lang, seq_idx""".stripMargin),
    // the serving round-trip: n_tokens from the segmentation replay,
    // decoded content INDEPENDENTLY as lower(text) minus whitespace —
    // a hash match proves the engine's encode-then-decode is lossless
    "d40_decode_roundtrip" -> (tokenIdCtes +
      """
        |SELECT a.doc_id, CAST(len(a.ids) AS BIGINT) AS n_tokens,
        |  md5(regexp_replace(lower(coalesce(d.text, '')), '\s+', '', 'g')) AS decoded_md5
        |FROM alldocs a JOIN documents d ON d.doc_id = a.doc_id
        |ORDER BY a.doc_id""".stripMargin),
    // character-level BPE: per-word-occurrence symbol rows (chars +
    // </w>), keyed (doc_id, wi) so merges never cross word boundaries
    "d33_bpe_chars" -> ("WITH d AS (\n" +
      "  SELECT doc_id, list_filter(string_split_regex(lower(text), " +
      "'\\s+'), x -> len(x) > 0) AS wl\n  FROM documents),\n" +
      """ws0 AS (
        |  SELECT doc_id, i AS wi,
        |    list_append(list_transform(range(1, len(wl[i]) + 1), j -> wl[i][j]), '</w>') AS ws
        |  FROM d, unnest(range(1, len(wl) + 1)) r(i)),""".stripMargin +
      (1 to 3).map(bpeRoundCtesKeyed(_, Seq("doc_id", "wi"))).mkString(",") +
      """
        |SELECT 1::BIGINT AS round, wa, wb, n FROM b1
        |UNION ALL SELECT 2::BIGINT, wa, wb, n FROM b2
        |UNION ALL SELECT 3::BIGINT, wa, wb, n FROM b3
        |ORDER BY round""".stripMargin),
    // the trained vocabulary: symbol frequencies after d33's 3 merges
    // (the oracle extends the d33 chain one more step: unnest ws3)
    "d34_bpe_vocab" -> ("WITH d AS (\n" +
      "  SELECT doc_id, list_filter(string_split_regex(lower(text), " +
      "'\\s+'), x -> len(x) > 0) AS wl\n  FROM documents),\n" +
      """ws0 AS (
        |  SELECT doc_id, i AS wi,
        |    list_append(list_transform(range(1, len(wl[i]) + 1), j -> wl[i][j]), '</w>') AS ws
        |  FROM d, unnest(range(1, len(wl) + 1)) r(i)),""".stripMargin +
      (1 to 3).map(bpeRoundCtesKeyed(_, Seq("doc_id", "wi"))).mkString(",") +
      """
        |SELECT symbol, count(*)::BIGINT AS n
        |FROM (SELECT unnest(ws) AS symbol FROM ws3) t
        |GROUP BY symbol ORDER BY n DESC, symbol LIMIT 20""".stripMargin),
    // adjacent-word pair counts (one BPE merge round's statistic)
    "d31_bpe_pairs" ->
      """WITH d AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ws
        |  FROM documents),
        |p AS (
        |  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS pair
        |  FROM d)
        |SELECT pair, count(*) AS n FROM p GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 20""".stripMargin,
  )

  /** The x34 oracle: a FULL DuckDB replay of the TRAINED IVF-PQ
    * pipeline — L2-normalize, 3 portable Lloyd's iterations over 8
    * coarse cells, residuals, 3 portable PQ iterations over 32
    * subspaces × 64 codes, encode, and the ADC probe for vec 0 at
    * nprobe ∈ {2, 8}. Replayable because every iterated decision in
    * the engine's portable mode quantizes to 6 decimals with pinned
    * tie-breaks (IvfAnn.trainCentroids doc): both engines' raw
    * arithmetic agrees to ~1e-15, so every round-6 decision — and
    * therefore the whole training trajectory — is identical. The
    * iteration CTEs are MATERIALIZED: each level references the
    * previous twice (assignment + carry-forward), and DuckDB's default
    * inlining would re-evaluate the chain exponentially. */
  private def trainedRecallOracle: String = trainedPipelineOracle(None)

  /** The x36 oracle: the same full replay with the trainer input
    * SAMPLED by the engine's hash rule ([[graft.operators.IvfPq
    * .trainSampleRate]], cap = 128): Lloyd's and PQ iterations read
    * only `tnorm`/`tsv`, while the final assignment, residuals and
    * encode still read everything — exactly [[graft.operators
    * .RetrievalOps.x36SampleTrained]]'s split. */
  private def sampleTrainedOracle: String = trainedPipelineOracle(Some(
    "('0x' || substr(md5(vec_id::VARCHAR), 1, 7))::BIGINT % 1000000 " +
      // GREATEST mirrors the engine's max(1, rate) clamp
      // (IvfPq.trainSampleRate): without it the mirror's rate hits 0
      // past n = 10^6·cap and the oracle's sample degenerates to empty
      // while the engine trains on a rate-1 sample
      "< GREATEST(1, (1000000 * 128) // (SELECT count(*) FROM embeddings))"))

  private def trainedPipelineOracle(samplePred: Option[String]): String = {
    val (m, k, cells, w) = (32, 64, 8, 2)
    // relations the ITERATED trainers read: the full corpus, or the
    // hash-rate sample when `samplePred` is set (tnorm/tres/tsv CTEs)
    val (trainNorm, trainRes, trainSv) =
      if (samplePred.isDefined) ("tnorm", "tres", "tsv")
      else ("norm", "res", "sv")
    def cAssign(n: Int, cents: String, rel: String = "norm"): String =
      s"""a$n AS MATERIALIZED (
         |  SELECT vec_id, v, cid AS cell FROM (
         |    SELECT nm.vec_id, nm.v, c.cid,
         |      row_number() OVER (PARTITION BY nm.vec_id
         |        ORDER BY round(list_cosine_similarity(nm.v, c.cv), 6) DESC, c.cid ASC) AS rn
         |    FROM $rel nm CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    // portable mean = EXACT integer micro-mean (MicroMeanAgg doc): each
    // element pico-quantizes through the deterministic IEEE sequence
    // floor(x*1e12 + 0.5), sums run in HUGEINT (order-independent), and
    // the division to the micro grid rounds half-away-from-zero in
    // exact integer arithmetic — identical to the engine kernel even ON
    // the 2^a·5^b halfway residues
    val microMu =
      """CAST(CASE WHEN s >= 0 THEN (2*s + n*1000000) // (2*n*1000000)
        |          ELSE -((2*(-s) + n*1000000) // (2*n*1000000)) END
        |     AS DOUBLE) / 1000000.0""".stripMargin
    def cUpdate(n: Int, prev: String): String =
      s"""c$n AS MATERIALIZED (
         |  SELECT p.cid, coalesce(u.nv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN (
         |    SELECT cell, list(mu ORDER BY dim) AS nv FROM (
         |      SELECT cell, dim, $microMu AS mu FROM (
         |        SELECT cell, dim, SUM(CAST(floor(x * 1e12 + 0.5) AS HUGEINT)) AS s,
         |          COUNT(*)::HUGEINT AS n FROM (
         |          SELECT cell, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM a$n)
         |        GROUP BY cell, dim)) GROUP BY cell) u ON p.cid = u.cell)""".stripMargin
    def pqAssign(n: Int, cb: String, rel: String = "sv"): String =
      s"""pa$n AS MATERIALIZED (
         |  SELECT vec_id, sub, sv, code FROM (
         |    SELECT s.vec_id, s.sub, s.sv, c.code,
         |      row_number() OVER (PARTITION BY s.vec_id, s.sub
         |        ORDER BY round(list_inner_product(s.sv, s.sv)
         |          - 2.0 * list_inner_product(s.sv, c.cv)
         |          + list_inner_product(c.cv, c.cv), 6) ASC, c.code ASC) AS rn
         |    FROM $rel s JOIN $cb c ON s.sub = c.sub) WHERE rn = 1)""".stripMargin
    def pqUpdate(n: Int, prev: String): String =
      s"""cb$n AS MATERIALIZED (
         |  SELECT p.sub, p.code, coalesce(u.nv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN (
         |    SELECT sub, code, list(mu ORDER BY dim) AS nv FROM (
         |      SELECT sub, code, dim, $microMu AS mu FROM (
         |        SELECT sub, code, dim, SUM(CAST(floor(x * 1e12 + 0.5) AS HUGEINT)) AS s,
         |          COUNT(*)::HUGEINT AS n FROM (
         |          SELECT sub, code, unnest(sv) AS x, generate_subscripts(sv, 1) AS dim FROM pa$n)
         |        GROUP BY sub, code, dim)) GROUP BY sub, code) u
         |  ON p.sub = u.sub AND p.code = u.code)""".stripMargin
    // per-nprobe: probe-cell ranking (round-6, cid tie), per-cell
    // residual LUT, ADC = sub-ordered left-to-right fold (list_reduce
    // over list(d ORDER BY sub) — NOT a float sum() agg), round 6
    def probe(np: Int): String =
      s"""qcells_$np AS (
         |  SELECT cid, cv FROM (
         |    SELECT c.cid, c.cv,
         |      row_number() OVER (ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.cid ASC) AS rn
         |    FROM c3 c CROSS JOIN qv q) WHERE rn <= $np),
         |lut_$np AS MATERIALIZED (
         |  SELECT qc.cid AS cell, cb.sub, cb.code,
         |    list_inner_product(
         |      list_transform(range(1, ${w + 1}), j -> (q.qv[cb.sub*$w + j] - qc.cv[cb.sub*$w + j]) - cb.cv[j]),
         |      list_transform(range(1, ${w + 1}), j -> (q.qv[cb.sub*$w + j] - qc.cv[cb.sub*$w + j]) - cb.cv[j])) AS d
         |  FROM qcells_$np qc CROSS JOIN cb3 cb CROSS JOIN qv q),
         |adc_$np AS (
         |  SELECT t.vec_id, round(list_reduce(t.l, (a, b) -> a + b), 6) AS adc_dist FROM (
         |    SELECT pa4.vec_id, list(lut.d ORDER BY pa4.sub) AS l
         |    FROM pa4
         |    JOIN cells cl ON pa4.vec_id = cl.vec_id
         |    JOIN lut_$np lut ON lut.cell = cl.cell AND lut.sub = pa4.sub AND lut.code = pa4.code
         |    GROUP BY pa4.vec_id) t),
         |top_$np AS (
         |  SELECT $np::BIGINT AS nprobe,
         |    row_number() OVER (ORDER BY adc_dist ASC, vec_id ASC)::BIGINT AS rank,
         |    vec_id, adc_dist, vec_id IN (SELECT vec_id FROM exact) AS hit
         |  FROM adc_$np WHERE vec_id <> 0
         |  ORDER BY adc_dist ASC, vec_id ASC LIMIT 10)""".stripMargin
    val ctes = Seq(
      """norm AS MATERIALIZED (
        |  SELECT vec_id, list_transform(embedding::DOUBLE[],
        |    x -> x / sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS v
        |  FROM embeddings)""".stripMargin) ++
      samplePred.map(p =>
        s"tnorm AS MATERIALIZED (SELECT * FROM norm WHERE $p)").toSeq ++
      Seq(
      s"c0 AS MATERIALIZED (SELECT vec_id AS cid, v AS cv FROM $trainNorm ORDER BY vec_id LIMIT $cells)") ++
      (1 to 3).flatMap(i =>
        Seq(cAssign(i, if (i == 1) "c0" else s"c${i - 1}", trainNorm),
          cUpdate(i, if (i == 1) "c0" else s"c${i - 1}"))) ++
      Seq(cAssign(4, "c3"),
        "cells AS MATERIALIZED (SELECT vec_id, cell FROM a4)",
        s"""res AS MATERIALIZED (
           |  SELECT a4.vec_id, a4.cell,
           |    list_transform(range(1, ${m * w + 1}), i -> a4.v[i] - c.cv[i]) AS r
           |  FROM a4 JOIN c3 c ON a4.cell = c.cid)""".stripMargin,
        s"""sv AS MATERIALIZED (
           |  SELECT vec_id, sub, r[sub*$w+1 : sub*$w+$w] AS sv
           |  FROM res CROSS JOIN (SELECT unnest(range($m)) AS sub))""".stripMargin) ++
      samplePred.map(p => Seq(
        s"tres AS MATERIALIZED (SELECT * FROM res WHERE $p)",
        s"tsv AS MATERIALIZED (SELECT * FROM sv WHERE $p)"))
        .getOrElse(Nil) ++
      Seq(
        s"""cb0 AS MATERIALIZED (
           |  SELECT sub, code, sv AS cv FROM (
           |    SELECT s.sub, s.sv, dense_rank() OVER (ORDER BY s.vec_id) - 1 AS code
           |    FROM $trainSv s WHERE s.vec_id IN (SELECT vec_id FROM $trainRes ORDER BY vec_id LIMIT $k)))""".stripMargin) ++
      (1 to 3).flatMap(i =>
        Seq(pqAssign(i, if (i == 1) "cb0" else s"cb${i - 1}", trainSv),
          pqUpdate(i, if (i == 1) "cb0" else s"cb${i - 1}"))) ++
      Seq(pqAssign(4, "cb3"),
        "qv AS (SELECT v AS qv FROM norm WHERE vec_id = 0)",
        """exact AS MATERIALIZED (
          |  SELECT vec_id FROM (
          |    SELECT nm.vec_id, round(list_cosine_similarity(nm.v, q.qv), 6) AS c
          |    FROM norm nm CROSS JOIN qv q WHERE nm.vec_id <> 0
          |    ORDER BY c DESC, vec_id ASC LIMIT 10))""".stripMargin,
        probe(2), probe(8))
    "WITH " + ctes.mkString(",\n") +
      "\nSELECT * FROM top_2 UNION ALL SELECT * FROM top_8 ORDER BY nprobe, rank"
  }

  /** nprobe-independent CTE prefix of the x25 IVF-PQ sweep: the x15
    * oracle's encode chain (4 cells, residual PQ, first-16 codebook)
    * with `p`-prefixed names so it coexists with the raw-IVF CTEs. */
  private val PqSweepPrefix: String =
    """
      |pc AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
      |psims AS (
      |  SELECT e.vec_id, e.v, pc.cid, list_cosine_similarity(e.v, pc.cv) AS sim
      |  FROM e CROSS JOIN pc),
      |pcells AS (
      |  SELECT vec_id, v, cid AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
      |    FROM psims) WHERE rn = 1),
      |pres AS (
      |  SELECT cl.vec_id, cl.cell,
      |    list_transform(range(1, 65), i -> cl.v[i] - pc.cv[i]) AS r
      |  FROM pcells cl JOIN pc ON cl.cell = pc.cid),
      |psv AS (
      |  SELECT vec_id, cell, sub, list_slice(r, sub*16 + 1, sub*16 + 16) AS s
      |  FROM pres CROSS JOIN (SELECT unnest(range(4)) AS sub)),
      |pids AS (
      |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
      |  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
      |pcb AS (SELECT s.sub, i.code, s.s AS cv FROM psv s JOIN pids i USING (vec_id)),
      |pdist AS (
      |  SELECT s.vec_id, s.cell, s.sub, b.code,
      |    round(list_inner_product(s.s, s.s)
      |      - 2.0 * list_inner_product(s.s, b.cv)
      |      + list_inner_product(b.cv, b.cv), 6) AS d
      |  FROM psv s JOIN pcb b ON s.sub = b.sub),
      |pbest AS (
      |  SELECT vec_id, cell, sub, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn
      |    FROM pdist) WHERE rn = 1)""".stripMargin

  /** Per-nprobe IVF-PQ chain of the x25 sweep: probed cells → residual
    * LUT → ADC ranking (query vector excluded) → the same metric CTE
    * shape as [[annRecallCtes]]. */
  /** The exact-ratio rounding mirror at 6 decimals — delegates to
    * [[graft.functions.ExactRound.ratioSql]], the ONE place the HUGEINT
    * convention lives for Scala-built oracle SQL (the static string
    * oracles inline the identical form by hand; ExactRoundSpec +
    * dx_halfway_grid pin the convention on both engines). */
  private def R6(num: String, den: String): String =
    graft.functions.ExactRound.ratioSql(num, den, 6)

  private def pqSweepCtes(np: Int): String =
    s"""
       |pqcells_$np AS (
       |  SELECT cid AS cell FROM (
       |    SELECT cid, row_number() OVER (ORDER BY sim DESC, cid) AS rn
       |    FROM psims WHERE vec_id = 0)
       |  WHERE rn <= $np),
       |pqres_$np AS (
       |  SELECT pc.cid AS cell,
       |    list_transform(range(1, 65), i -> q.qv[i] - pc.cv[i]) AS qr
       |  FROM pc JOIN pqcells_$np ON pc.cid = pqcells_$np.cell CROSS JOIN q),
       |plut_$np AS (
       |  SELECT r.cell, b.sub, b.code,
       |    list_inner_product(list_slice(r.qr, b.sub*16 + 1, b.sub*16 + 16),
       |      list_slice(r.qr, b.sub*16 + 1, b.sub*16 + 16))
       |    - 2.0 * list_inner_product(list_slice(r.qr, b.sub*16 + 1, b.sub*16 + 16), b.cv)
       |    + list_inner_product(b.cv, b.cv) AS ld
       |  FROM pqres_$np r CROSS JOIN pcb b),
       |padc_$np AS (
       |  SELECT bs.vec_id, round(sum(l.ld), 6) AS adc_dist
       |  FROM pbest bs JOIN plut_$np l
       |    ON bs.cell = l.cell AND bs.sub = l.sub AND bs.code = l.code
       |  GROUP BY bs.vec_id),
       |ppq_$np AS (
       |  SELECT id, row_number() OVER (ORDER BY adc_dist, id) AS rank FROM (
       |    SELECT vec_id AS id, adc_dist FROM padc_$np WHERE vec_id <> 0
       |    ORDER BY adc_dist, id LIMIT 10) t),
       |pflags_$np AS (
       |  SELECT r.rank, (x.id IS NOT NULL) AS rel
       |  FROM ppq_$np r LEFT JOIN exact x ON r.id = x.id),
       |pmet_$np AS (
       |  SELECT 10::BIGINT AS n_rel,
       |    sum(CASE WHEN rel THEN 1 ELSE 0 END)::BIGINT AS hits,
       |    ${R6("sum(CASE WHEN rel THEN 1 ELSE 0 END)", "10")} AS recall,
       |    CASE WHEN min(CASE WHEN rel THEN rank END) IS NULL THEN 0.0
       |      ELSE ${R6("1", "min(CASE WHEN rel THEN rank END)")} END AS mrr,
       |    ${R6("sum(CASE WHEN rel THEN CAST(round(1000000.0 / log2(rank::DOUBLE + 1.0)) AS BIGINT) ELSE 0 END)",
           "list_sum(list_transform(range(1, 11), r -> CAST(round(1000000.0 / log2(r::DOUBLE + 1.0)) AS BIGINT)))")} AS ndcg
       |  FROM pflags_$np)""".stripMargin

  /** Per-nprobe CTE chain of the x25 oracle: probe cells → IVF top-10
    * ranking → x22-convention metrics vs the shared `exact` qrels. */
  private def annRecallCtes(np: Int): String =
    s"""
       |qcells_$np AS (
       |  SELECT cid AS cell FROM (
       |    SELECT cid, row_number() OVER (ORDER BY sim DESC, cid) AS rn
       |    FROM sims WHERE vec_id = 0)
       |  WHERE rn <= $np),
       |ivf_$np AS (
       |  SELECT id, row_number() OVER (ORDER BY cosine DESC, id) AS rank FROM (
       |    SELECT cells.vec_id AS id, round(list_cosine_similarity(cells.v, q.qv), 6) AS cosine
       |    FROM cells JOIN qcells_$np ON cells.cell = qcells_$np.cell CROSS JOIN q
       |    WHERE cells.vec_id <> 0
       |    ORDER BY cosine DESC, id LIMIT 10) t),
       |flags_$np AS (
       |  SELECT r.rank, (x.id IS NOT NULL) AS rel
       |  FROM ivf_$np r LEFT JOIN exact x ON r.id = x.id),
       |met_$np AS (
       |  SELECT 10::BIGINT AS n_rel,
       |    sum(CASE WHEN rel THEN 1 ELSE 0 END)::BIGINT AS hits,
       |    ${R6("sum(CASE WHEN rel THEN 1 ELSE 0 END)", "10")} AS recall,
       |    CASE WHEN min(CASE WHEN rel THEN rank END) IS NULL THEN 0.0
       |      ELSE ${R6("1", "min(CASE WHEN rel THEN rank END)")} END AS mrr,
       |    ${R6("sum(CASE WHEN rel THEN CAST(round(1000000.0 / log2(rank::DOUBLE + 1.0)) AS BIGINT) ELSE 0 END)",
           "list_sum(list_transform(range(1, 11), r -> CAST(round(1000000.0 / log2(r::DOUBLE + 1.0)) AS BIGINT)))")} AS ndcg
       |  FROM flags_$np)""".stripMargin

  /** One DP layer of the d37 Viterbi oracle: the cheapest cost to
    * consume exactly `k` characters, relaxing from the 1..4 prior
    * layers through the frequency-weighted vocab. */
  /** Shared d38/d39 oracle prefix: the d36 vocabulary with counts in ID
    * order (count desc, piece asc → row_number - 1), greedy WordPiece
    * segmentation of every DISTINCT word via the recursive longest-
    * prefix CTE, per-word id lists, per-document id streams (empty docs
    * keep an empty stream). */
  private val tokenIdCtes: String =
    """WITH docs AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ws
      |  FROM documents),
      |toks AS (SELECT unnest(ws) AS w FROM docs),
      |gc AS (
      |  SELECT substr(w, i, n) AS g, count(*) AS c
      |  FROM toks, unnest(range(1, len(w) + 1)) r(i), unnest(range(1, 5)) s(n)
      |  WHERE i + n - 1 <= len(w) GROUP BY 1),
      |topg AS (SELECT g AS piece, c FROM (SELECT g, c FROM gc ORDER BY c DESC, g LIMIT 200) t),
      |chars AS (SELECT g AS piece, c FROM gc WHERE len(g) = 1),
      |vid AS (
      |  SELECT piece, CAST(row_number() OVER (ORDER BY c DESC, piece) - 1 AS INTEGER) AS pid
      |  FROM (SELECT DISTINCT piece, c FROM (SELECT * FROM topg UNION ALL SELECT * FROM chars)) v),
      |words AS (SELECT DISTINCT w FROM toks),
      |seg AS (
      |  WITH RECURSIVE s(w, pos, piece) AS (
      |    SELECT w, 0, CAST(NULL AS VARCHAR) FROM words
      |    UNION ALL
      |    SELECT s.w, s.pos + m.l, substr(s.w, s.pos + 1, m.l)
      |    FROM s, LATERAL (
      |      SELECT max(len(v.piece)) AS l FROM vid v
      |      WHERE v.piece = substr(s.w, s.pos + 1, len(v.piece))) m
      |    WHERE s.pos < len(s.w) AND m.l IS NOT NULL)
      |  SELECT w, pos, piece FROM s WHERE piece IS NOT NULL),
      |wids AS (
      |  SELECT seg.w, list(vid.pid ORDER BY seg.pos) AS wid
      |  FROM seg JOIN vid ON vid.piece = seg.piece GROUP BY seg.w),
      |dw AS (SELECT doc_id, i AS wpos, ws[i] AS w
      |  FROM docs, unnest(range(1, len(ws) + 1)) r(i)),
      |dids AS (SELECT dw.doc_id, flatten(list(wids.wid ORDER BY dw.wpos)) AS ids
      |  FROM dw JOIN wids ON wids.w = dw.w GROUP BY dw.doc_id),
      |alldocs AS (
      |  SELECT d.doc_id, d.lang, coalesce(i.ids, CAST([] AS INTEGER[])) AS ids
      |  FROM documents d LEFT JOIN dids i ON i.doc_id = d.doc_id)""".stripMargin

  private def viterbiLayerCte(k: Int): String = {
    val parts = (1 to math.min(4, k)).map { l =>
      s"SELECT p.w, p.c + 1099511627776 - vf.f AS c FROM b${k - l} p " +
        s"JOIN vocabf vf ON vf.piece = substr(p.w, ${k - l} + 1, $l) " +
        s"AND len(vf.piece) = $l WHERE len(p.w) >= $k"
    }
    s"\nb$k AS MATERIALIZED (SELECT w, min(c) AS c FROM (" +
      parts.mkString(" UNION ALL ") + ") t GROUP BY w)"
  }

  /** One BPE-oracle round (d32): pair counts → arg-max pair `b{r}` →
    * greedy merge applied relationally. Candidates are positions where
    * the pair matches; inside a run of consecutive candidates (only
    * possible when wa = wb, e.g. `a a a`) greedy-left keeps the
    * even-offset ones — the gap-and-islands parity rule. A position is
    * consumed iff its predecessor starts a merge; survivors re-assemble
    * in position order. */
  private def bpeRoundCtes(r: Int): String =
    bpeRoundCtesKeyed(r, Seq("doc_id"))

  /** The same round, keyed by an arbitrary symbol-row key — d32 keys by
    * doc (word-level symbol rows), d33 by (doc, word occurrence)
    * (char-level rows, so merges never cross word boundaries).
    * tok/ws are MATERIALIZED: DuckDB inlines plain CTEs, and each round
    * references the prior one ~3×, so a 12-round chain (d35) would
    * otherwise expand ~3¹² scans of the base table and die on fd
    * exhaustion; materialization makes the oracle linear in rounds. */
  private def bpeRoundCtesKeyed(r: Int, keys: Seq[String]): String = {
    val prev = s"ws${r - 1}"
    val k = keys.mkString(", ")
    def eq(a: String, b: String) =
      keys.map(c => s"$a.$c = $b.$c").mkString(" AND ")
    def pfx(a: String) = keys.map(c => s"$a.$c").mkString(", ")
    s"""
       |p$r AS (
       |  SELECT unnest(list_slice(ws, 1, len(ws) - 1)) AS wa, unnest(list_slice(ws, 2, len(ws))) AS wb
       |  FROM $prev WHERE len(ws) >= 2),
       |b$r AS (SELECT wa, wb, count(*)::BIGINT AS n FROM p$r GROUP BY wa, wb ORDER BY n DESC, wa, wb LIMIT 1),
       |tok$r AS MATERIALIZED (
       |  SELECT $k, unnest(range(1, len(ws) + 1)) AS i, unnest(ws) AS w FROM $prev),
       |cand$r AS (
       |  SELECT ${pfx("tk")}, tk.i
       |  FROM tok$r tk JOIN tok$r nx ON ${eq("nx", "tk")} AND nx.i = tk.i + 1
       |  CROSS JOIN b$r WHERE tk.w = b$r.wa AND nx.w = b$r.wb),
       |starts$r AS (
       |  SELECT $k, i FROM (
       |    SELECT $k, i, i - min(i) OVER (PARTITION BY $k, i - rn) AS off
       |    FROM (SELECT $k, i, row_number() OVER (PARTITION BY $k ORDER BY i) AS rn
       |          FROM cand$r) c) s
       |  WHERE off % 2 = 0),
       |ws$r AS MATERIALIZED (
       |  SELECT ${pfx("tk")},
       |    coalesce(list(CASE WHEN st.i IS NOT NULL THEN b$r.wa || ' ' || b$r.wb ELSE tk.w END
       |      ORDER BY tk.i) FILTER (WHERE cons.i IS NULL), CAST([] AS VARCHAR[])) AS ws
       |  FROM tok$r tk
       |  CROSS JOIN b$r
       |  LEFT JOIN starts$r st ON ${eq("st", "tk")} AND st.i = tk.i
       |  LEFT JOIN starts$r cons ON ${eq("cons", "tk")} AND cons.i = tk.i - 1
       |  GROUP BY ${pfx("tk")})""".stripMargin
  }

  /** Shared CTE prefix of the BM25 oracles (x17/x18): documents → word
    * arrays → (N, sum_dl) stats → query-term tf with doc length → df →
    * per-term micro-unit contributions. Mirrors
    * [[graft.operators.RetrievalOps.bm25Scores]] exactly — the EXACT
    * integer kernel ([[graft.functions.ExactRound.bm25MicroContrib]]):
    * with k1 = 6/5, b = 3/4 and avgdl = S/N exact,
    *   cm = half-up of 10^6·22·tf·S·(2N−2df+1) /
    *        ((2df+1)·(10·tf·S + 3·S + 9·dl·N))
    * in HUGEINT `//` arithmetic — both engines land the identical
    * micro long ALWAYS, including on the halfway grid (the double
    * formula's residue cases were found by ResidueFreeSpec, r14). */
  private val Bm25OracleCtes: String =
    "WITH d AS (\n" +
      "  SELECT doc_id, list_filter(string_split_regex(lower(text), " +
      "'\\s+'), x -> len(x) > 0) AS ws\n  FROM documents),\n" +
      "dl AS (SELECT doc_id, len(ws)::BIGINT AS dl, ws FROM d),\n" +
      "stats AS (SELECT count(*)::BIGINT AS n, " +
      "sum(dl)::HUGEINT AS s FROM dl)" +
      bm25TermCtes(Seq("vector", "hash", "join"), "")

  /** The per-term-set half of a BM25 oracle (tf → df → micro-unit
    * contributions, suffixed CTE names so several query term-sets can
    * coexist in one statement — the x27 batch oracle). Requires the
    * `dl`/`stats` CTEs of [[Bm25OracleCtes]] in scope. */
  private def bm25TermCtes(terms: Seq[String], sfx: String): String = {
    val in = terms.map(t => s"'$t'").mkString(", ")
    s""",
       |tf$sfx AS (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf, max(dl) AS dl
       |  FROM (SELECT doc_id, dl, unnest(ws) AS term FROM dl)
       |  WHERE term IN ($in) GROUP BY doc_id, term),
       |dfreq$sfx AS (SELECT term, count(*)::BIGINT AS df FROM tf$sfx GROUP BY term),
       |contrib$sfx AS (
       |  SELECT doc_id, CAST((cnum * 2000000 + cden) // (cden * 2) AS BIGINT) AS cm
       |  FROM (
       |    SELECT doc_id,
       |      22::HUGEINT * tf * s * (2*n - 2*df + 1) AS cnum,
       |      (2*df + 1)::HUGEINT * (10*tf*s + 3*s + 9*dl*n) AS cden
       |    FROM tf$sfx JOIN dfreq$sfx USING (term) CROSS JOIN stats) t$sfx)""".stripMargin
  }

  /** Shared CTE prefix for the minhash-family oracles: documents → word
    * 3-gram shingles → portable 28-bit hashes → 16-perm minhash signatures
    * → 4-row LSH bands. Mirrors SimilarityQueries exactly. */
  private val MinhashOracleCtes: String =
    """WITH ws AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS ws
      |  FROM documents
      |), shl AS (
      |  SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
      |    ELSE list_transform(range(0, len(ws) - 2),
      |      i -> array_to_string(list_slice(ws, i + 1, i + 3), ' ')) END AS shingles
      |  FROM ws
      |), shash AS (
      |  SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 7))::BIGINT AS shash
      |  FROM (SELECT doc_id, UNNEST(shingles) AS s FROM shl)
      |), mh AS (
      |  SELECT doc_id, perm, min((37 * (perm + 1) * shash + 101 * perm + 7) % 1000000007) AS h
      |  FROM shash, range(0, 16) AS r(perm)
      |  GROUP BY doc_id, perm
      |), sig AS (
      |  SELECT doc_id, list(h ORDER BY perm) AS sig FROM mh GROUP BY doc_id
      |), banded AS (
      |  SELECT doc_id, sig, band,
      |    ('0x' || substr(md5(array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), ',')), 1, 7))::BIGINT AS band_key
      |  FROM sig, range(0, 4) AS b(band)
      |)""".stripMargin

  /** The incremental-admit decision, shared VERBATIM by d27 (text
    * recompute) and d42 (signature store) — one definition, so the two
    * gates can never validate against diverged oracles: the increment
    * (doc_id % 5 == 0) minus exact md5 copies of the existing corpus
    * minus cross-corpus LSH near-duplicates at 0.5. NOTE: declared
    * AFTER [[MinhashOracleCtes]] — object vals initialize in source
    * order. */
  private val IncrementAdmitOracle: String = (MinhashOracleCtes +
    """,
      |exh AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 <> 0),
      |en AS (SELECT doc_id, text FROM documents
      |  WHERE doc_id % 5 = 0 AND md5(text) NOT IN (SELECT h FROM exh)),
      |hits AS (
      |  SELECT DISTINCT a.doc_id
      |  FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
      |  JOIN en ON a.doc_id = en.doc_id
      |  WHERE b.doc_id % 5 <> 0
      |    AND len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i])) / 16.0 >= 0.5)
      |SELECT en.doc_id, CAST(len(en.text) AS BIGINT) AS text_len FROM en
      |WHERE en.doc_id NOT IN (SELECT doc_id FROM hits) ORDER BY doc_id""").stripMargin
}
