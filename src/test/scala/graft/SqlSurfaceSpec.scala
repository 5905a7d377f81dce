package graft

/** The `spark.sql` face of the engine: every oracle text whose SQL is
  * portable ANSI (no DuckDB-only routines) must run UNCHANGED through
  * Spark SQL over temp views and produce row-for-row the same results
  * as the DataFrame plans. This is the "a user can type SQL at it"
  * guarantee — and a standing check that the oracle SQL really is the
  * portable-ANSI description of each query, not a DuckDB-flavored
  * approximation.
  *
  * The suite enumerates ALL of `SparkEntry.oracleSql` and subtracts an
  * explicit, reason-tagged exclusion list — a new query is SQL-checked
  * by default, and excluding it requires naming the DuckDB-only
  * construct that forces it.
  */
class SqlSurfaceSpec extends SparkSpec {

  /** Oracles that CANNOT run through Spark SQL, and the DuckDB-only
    * construct that forces the exclusion. */
  private val duckdbOnly: Map[String, String] = Map(
    // md5()-derived integers: DuckDB casts hex STRINGS to ints;
    // Spark needs conv()/unhex, so the shared-text form can't exist
    "dedup_clusters" -> "recursive CTE reachability + hex-string casts",
    "dedup_keep_best" -> "recursive CTE reachability + hex-string casts + string_split_regex",
    "dedup_embedding_clusters" -> "recursive CTE reachability + list comprehension",
    "dedup_embedding_pairs" -> "list_transform/list_dot_product",
    "dedup_minhash_lsh" -> "list aggregation (list_min over shingle hashes)",
    "dedup_incremental_lsh" -> "list aggregation + list_filter signature agreement",
    "dedup_blocking_quality" -> "list aggregation + list_slice band buckets",
    "dedup_crossmodal_clusters" -> "recursive CTE + list ops + xor() across all three evidence fragments",
    "graph_pagerank" -> "minhash CTE (string_split_regex + hex-string casts)",
    "dedup_jaccard_pairs" -> "unnest() lateral",
    "dedup_containment_top" -> "unnest() lateral",
    "graph_triangles" -> "minhash CTE (string_split_regex + hex-string casts)",
    "graph_link_prediction" -> "minhash CTE (string_split_regex + hex-string casts)",
    "graph_clustering" -> "minhash CTE (string_split_regex + hex-string casts)",
    "graph_label_prop" -> "minhash CTE (string_split_regex + hex-string casts)",
    "sim_hard_negatives" -> "list_dot_product",
    "text_pmi_bigrams" -> "unnest() zipped list_transform bigrams",
    "text_bigram_lm" -> "unnest() zipped list_transform bigrams",
    "pipeline_leakfree_split" -> "recursive CTE reachability + hex-string casts",
    "pipeline_crossmodal_split" -> "recursive CTE reachability + list ops + hex-string casts",
    "dedup_shingle_jaccard" -> "string_split_regex",
    "dedup_shingle_novelty" -> "string_split_regex + list_transform shingles",
    "dedup_simhash" -> "unnest() lateral",
    "dedup_simhash_pairs" -> "unnest() lateral",
    "dedup_simhash_clusters" -> "unnest() lateral + recursive CTE reachability",
    "dedup_winnow_pairs" -> "string_split_regex",
    "events_asof_attribution" -> "epoch_us() timestamp arithmetic",
    "events_asof_next_purchase" -> "epoch_us() timestamp arithmetic",
    "events_json_kv" -> "json_extract_string",
    "events_retention_cohorts" -> "DATE - DATE integer subtraction (Spark: interval)",
    "events_value_quantiles" -> "quantile_cont (Spark: percentile)",
    "mm_features" -> "octet_length(CAST AS BLOB) + regexp_extract_all/len",
    "mm_image_dedup" -> "xor() function (Spark spells it ^) + brute-force pair replay",
    "mm_image_clusters" -> "xor() function + recursive CTE reachability",
    "mm_frame_sample" -> "list_transform byte slicing",
    "mm_meta" -> "octet_length(CAST AS BLOB)",
    "mm_audio_meta" -> "octet_length(CAST AS BLOB)",
    "mm_resize" -> "list_transform byte slicing",
    "pack_token_shards" -> "string_split_regex",
    "pipeline_decontaminate" -> "list comprehension n-gram hashing",
    "text_lm_score" -> "string_split_regex",
    "text_quality_by_source" -> "string_split_regex",
    "payroll_recovery" -> "non-equality correlated scalar subqueries",
    "series_source_scan" -> "range(n) t(i) table alias + INTERVAL (i) MONTH",
    "pipeline_curation" -> "recursive CTE cluster map + hex-string casts",
    "sample_hash_bernoulli" -> "hex-string CAST to BIGINT",
    "sample_weighted" -> "string_split_regex + hex-string CAST",
    "sample_stratified" -> "hex-string CAST to BIGINT",
    "sample_temperature_mixture" -> "string_split_regex + hex-string CAST",
    "pack_length_buckets" -> "string_split_regex",
    "text_quality_linear" -> "string_split_regex + hex-string CAST",
    "sim_random_projection" -> "list_dot_product + list-literal indexing",
    "sim_mmr_rerank" -> "list_dot_product",
    "sim_topk_bruteforce" -> "list_dot_product",
    "sim_topk_ivf" -> "list comprehension k-means unroll",
    "sim_ivf_pruned_topk" -> "list comprehension k-means unroll",
    "sim_range_search" -> "list comprehension k-means unroll",
    "sim_topk_lsh_ann" -> "list_dot_product",
    "dedup_incremental_clusters" -> "recursive CTE reachability + hex-string casts",
    "sim_knn_graph" -> "list comprehension k-means unroll (list(... ORDER BY) aggregate)",
    "sim_knn_clusters" -> "list comprehension k-means unroll + recursive CTE reachability",
    "sim_ivf_upsert" -> "list comprehension k-means unroll",
    "pipeline_drift" -> "string_split_regex + list_distinct signals",
    "pipeline_batch_novelty" -> "string_split_regex + list_transform shingles",
    "sample_balanced_classes" -> "hex-string CAST to BIGINT",
    "text_cms_heavy_hitters" -> "unnest() lateral",
    "text_fingerprint" -> "hex-digit CAST to INT",
    "text_keyword_search" -> "string_split_regex + list_filter postings",
    "text_langid" -> "string_split_regex",
    "text_quality" -> "string_split_regex",
    "text_term_freq" -> "unnest() lateral",
    "text_tfidf_top" -> "unnest() lateral",
    "text_token_stats" -> "string_split_regex",
    "text_vocab_stats" -> "unnest() lateral",
    "text_repetition" -> "string_split_regex + list_transform bigrams",
    "text_zipf_fit" -> "string_split_regex + unnest() lateral",
    "text_winsorized_tokens" -> "string_split_regex + quantile_cont (Spark: percentile)",
    "text_top_terms_per_lang" -> "string_split_regex + unnest() lateral",
    "sample_source_mixture" -> "string_split_regex + hex-string CAST to BIGINT",
    "pack_context_chunks" -> "string_split_regex + list slicing",
    "pipeline_scrub_pack" -> "string_split_regex + list slicing + aggregate FILTER",
    "payroll_gap_fill" -> "non-equality correlated scalar subqueries",
    "sim_topk_pq" -> "list comprehension k-means unroll + list_dot_product",
    "dedup_semantic_keep" -> "recursive CTE reachability + DOUBLE[] list cast",
    "text_bm25" -> "string_split_regex + unnest() lateral",
    "pipeline_profile" -> "date_diff('day', …) quoted unit (Spark: unquoted DAY)",
    "dedup_fuzzy_pairs" -> "jaro_winkler_similarity (Spark: graft native expression)",
    "text_entropy_by_source" -> "string_split_regex + unnest() lateral",
    "sim_topk_ivfpq" -> "list comprehension k-means unroll + list_dot_product",
    "payroll_autocorr" -> "variable INTERVAL (expr) MONTH arithmetic",
    "pipeline_dsir_sample" -> "string_split_regex + hex-string CAST to BIGINT",
    "sample_neyman" -> "string_split_regex + hex-string CAST to BIGINT",
    "events_sliding_hourly" -> "time_bucket + range(n) kk(k) alias + k * INTERVAL",
    "events_asof_last_touch_1h" -> "native ASOF LEFT JOIN + epoch_us()",
    "text_vocab_coverage" -> "string_split_regex + unnest() lateral",
    "rel_order_sessions" -> "DATE - DATE integer subtraction (Spark: datediff)",
    "mm_scene_cuts" -> "octet_length(encode()) + list_transform byte sums",
    "pack_epoch_shuffle" -> "range(n) ee(e) alias + hex-string CAST to BIGINT",
    "dedup_soft_weights" -> "recursive CTE reachability + hex-string casts",
    "sample_poisson_bootstrap" -> "range(n) bb(b) alias + hex-string CAST to BIGINT",
    "events_bot_scores" -> "epoch_us() + HUGEINT exact square sums",
    "events_decay_counts" -> "epoch_us()",
    "pipeline_profile_sketch" -> "hex-string CAST + bare VARCHAR cast + scalar-subquery CTE blocks",
    "rel_join_size_est" -> "range(n) dd(d) alias + hex-string CAST to BIGINT",
    "rel_cbo_join_order" -> "range(n) dd(d) alias + hex-string CAST to BIGINT",
    "text_boilerplate_chunks" -> "string_split_regex + list slicing",
    "text_pii_scrub" -> "regexp_extract_all + regexp_replace 'g' flag",
    "dedup_duplicate_spans" -> "string_split_regex + list slicing",
    "dedup_span_scrub" -> "string_split_regex + list slicing + aggregate FILTER",
    "sim_eval_recall" -> "list_dot_product",
    "sim_eval_recall_ivf" -> "list comprehension k-means unroll + list_dot_product",
    "text_bpe_train" -> "MATERIALIZED CTE hints + string_split_regex + unnest(range())",
    "text_bpe_encode" -> "MATERIALIZED CTE hints + string_split_regex + unnest(range())",
  )

  test("every ANSI-portable oracle text runs through spark.sql with identical results") {
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    }
    Tables.events(spark, sf0001).createOrReplaceTempView("events")

    val unknown = duckdbOnly.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unknown.isEmpty, s"exclusions for undeclared queries: $unknown")
    val portable = SparkEntry.oracleSql.keys.toSeq.sorted
      .filterNot(duckdbOnly.contains)
    // half the declared surface speaks portable ANSI; a regression
    // here means an oracle text drifted DuckDB-only
    assert(portable.size >= 30, s"portable surface shrank to ${portable.size}")

    portable.foreach { name =>
      val viaSql = spark.sql(SparkEntry.oracleSql(name)).collect().map(_.toSeq)
      val viaDf = SparkEntry.queries(name)(spark, sf0001).collect().map(_.toSeq)
      assert(viaSql.length == viaDf.length,
        s"$name: SQL rows ${viaSql.length} != DataFrame rows ${viaDf.length}")
      viaSql.zip(viaDf).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"$name row $i differs: sql=$a df=$b")
      }
    }
  }
}
