"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in mycelium_ray) calls ray.init()/ray.shutdown().

``queries()`` keys map to SURVEY.md §2 operators and the training-data op
suite; each has a matching ANSI-SQL oracle in ``oracle_sql()`` where the
semantics are SQL-expressible (stateful/hash/probabilistic ops are
rows-only by design and say so in their docstrings).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: documents → image+caption rows → decode/validate/clean
    (the SURVEY.md §7.1 minimum slice over the graft payload)."""
    from mycelium_ray.pipelines.flagship import flagship
    return flagship(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from mycelium_ray.pipelines import (analytics, ann, audio, cleaning,
                                        cluster, dedup, dsir, embed, graph,
                                        imageann, textops, tokenize, urlops,
                                        videoops, warcops)
    from mycelium_ray.pipelines.flagship import (
        image_augment as _image_augment,
        image_channel_stats as _image_channel_stats,
        image_sharpness as _image_sharpness,
        image_metadata as _image_metadata,
        image_phash_neardup as _image_phash_neardup,
        image_border_crop as _image_border_crop,
        image_redact as _image_redact,
        image_transcode_matrix as _image_transcode_matrix,
        image_exif as _image_exif,
        image_png_text as _image_png_text,
        image_ssim as _image_ssim,
        image_rot_invariant as _image_rot_invariant,
        image_exif_thumbnail as _image_exif_thumbnail,
        image_palette_gif as _image_palette_gif,
        image_autorotate as _image_autorotate,
        image_resize as _image_resize,
        image_shard_pack as _image_shard_pack,
        multimodal_filter as _multimodal_filter,
        webdataset_roundtrip as _webdataset_roundtrip,
        zip_roundtrip as _zip_roundtrip)

    return {
        # --- text analysis (documents) ---
        "token_count": textops.token_count,
        "train_val_split": textops.train_val_split,
        "charset_decode": textops.charset_decode,
        "unicode_nfc": textops.unicode_nfc,
        "events_window_join": analytics.events_window_join,
        "quality_score": textops.quality_score,
        "lang_id": textops.lang_id,
        "token_freq_score": textops.token_freq_score,
        "bigram_lm_score": textops.bigram_lm_score,
        "fingerprint": textops.fingerprint,          # rows-only (rolling hash)
        "stem_stats": textops.stem_stats,            # rows-only (M26 multi-
                                                     # lang: Porter + es/de/fr
                                                     # Snowball per lang_id;
                                                     # no offline DuckDB fts)
        # --- corpus cleaning / safety gates ---
        "pii_redact": cleaning.pii_redact,
        "repetition_filter": cleaning.repetition_filter,
        "decontaminate": cleaning.decontaminate,
        "boilerplate_lines": cleaning.boilerplate_lines,
        # --- dedup ---
        "dedup_exact": dedup.dedup_exact,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "editdist_pairs": dedup.editdist_pairs,
        "dedup_clusters": dedup.dedup_clusters,
        "corpus_filter": textops.corpus_filter,
        "tfidf_top_terms": textops.tfidf_top_terms,
        "inverted_index": textops.inverted_index,
        "substring_dedup": dedup.substring_dedup,
        "cdc_image_dedup": dedup.cdc_image_dedup,
        "minhash_lsh_dedup": dedup.minhash_lsh_dedup,  # rows-only (probabilistic)
        "simhash": dedup.simhash,                      # rows-only (bit tricks)
        "simhash_neardup": dedup.simhash_neardup,      # rows-only
        # --- similarity search (embeddings) ---
        "embed_documents": embed.embed_documents,  # rows-only (hashed
                                                   # projection, actor pool)
        "ann_topk": ann.ann_topk,
        "ann_topk_lsh": ann.ann_topk_lsh,              # rows-only (approximate)
        "ann_topk_ivf": ann.ann_topk_ivf,              # rows-only (approximate)
        "ann_topk_indexed": ann.ann_topk_indexed,      # rows-only (persisted
                                                       # IVF index, read-pruned)
        "ann_topk_pq": ann.ann_topk_pq,                # rows-only (PQ/ADC +
                                                       # exact refine, 32x codes)
        "ann_topk_hnsw": ann.ann_topk_hnsw,            # rows-only (graph ANN)
        "ann_recall": ann.ann_recall,                 # rows-only (eval of
                                                       # approximate paths)
        "embedding_neardup": ann.embedding_neardup,
        "embedding_kmeans": cluster.embedding_kmeans,  # rows-only (iterative)
        "semantic_dedup": cluster.semantic_dedup,      # rows-only (SemDeDup)
        # --- aggregations (events / lineitem / documents) ---
        "events_window_agg": analytics.events_window_agg,
        "events_user_stats": analytics.events_user_stats,
        "events_sessionize": analytics.events_sessionize,
        "source_stats": analytics.source_stats,
        "lineitem_pricing": analytics.lineitem_pricing,
        "top_users_by_value": analytics.top_users_by_value,
        "orders_by_nation": analytics.orders_by_nation,
        "revenue_by_priority": analytics.revenue_by_priority,
        "shipping_priority_topk": analytics.shipping_priority_topk,
        "returned_items_topk": analytics.returned_items_topk,
        "events_asof_join": analytics.events_asof_join,
        "events_rolling_avg": analytics.events_rolling_avg,
        "customers_no_urgent_orders": analytics.customers_no_urgent_orders,
        "customers_with_urgent_orders": analytics.customers_with_urgent_orders,
        "events_error_burst": analytics.events_error_burst,
        "value_percentiles": analytics.value_percentiles,
        "segment_revenue_topk": analytics.segment_revenue_topk,
        "distinct_users_hll": analytics.distinct_users_hll,  # rows-only (sketch)
        "distinct_users_per_type_hll":
            analytics.distinct_users_per_type_hll,  # rows-only (sketch;
                                                    # exact dual above)
        "value_quantiles_sketch":
            analytics.value_quantiles_sketch,       # rows-only (mergeable
                                                    # quantile summary)
        "heavy_hitters": analytics.heavy_hitters,
        "events_funnel": analytics.events_funnel,
        "events_retention": analytics.events_retention,
        "events_windowed_topk": analytics.events_windowed_topk,
        "events_decayed_counts": analytics.events_decayed_counts,
        "ship_delay_histogram": analytics.ship_delay_histogram,
        "events_anomaly_windows": analytics.events_anomaly_windows,
        "group_value_quantiles": analytics.group_value_quantiles,
        "local_supplier_revenue": analytics.local_supplier_revenue,
        "orders_rollup": analytics.orders_rollup,
        "orders_cube": analytics.orders_cube,
        "nation_order_revenue": analytics.nation_order_revenue,
        "orders_band_join": analytics.orders_band_join,
        "customer_urgent_counts": analytics.customer_urgent_counts,
        "urgent_low_customers": analytics.urgent_low_customers,
        "part_bulk_orders": analytics.part_bulk_orders,
        "customer_order_distribution": analytics.customer_order_distribution,
        "waiting_suppliers": analytics.waiting_suppliers,
        "cheapest_supplier_per_part": analytics.cheapest_supplier_per_part,
        "trade_volume": analytics.trade_volume,
        "market_share": analytics.market_share,
        "top_supplier": analytics.top_supplier,
        "quantity_brand_revenue": analytics.quantity_brand_revenue,
        "order_priority_check": analytics.order_priority_check,
        "nation_profit": analytics.nation_profit,
        "important_part_values": analytics.important_part_values,
        "part_supplier_counts": analytics.part_supplier_counts,
        "excess_share_suppliers": analytics.excess_share_suppliers,
        "events_late_arrivals": analytics.events_late_arrivals,
        "events_pivot": analytics.events_pivot,
        "promo_revenue_share": analytics.promo_revenue_share,
        "forecast_revenue": analytics.forecast_revenue,
        "small_qty_revenue": analytics.small_qty_revenue,
        "large_orders": analytics.large_orders,
        "linestatus_priority_counts": analytics.linestatus_priority_counts,
        "events_lag_diff": analytics.events_lag_diff,
        "user_cumulative_value": analytics.user_cumulative_value,
        "top_orders_per_customer": analytics.top_orders_per_customer,
        "rich_idle_customers": analytics.rich_idle_customers,
        "distinct_users_per_type": analytics.distinct_users_per_type,
        "user_mode_event_type": analytics.user_mode_event_type,
        "event_type_value_stats": analytics.event_type_value_stats,
        "props_key_agg": analytics.props_key_agg,
        "urgent_revenue_bloom_join": analytics.urgent_revenue_bloom_join,
        "user_event_path": analytics.user_event_path,
        "rolling_7d_active_users": analytics.rolling_7d_active_users,
        "events_outliers": analytics.events_outliers,
        "events_time_rollup": analytics.events_time_rollup,
        "purchasers_no_errors": analytics.purchasers_no_errors,
        "purchasers_with_errors": analytics.purchasers_with_errors,
        "embedding_dim_minmax": ann.embedding_dim_minmax,
        "source_label_profile": ann.source_label_profile,
        "pagerank": graph.pagerank,
        "triangle_count": graph.triangle_count,
        "word_count_topk": textops.word_count_topk,
        "sample_per_source": textops.sample_per_source,
        "train_test_split": textops.train_test_split,
        "sequence_pack": textops.sequence_pack,
        "chunk_documents": textops.chunk_documents,
        "length_percentile_filter": textops.length_percentile_filter,
        "bigram_topk": textops.bigram_topk,
        "doc_length_histogram": textops.doc_length_histogram,
        "global_length_rank": textops.global_length_rank,
        "curation_pipeline": textops.curation_pipeline,
        "source_mix_weights": textops.source_mix_weights,
        "bpe_tokenize": tokenize.bpe_tokenize,   # rows-only (iterative
                                                 # merge training)
        "dsir_resample": dsir.dsir_resample,     # rows-only (hashed
                                                 # features + Gumbel keys)
        # --- multimodal: derive/decode image rows -> phash near-dup ---
        "image_phash_neardup": _image_phash_neardup,
        "image_resize": _image_resize,
        "image_redact": _image_redact,
        "image_border_crop": _image_border_crop,
        "image_transcode_matrix": _image_transcode_matrix,
        "image_exif": _image_exif,
        "image_png_text": _image_png_text,
        "image_ssim": _image_ssim,
        "image_rot_invariant": _image_rot_invariant,
        "image_exif_thumbnail": _image_exif_thumbnail,
        "image_palette_gif": _image_palette_gif,
        "image_autorotate": _image_autorotate,
        "image_augment": _image_augment,
        "multimodal_filter": _multimodal_filter,
        "image_shard_pack": _image_shard_pack,
        "webdataset_roundtrip": _webdataset_roundtrip,
        "zip_roundtrip": _zip_roundtrip,
        "image_embed": imageann.image_embed,        # rows-only (pixel floats)
        "image_similarity_search": imageann.image_similarity_search,
        "caption_align": imageann.caption_align,
        "image_curation_pipeline": imageann.image_curation_pipeline,
        "image_channel_stats": _image_channel_stats,  # rows-only (pixel decode)
        "image_sharpness": _image_sharpness,          # rows-only (pixel decode)
        "image_metadata": _image_metadata,       # rows-only (rng-seeded dims;
                                                 # probe==decode pinned in pytest)
        "audio_features": audio.audio_features_pipeline,
        "audio_metadata": audio.audio_metadata,
        "audio_tags": audio.audio_tags,
        "audio_silence_trim": audio.audio_silence_trim,
        "vorbis_roundtrip": audio.vorbis_roundtrip,
        "video_frame_sample": videoops.video_frame_sample,
        "video_dup_groups": videoops.video_dup_groups,
        "video_scene_cuts": videoops.video_scene_cuts,
        "video_metadata": videoops.video_metadata,
        # --- crawl operators over derived URLs ---
        "url_canonicalize": urlops.url_canonicalize,
        "url_features": urlops.url_features,
        "robots_rfc9309": urlops.robots_rfc9309,
        "http_cache_policy": urlops.http_cache_policy,
        "idn_hosts": urlops.idn_hosts,
        "url_shard": urlops.url_shard,                 # rows-only (sha1)
        "robots_filter": urlops.robots_filter,
        "anchor_text_agg": urlops.anchor_text_agg,
        "frontier_order": urlops.frontier_order,       # rows-only (stateful)
        "warc_roundtrip": warcops.warc_roundtrip,
        "warc_cdx": warcops.warc_cdx,
        "warc_revisit": warcops.warc_revisit,
        "sitemap_ingest": urlops.sitemap_ingest,
        "recrawl_schedule": urlops.recrawl_schedule,
        "redirect_resolve": urlops.redirect_resolve,
        "crawl_budget": urlops.crawl_budget,
        "robots_sitemap_discovery": urlops.robots_sitemap_discovery,
        "mirror_hosts": urlops.mirror_hosts,
        "crawl_delta": urlops.crawl_delta,
    }


def oracle_sql() -> dict[str, str]:
    from mycelium_ray.pipelines import (analytics, ann, audio, cleaning,
                                        dedup, flagship, graph, imageann,
                                        textops, urlops, videoops, warcops)

    return {
        "pii_redact": cleaning.PII_REDACT_SQL,
        "repetition_filter": cleaning.REPETITION_FILTER_SQL,
        "decontaminate": cleaning.DECONTAMINATE_SQL,
        "boilerplate_lines": cleaning.BOILERPLATE_LINES_SQL,
        "token_count": textops.TOKEN_COUNT_SQL,
        "train_val_split": textops.TRAIN_VAL_SPLIT_SQL,
        "charset_decode": textops.CHARSET_DECODE_SQL,
        "unicode_nfc": textops.UNICODE_NFC_SQL,
        "events_window_join": analytics.EVENTS_WINDOW_JOIN_SQL,
        "quality_score": textops.QUALITY_SCORE_SQL,
        "lang_id": textops.LANG_ID_SQL,
        "token_freq_score": textops.TOKEN_FREQ_SCORE_SQL,
        "bigram_lm_score": textops.BIGRAM_LM_SCORE_SQL,
        "dedup_exact": dedup.DEDUP_EXACT_SQL,
        "ngram_jaccard_pairs": dedup.NGRAM_JACCARD_SQL,
        "editdist_pairs": dedup.EDITDIST_PAIRS_SQL,
        "dedup_clusters": dedup.DEDUP_CLUSTERS_SQL,
        "substring_dedup": dedup.SUBSTRING_DEDUP_SQL,
        "cdc_image_dedup": dedup.CDC_IMAGE_DEDUP_SQL,
        "corpus_filter": textops.CORPUS_FILTER_SQL,
        "tfidf_top_terms": textops.TFIDF_SQL,
        "inverted_index": textops.INVERTED_INDEX_SQL,
        "ann_topk": ann.ANN_TOPK_SQL,
        "embedding_neardup": ann.EMBEDDING_NEARDUP_SQL,
        "events_window_agg": analytics.EVENTS_WINDOW_AGG_SQL,
        "events_user_stats": analytics.EVENTS_USER_STATS_SQL,
        "events_sessionize": analytics.EVENTS_SESSIONIZE_SQL,
        "source_stats": analytics.SOURCE_STATS_SQL,
        "lineitem_pricing": analytics.LINEITEM_PRICING_SQL,
        "top_users_by_value": analytics.TOP_USERS_SQL,
        "orders_by_nation": analytics.ORDERS_BY_NATION_SQL,
        "revenue_by_priority": analytics.REVENUE_BY_PRIORITY_SQL,
        "shipping_priority_topk": analytics.SHIPPING_PRIORITY_SQL,
        "returned_items_topk": analytics.RETURNED_ITEMS_SQL,
        "events_asof_join": analytics.EVENTS_ASOF_SQL,
        "events_rolling_avg": analytics.EVENTS_ROLLING_AVG_SQL,
        "customers_no_urgent_orders": analytics.CUSTOMERS_NO_URGENT_SQL,
        "customers_with_urgent_orders": analytics.CUSTOMERS_WITH_URGENT_SQL,
        "events_error_burst": analytics.EVENTS_ERROR_BURST_SQL,
        "value_percentiles": analytics.VALUE_PERCENTILES_SQL,
        "segment_revenue_topk": analytics.SEGMENT_REVENUE_SQL,
        "heavy_hitters": analytics.HEAVY_HITTERS_SQL,
        "events_funnel": analytics.EVENTS_FUNNEL_SQL,
        "events_retention": analytics.EVENTS_RETENTION_SQL,
        "events_windowed_topk": analytics.EVENTS_WINDOWED_TOPK_SQL,
        "events_decayed_counts": analytics.EVENTS_DECAYED_SQL,
        "ship_delay_histogram": analytics.SHIP_DELAY_HISTOGRAM_SQL,
        "events_anomaly_windows": analytics.EVENTS_ANOMALY_SQL,
        "group_value_quantiles": analytics.GROUP_VALUE_QUANTILES_SQL,
        "local_supplier_revenue": analytics.LOCAL_SUPPLIER_REVENUE_SQL,
        "orders_rollup": analytics.ORDERS_ROLLUP_SQL,
        "orders_cube": analytics.ORDERS_CUBE_SQL,
        "nation_order_revenue": analytics.NATION_ORDER_REVENUE_SQL,
        "orders_band_join": analytics.ORDERS_BAND_JOIN_SQL,
        "customer_urgent_counts": analytics.CUSTOMER_URGENT_COUNTS_SQL,
        "urgent_low_customers": analytics.URGENT_LOW_CUSTOMERS_SQL,
        "part_bulk_orders": analytics.PART_BULK_ORDERS_SQL,
        "customer_order_distribution":
            analytics.CUSTOMER_ORDER_DISTRIBUTION_SQL,
        "waiting_suppliers": analytics.WAITING_SUPPLIERS_SQL,
        "cheapest_supplier_per_part": analytics.CHEAPEST_SUPPLIER_SQL,
        "trade_volume": analytics.TRADE_VOLUME_SQL,
        "market_share": analytics.MARKET_SHARE_SQL,
        "top_supplier": analytics.TOP_SUPPLIER_SQL,
        "quantity_brand_revenue": analytics.QUANTITY_BRAND_REVENUE_SQL,
        "order_priority_check": analytics.ORDER_PRIORITY_CHECK_SQL,
        "nation_profit": analytics.NATION_PROFIT_SQL,
        "important_part_values": analytics.IMPORTANT_PART_VALUES_SQL,
        "part_supplier_counts": analytics.PART_SUPPLIER_COUNTS_SQL,
        "excess_share_suppliers": analytics.EXCESS_SHARE_SUPPLIERS_SQL,
        "events_late_arrivals": analytics.EVENTS_LATE_ARRIVALS_SQL,
        "events_pivot": analytics.EVENTS_PIVOT_SQL,
        "promo_revenue_share": analytics.PROMO_REVENUE_SQL,
        "forecast_revenue": analytics.FORECAST_REVENUE_SQL,
        "small_qty_revenue": analytics.SMALL_QTY_REVENUE_SQL,
        "large_orders": analytics.LARGE_ORDERS_SQL,
        "linestatus_priority_counts": analytics.LINESTATUS_PRIORITY_SQL,
        "events_lag_diff": analytics.EVENTS_LAG_DIFF_SQL,
        "user_cumulative_value": analytics.USER_CUMULATIVE_SQL,
        "top_orders_per_customer": analytics.TOP_ORDERS_PER_CUST_SQL,
        "rich_idle_customers": analytics.RICH_IDLE_CUSTOMERS_SQL,
        "distinct_users_per_type": analytics.DISTINCT_USERS_PER_TYPE_SQL,
        "user_mode_event_type": analytics.USER_MODE_EVENT_TYPE_SQL,
        "event_type_value_stats": analytics.EVENT_TYPE_VALUE_STATS_SQL,
        "props_key_agg": analytics.PROPS_KEY_AGG_SQL,
        "urgent_revenue_bloom_join": analytics.URGENT_REVENUE_BLOOM_SQL,
        "user_event_path": analytics.USER_EVENT_PATH_SQL,
        "rolling_7d_active_users": analytics.ROLLING_7D_ACTIVE_SQL,
        "events_outliers": analytics.EVENTS_OUTLIERS_SQL,
        "events_time_rollup": analytics.EVENTS_TIME_ROLLUP_SQL,
        "purchasers_no_errors": analytics.PURCHASERS_NO_ERRORS_SQL,
        "purchasers_with_errors": analytics.PURCHASERS_WITH_ERRORS_SQL,
        "embedding_dim_minmax": ann.EMBEDDING_DIM_MINMAX_SQL,
        "source_label_profile": ann.SOURCE_LABEL_PROFILE_SQL,
        "bigram_topk": textops.BIGRAM_TOPK_SQL,
        "doc_length_histogram": textops.DOC_LENGTH_HISTOGRAM_SQL,
        "global_length_rank": textops.GLOBAL_LENGTH_RANK_SQL,
        "curation_pipeline": textops.CURATION_PIPELINE_SQL,
        "source_mix_weights": textops.SOURCE_MIX_WEIGHTS_SQL,
        "pagerank": graph.PAGERANK_SQL,
        "triangle_count": graph.TRIANGLE_COUNT_SQL,
        "word_count_topk": textops.WORD_COUNT_SQL,
        "sample_per_source": textops.SAMPLE_PER_SOURCE_SQL,
        "train_test_split": textops.TRAIN_TEST_SPLIT_SQL,
        "sequence_pack": textops.SEQUENCE_PACK_SQL,
        "chunk_documents": textops.CHUNK_DOCUMENTS_SQL,
        "length_percentile_filter": textops.LENGTH_PERCENTILE_SQL,
        "image_phash_neardup": flagship.IMAGE_PHASH_NEARDUP_SQL,
        "image_resize": flagship.IMAGE_RESIZE_SQL,
        "image_redact": flagship.IMAGE_REDACT_SQL,
        "image_border_crop": flagship.IMAGE_BORDER_CROP_SQL,
        "image_transcode_matrix": flagship.IMAGE_TRANSCODE_SQL,
        "image_exif": flagship.IMAGE_EXIF_SQL,
        "image_png_text": flagship.IMAGE_PNG_TEXT_SQL,
        "image_ssim": flagship.IMAGE_SSIM_SQL,
        "image_rot_invariant": flagship.IMAGE_ROT_INVARIANT_SQL,
        "image_exif_thumbnail": flagship.IMAGE_EXIF_THUMBNAIL_SQL,
        "image_palette_gif": flagship.IMAGE_PALETTE_GIF_SQL,
        "image_autorotate": flagship.IMAGE_AUTOROTATE_SQL,
        "image_augment": flagship.IMAGE_AUGMENT_SQL,
        "multimodal_filter": flagship.MULTIMODAL_FILTER_SQL,
        "image_shard_pack": flagship.IMAGE_SHARD_PACK_SQL,
        "webdataset_roundtrip": flagship.WEBDATASET_ROUNDTRIP_SQL,
        "zip_roundtrip": flagship.ZIP_ROUNDTRIP_SQL,
        "image_similarity_search": imageann.IMAGE_SIMILARITY_SQL,
        "caption_align": imageann.CAPTION_ALIGN_SQL,
        "image_curation_pipeline": imageann.IMAGE_CURATION_SQL,
        "audio_features": audio.AUDIO_FEATURES_SQL,
        "audio_metadata": audio.AUDIO_METADATA_SQL,
        "audio_tags": audio.AUDIO_TAGS_SQL,
        "audio_silence_trim": audio.AUDIO_SILENCE_TRIM_SQL,
        "vorbis_roundtrip": audio.VORBIS_ROUNDTRIP_SQL,
        "video_frame_sample": videoops.VIDEO_FRAME_SAMPLE_SQL,
        "video_dup_groups": videoops.VIDEO_DUP_GROUPS_SQL,
        "video_scene_cuts": videoops.VIDEO_SCENE_CUTS_SQL,
        "video_metadata": videoops.VIDEO_METADATA_SQL,
        "url_canonicalize": urlops.URL_CANONICALIZE_SQL,
        "url_features": urlops.URL_FEATURES_SQL,
        "robots_rfc9309": urlops.ROBOTS_RFC9309_SQL,
        "http_cache_policy": urlops.HTTP_CACHE_POLICY_SQL,
        "idn_hosts": urlops.IDN_HOSTS_SQL,
        "robots_filter": urlops.ROBOTS_FILTER_SQL,
        "anchor_text_agg": urlops.ANCHOR_TEXT_AGG_SQL,
        "warc_roundtrip": warcops.WARC_ROUNDTRIP_SQL,
        "warc_cdx": warcops.WARC_CDX_SQL,
        "warc_revisit": warcops.WARC_REVISIT_SQL,
        "sitemap_ingest": urlops.SITEMAP_INGEST_SQL,
        "recrawl_schedule": urlops.RECRAWL_SCHEDULE_SQL,
        "redirect_resolve": urlops.REDIRECT_RESOLVE_SQL,
        "crawl_budget": urlops.CRAWL_BUDGET_SQL,
        "robots_sitemap_discovery": urlops.ROBOTS_SITEMAP_DISCOVERY_SQL,
        "mirror_hosts": urlops.MIRROR_HOSTS_SQL,
        "crawl_delta": urlops.CRAWL_DELTA_SQL,
    }
