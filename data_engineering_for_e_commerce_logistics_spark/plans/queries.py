"""All QuerySpec registrations, one place to audit name ↔ oracle pairs.

Builders live next to their operators; this module only wires them to
the registry consumed by ``__spark_entry__`` and the pytest harness.
"""

from __future__ import annotations

from . import analytics_queries as aq
from . import cleaning_queries as cq
from . import function_queries as fq
from . import graph_queries as gq
from . import extended_queries as xq
from . import relational_queries as rq
from . import views
from .registry import register

# --- Analytic views (SURVEY §2.4 J1-J3, §2.5 A1-A2) -------------------
register(
    "v_order_summary",
    views.v_order_summary,
    views.V_ORDER_SUMMARY_SQL,
    tags=("view", "join", "agg"),
)
register(
    "v_delivery_performance",
    views.v_delivery_performance,
    views.V_DELIVERY_PERFORMANCE_SQL,
    tags=("view", "join", "agg", "conditional-agg"),
)

# --- Dedup D1-D5 (deterministic keep-first/last/none) ------------------
register("dedup_keep_first", cq.dedup_keep_first, cq.DEDUP_KEEP_FIRST_SQL, ("dedup",))
register("dedup_keep_last", cq.dedup_keep_last, cq.DEDUP_KEEP_LAST_SQL, ("dedup",))
register("dedup_drop_all", cq.dedup_drop_all, cq.DEDUP_DROP_ALL_SQL, ("dedup",))

# --- Missing-value strategies P2-P6 ------------------------------------
register("drop_missing_events", cq.drop_missing_events, cq.DROP_MISSING_SQL, ("nulls",))
register(
    "fill_constant_events", cq.fill_constant_events, cq.FILL_CONSTANT_SQL, ("nulls",)
)
register("fill_median_events", cq.fill_median_events, cq.FILL_MEDIAN_SQL, ("nulls",))
register("ffill_events", cq.ffill_events, cq.FFILL_SQL, ("nulls", "window"))
register(
    "interpolate_events", cq.interpolate_events, cq.INTERPOLATE_SQL, ("nulls", "window")
)

# --- Timestamp / string / derived P7-P11 -------------------------------
register(
    "coerce_timestamps_orders",
    cq.coerce_timestamps_orders,
    cq.COERCE_TIMESTAMPS_SQL,
    ("timestamps",),
)
register(
    "normalize_strings_customer",
    cq.normalize_strings_customer,
    cq.NORMALIZE_STRINGS_SQL,
    ("strings",),
)
register("derived_lineitem", cq.derived_lineitem, cq.DERIVED_LINEITEM_SQL, ("derived",))

# --- Validator rule engine (fused single-pass agg) ---------------------
register("validate_orders", cq.validate_orders, cq.VALIDATE_ORDERS_SQL, ("validation",))

# --- Profiler / aggregates / relational (S9, A3-A9, §2.6-2.7) ----------
register("profile_lineitem", rq.profile_lineitem, rq.PROFILE_LINEITEM_SQL, ("profile",))
register(
    "agg_cardinality_lineitem",
    rq.agg_cardinality_lineitem,
    rq.AGG_CARDINALITY_SQL,
    ("agg",),
)
register("pricing_summary", rq.pricing_summary, rq.PRICING_SUMMARY_SQL, ("agg",))
register("top_orders", rq.top_orders, rq.TOP_ORDERS_SQL, ("sort", "limit"))
register("upsert_orders", rq.upsert_orders, rq.UPSERT_ORDERS_SQL, ("sink", "merge"))
register(
    "json_extract_events", rq.json_extract_events, rq.JSON_EXTRACT_SQL, ("json",)
)
register(
    "explode_document_tokens",
    rq.explode_document_tokens,
    rq.EXPLODE_TOKENS_SQL,
    ("explode",),
)
register(
    "customer_running_spend",
    rq.customer_running_spend,
    rq.CUSTOMER_RUNNING_SPEND_SQL,
    ("window",),
)
register(
    "events_hourly_rollup", rq.events_hourly_rollup, rq.EVENTS_HOURLY_SQL, ("agg",)
)
register(
    "events_sessionize",
    rq.events_sessionize,
    rq.EVENTS_SESSIONIZE_SQL,
    ("window", "session"),
)
register(
    "binary_features", rq.binary_features, rq.BINARY_FEATURES_SQL, ("multimodal",)
)
register(
    "sql_api_order_summary",
    rq.sql_api_order_summary,
    views.V_ORDER_SUMMARY_SQL,
    ("sql", "view"),
)
register(
    "struct_flatten_roundtrip",
    rq.struct_flatten_roundtrip,
    rq.STRUCT_FLATTEN_SQL,
    ("struct",),
)

# --- Analytics extensions (grouping sets, pivot, semi/anti, set ops) ---
register("rollup_orders", aq.rollup_orders, aq.ROLLUP_ORDERS_SQL, ("grouping-sets",))
register(
    "region_nation_list",
    aq.region_nation_list,
    aq.REGION_NATION_LIST_SQL,
    ("agg", "string-agg"),
)
register("cube_orders", aq.cube_orders, aq.CUBE_ORDERS_SQL, ("grouping-sets",))
register("pivot_orders", aq.pivot_orders, aq.PIVOT_ORDERS_SQL, ("pivot",))
register(
    "semi_anti_orders", aq.semi_anti_orders, aq.SEMI_ANTI_ORDERS_SQL, ("join",)
)
register(
    "quantiles_lineitem", aq.quantiles_lineitem, aq.QUANTILES_LINEITEM_SQL, ("agg",)
)
register("bfill_events", aq.bfill_events, aq.BFILL_EVENTS_SQL, ("nulls", "window"))
register(
    "set_ops_customers", aq.set_ops_customers, aq.SET_OPS_CUSTOMERS_SQL, ("set-ops",)
)
register(
    "asof_events_orders",
    aq.asof_events_orders,
    aq.ASOF_EVENTS_ORDERS_SQL,
    ("join", "asof", "temporal"),
)
register(
    "q3_shipping_priority",
    aq.q3_shipping_priority,
    aq.Q3_SHIPPING_PRIORITY_SQL,
    ("join", "agg", "topk"),
)
register(
    "window_functions_orders",
    aq.window_functions_orders,
    aq.WINDOW_FUNCTIONS_SQL,
    ("window",),
)
register(
    "correlated_above_avg_orders",
    aq.correlated_above_avg_orders,
    aq.CORRELATED_ABOVE_AVG_SQL,
    ("subquery",),
)
register(
    "customer_spend_slope",
    aq.customer_spend_slope,
    aq.CUSTOMER_SPEND_SLOPE_SQL,
    ("agg", "regression"),
)
register(
    "sketch_aggregates_events",
    aq.sketch_aggregates_events,
    None,
    ("agg", "sketch", "rows-only"),
)
register(
    "dedup_clusters",
    gq.dedup_clusters,
    gq.DEDUP_CLUSTERS_SQL,
    ("dedup", "iterative", "graph"),
)
register("ivf_assign", gq.ivf_assign, gq.IVF_ASSIGN_SQL, ("similarity", "ivf"))
register(
    "kmeans_refine",
    gq.kmeans_refine,
    gq.KMEANS_REFINE_SQL,
    ("similarity", "ivf", "iterative"),
)
register(
    "ngram_frequencies",
    gq.ngram_frequencies,
    gq.NGRAM_FREQUENCIES_SQL,
    ("text", "topk"),
)
register(
    "scalar_functions_part",
    gq.scalar_functions_part,
    gq.SCALAR_FUNCTIONS_SQL,
    ("scalar",),
)
register(
    "time_functions_orders",
    fq.time_functions_orders,
    fq.TIME_FUNCTIONS_SQL,
    ("scalar", "time"),
)
register(
    "array_functions_documents",
    fq.array_functions_documents,
    fq.ARRAY_FUNCTIONS_SQL,
    ("scalar", "array"),
)
register("scd2_customer", fq.scd2_customer, fq.SCD2_CUSTOMER_SQL, ("sink", "scd2"))
register(
    "map_functions_events", fq.map_functions_events, fq.MAP_FUNCTIONS_SQL, ("map",)
)

# --- Training-data pipeline: dedup / text / similarity -----------------
register(
    "dedup_exact_documents", xq.dedup_exact_documents, xq.DEDUP_EXACT_SQL, ("dedup",)
)
register(
    "dedup_minhash_lsh", xq.dedup_minhash_lsh, xq.DEDUP_MINHASH_SQL, ("dedup", "lsh")
)
register(
    "dedup_ngram_jaccard",
    xq.dedup_ngram_jaccard,
    xq.DEDUP_NGRAM_JACCARD_SQL,
    ("dedup",),
)
register("dedup_simhash", xq.dedup_simhash, None, ("dedup", "rows-only"))
register(
    "dedup_simhash_pairs", xq.dedup_simhash_pairs, None, ("dedup", "rows-only")
)
register(
    "q5_nation_volume", aq.q5_nation_volume, aq.Q5_NATION_VOLUME_SQL, ("join", "agg")
)
register(
    "repeat_orders_7d",
    aq.repeat_orders_7d,
    aq.REPEAT_ORDERS_7D_SQL,
    ("join", "range", "temporal"),
)
register("text_token_stats", xq.text_token_stats, xq.TEXT_TOKEN_STATS_SQL, ("text",))
register("text_quality", xq.text_quality, xq.TEXT_QUALITY_SQL, ("text",))
register("text_lang_id", xq.text_lang_id, xq.TEXT_LANG_ID_SQL, ("text",))
register("text_fingerprint", xq.text_fingerprint, xq.TEXT_FINGERPRINT_SQL, ("text",))
register(
    "dedup_embedding_cosine",
    xq.dedup_embedding_cosine,
    xq.DEDUP_EMBEDDING_COSINE_SQL,
    ("dedup", "similarity"),
)
register("embedding_topk", xq.embedding_topk, xq.EMBEDDING_TOPK_SQL, ("similarity",))
register("embedding_ann", xq.embedding_ann, xq.EMBEDDING_ANN_SQL, ("similarity",))
