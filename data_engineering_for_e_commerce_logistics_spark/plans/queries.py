"""All QuerySpec registrations, one place to audit name ↔ oracle pairs.

Builders live next to their operators; this module only wires them to
the registry consumed by ``__spark_entry__`` and the pytest harness.

REGISTRATION ORDER IS PART OF THE DRIVER CONTRACT (VERDICT r01): the
driver's correctness gate checked exactly the first 50 registrations,
so the order below is deliberate and rotates per round:

* positions 1-50: flagship views, then every query whose
  implementation is NEW or CHANGED since the last driver-verified
  round, then the rotation backlog — queries whose last green row is
  two rounds old (VERDICT r02 item 4: nothing stays unverified two
  consecutive rounds) — then a representative slice of the
  training-data pipeline family as regression sentries.
* positions 51+: oracle-checked queries green in the PREVIOUS round's
  CORRECTNESS (freshest evidence, lowest re-check urgency) — still
  checked whenever the driver looks past 50, and rotated back into
  the window next round.
* last: rows-only specs (no oracle by design) — they only ever get
  the weaker rows-only check, so they spend no verified slot.

r13 window — THE COMMITTED TRADE (planned r12, executed here):
``incremental_exact_fresh`` (r11-green, i.e. in THIS round's own
backlog — the funding rule) retires to fund the
``corpus_decon_suite`` debut (exact + fuzzy + semantic
decontamination legs off one cached scan; pre-built and sf2.5-
rehearsed r12) — the incremental dedup suite's exact leg preserves
every retired cell.  ``corpus_decontaminate`` retires from the
opposite (r12-green) half in the same commit: the suite subsumes
it, so carrying it to r14 re-verification buys nothing.

* positions 1-2: the flagship views (always in-window).
* position 3: the ``corpus_decon_suite`` debut (never-checked —
  MUST be in-window).
* positions 4-50: the r11-green stale backlog (CORRECTNESS r11 ∖
  r12) minus the retired ``incremental_exact_fresh`` — 47 specs.
* positions 51-97: the 47 r12-green specs (48 minus the retired
  ``corpus_decontaminate``) — they become the r14 backlog.
* position 98: ``sketch_aggregates_events``, rows-only by design.

Arithmetic: 2 + 1 + 47 = 50 exactly.  Once CORRECTNESS_r13 lands,
every live oracle spec's last driver row is r12 or r13.

WINDOW ARITHMETIC going forward: the registry is now 98 specs /
97 oracle-paired (2 flagships + 95 rotating + 1 rows-only) — the
trade is net −1 (2 retired, 1 debuted), so the 2-round re-check
capacity (2 rounds × 48 free slots = 96 ≥ 95) gains one slot of
slack over r12's exact squeeze.
The standing rule from r11's exact-capacity squeeze: every debut
must be funded by retiring at least as many specs FROM THAT
ROUND'S OWN BACKLOG (a retirement from the opposite half relieves
nothing, the lesson the r11 pull-forward encodes).
r13 load = 2 + 1 debut + 47 backlog = 50 exactly (this window —
executed above).
r14 load = 2 + 47 backlog (the r12-green half above) = 49 before
its trade; THE r14 TRADE (pre-built r12, re-rehearsed r13):
retire ``semdedup_trained_pairs`` + ``semdedup_routed_pairs`` (both
r12-green, r14's own backlog) into ``semdedup_routing_suite``, and
debut ``corpus_weighted_sample`` (Sequential Poisson weighted
sampling, pre-built r12) in the freed + spare slots: 2 + 45 + 2 =
49 ≤ 50.
r15+: the
remaining pre-built runway (``standardize_embeddings_suite``; THE r18
trade retiring ``bpe_merges_documents`` + ``bpe_encode_documents``
into ``bpe_suite`` funding ``events_chain_components``; THE r19
``kcenter_seed_embeddings`` debut; THE r20 trade retiring
``corpus_tfidf_topk`` into ``lexical_retrieval_suite``) lands under
the same rule — each trade's retiring specs must be scheduled into
the trade's own backlog round.  NEW r12 pre-builds widening the
runway: ``corpus_dsir_sample`` (DSIR importance resampling),
``corpus_quality_classifier`` (in-engine hashed logistic filter —
debut via ``quality_classifier_suite``, the r13 pre-build pairing the
scored docs with ``quality_calibration_bins``' reliability/ECE leg
off one cached training chain) and
``hybrid_retrieval_rrf`` (BM25 + cosine Reciprocal Rank Fusion) are
r15-r17 debut candidates — funding comes from the
``incremental_embedding_suite`` trade (retiring
``incremental_semdedup_fresh`` + ``incremental_pq_fresh`` once both
sit in the registering round's own backlog) plus the slack the r14
window's 49-load leaves; pin the exact arithmetic with
``tools/rotate_registry.py`` at that round's open.  All builders sit
in ``tools/prebuilt.py`` with solo baselines and sf0.01
differentials.  Late-r12 additions to the runway (debut candidates
r15+ as slots free): ``cms_heavy_hitters_events`` (count-min sketch,
cell-exact shared-arithmetic oracle), ``cms_salted_rollup_events``
(sketch-gated conditional salting, bit-identical to plain groupBy),
``hard_negative_mining`` (BM25 ∖ cosine retriever-training pairs),
``jl_project_embeddings`` (map-only ±1 dimension reduction),
``cluster_safe_split_documents`` (leakage-safe split; shares the LSH
chain with ``minhash_cluster_suite`` — a natural future trade) and
``hist_quantiles_events`` + ``group_hist_quantiles_events``
(mergeable quantile histograms, the hash-checkable counterpart of
the rows-only t-digest spec), ``group_cms_topk_events`` (per-group
hot keys), ``cms_token_topk_documents`` (string-keyed vocab pass)
and ``hist_drift_events`` (PSI drift verdicts as hash-checked
cells), and — NEW r13 pre-builds — ``source_coverage_greedy``
(submodular greedy source selection over the exact 2^|S|-bounded
n-gram coverage mask summary; unrolled-argmax oracle),
``embedding_drift_cells`` (PSI over IVF cell occupancy, the vector
twin of ``hist_drift_events``), ``drift_monitor_suite`` (the
one-slot trade vehicle pairing both monitors; parts-equivalence
pinned), ``source_overlap_matrix`` (cross-source contamination
forensics off the registered LSH pair mine), and
``incremental_coverage_fresh`` (SEVENTH incremental family — the
bit_or-mergeable coverage index through the generic streaming loop;
greedy-leg oracle = the one-shot SQL verbatim), and
``tokenizer_fertility_stats`` (per-language BPE fertility /
compression health report off the trained encode chain — the
natural second leg of the r18 ``bpe_suite`` trade), and
``embedding_diversity_report`` (per-label mean pairwise cosine via
the sum-vector identity — zero pairwise work; the near-dup-collapse
monitor), ``ann_balance_report`` (IVF occupancy Gini/imbalance — the
n_probe-cost health twin of the drift monitor off the same map-only
assign), ``domain_reweight_mixture`` (DoReMi-style
multiplicative-weights domain mixture optimizer — the whole loop as
window expressions over the K×64 bucket-LM grid),
``source_divergence_matrix`` (pairwise JS divergence between source
bucket-LMs — crawls that write alike), ``lang_source_independence``
(Pearson χ² — does language depend on source),
``corpus_mean_tokens_ci`` (deterministic Poisson bootstrap — corpus
numbers with error bars in one pass), ``token_quota_plan_sources``
(water-filling budget quotas — the reweight→quota→sampler chain's
middle step; ``mixture_planning_suite`` pairs both chain stages off
one cached reweight for the single-slot debut), and
``quality_classifier_suite`` (scored docs + reliability/ECE bins off
one cached training chain — the classifier-slot debut vehicle),
``funnel_events`` (ordered-step conversion — the events-side cheap
slot; greedy fold ≡ iterated-min oracle),
``cohort_retention_events`` (weekly cohort retention matrix) and
``event_transitions`` (Markov behavior matrix) — consolidated with
the funnel into the pre-built ``event_analytics_suite`` (one cached
scan, parts-equivalence pinned; solo 1.3s vs 2.9s for the parts),
``ab_purchase_test`` (two-proportion z-test on the md5-parity user
split — the experimentation readout), and
``zipf_fit_report`` (token-ranking corpus fingerprint with in-engine
OLS; cheap-slot filler), ``vocab_growth_curve`` (Heaps-law vocabulary
growth off 16 hash-prefix checkpoints — shares the factored
``ols_fit`` helper with the Zipf spec; their one-slot vehicle
``token_stats_suite`` serves both off ONE (token → count,
first-bucket) aggregate, parts-equivalence pinned), ``dedup_retention_ledger`` (per-source
dedup cost forensics off the registered LSH chain), and
``dedup_threshold_sweep`` (Jaccard-cut sensitivity off one cached
mine) — consolidated with minhash_cluster_suite into the pre-built
``lsh_forensics_suite`` (4 legs, one cached mine, parts-equivalence
pinned; solo 4.3s vs ≈7.8s for the parts — the 3-slots→1 trade once
the funding arithmetic allows).  PREFERRED DEBUT VEHICLES: ``cms_suite_events`` (one slot
for the two CMS specs off one cached scan) and ``hist_suite_events``
(one slot for the two histogram specs; global cells marginalized
from the grouped build) — parts-equivalence pinned for both, so a
future round can register each suite instead of its parts.  The
streaming sketch loop (``start_cms_stream`` — CMS, histogram, and
DataSketches-HLL batch-equivalence twins) is unit-pinned like the
rest of §2.8 (no oracle slot needed).

RUNWAY PRIORITIZATION (r13 session — the pre-built runway now far
exceeds any round's free slots): debut CONSOLIDATION VEHICLES before
their parts — each is parts-equivalence-pinned so one slot carries a
whole family's evidence.  The session's vehicles, cheapest slot-cost
first: ``token_stats_suite`` (Zipf + Heaps, solo 1.2s),
``event_analytics_suite`` (funnel + cohort + transitions, 1.3s),
``mixture_planning_suite`` (DoReMi + water-fill, 2.5s),
``lsh_forensics_suite`` (pairs + clusters + ledger + sweep, 4.3s —
also retires the registered minhash_cluster_suite, net −0 slots for
4 families), ``quality_classifier_suite`` (classifier + calibration,
8.2s).  Cheap standalone fillers when a fraction of a slot frees:
``ab_purchase_test`` 0.67s, ``corpus_mean_tokens_ci`` 0.79s,
``retention_decay_fit`` 0.83s,
``zipf_fit_report`` 0.79s, ``lang_source_independence`` 0.93s,
``ann_balance_report`` 1.08s, ``embedding_diversity_report`` 1.17s,
``source_divergence_matrix`` 1.25s.

Checked invariants (pytest test_bench_gate): every never-checked
query sits inside the window, and no rows-only spec spends a
verified slot.
"""

from __future__ import annotations

from . import analytics_queries as aq
from . import cleaning_queries as cq
from . import corpus_queries as xc
from . import function_queries as fq
from . import graph_queries as gq
from . import extended_queries as xq
from . import relational_queries as rq
from . import views
from .registry import register

# --- 1-2: Flagship analytic views (always in-window) -------------------
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

# --- 3: r13 debut (never-checked — MUST be in-window): THE r13 TRADE —
# --- the decontamination suite (exact + fuzzy + semantic legs off one
# --- cached scan) subsumes corpus_decontaminate (retired from the
# --- r12-green half) and is funded by retiring incremental_exact_fresh
# --- (r11-green = THIS round's own backlog; the incremental dedup
# --- suite's exact leg preserves every cell) ---------------------------
register(
    "corpus_decon_suite",
    xc.corpus_decon_suite,
    xc.CORPUS_DECON_SUITE_SQL,
    ("corpus", "decontamination", "merged-variants", "suite"),
)

# --- 4-50: the r11-green stale backlog (CORRECTNESS r11 ∖ r12, oldest
# --- evidence first) minus the retired incremental_exact_fresh --------
register(
    "array_functions_documents",
    fq.array_functions_documents,
    fq.ARRAY_FUNCTIONS_SQL,
    ("scalar", "array"),
)
register(
    "asof_events_orders",
    aq.asof_events_orders,
    aq.ASOF_EVENTS_ORDERS_SQL,
    ("join", "asof", "temporal"),
)
register(
    "basket_pairs",
    aq.basket_pairs,
    aq.BASKET_PAIRS_SQL,
    ("agg", "market-basket", "pair-mining"),
)
register("binary_features", rq.binary_features, rq.BINARY_FEATURES_SQL, ("multimodal",))
register(
    "bpe_merges_documents",
    xc.bpe_merges_documents,
    xc.BPE_MERGES_SQL,
    ("text", "tokenizer", "bpe", "iterative", "multi-round"),
)
register(
    "coerce_timestamps_orders",
    cq.coerce_timestamps_orders,
    cq.COERCE_TIMESTAMPS_SQL,
    ("timestamps",),
)
register(
    "cohort_retention",
    aq.cohort_retention,
    aq.COHORT_RETENTION_SQL,
    ("agg", "cohort", "temporal"),
)
register(
    "corpus_chunk_documents",
    xc.corpus_chunk_documents,
    xc.CORPUS_CHUNK_SQL,
    ("corpus", "chunking"),
)
register(
    "corpus_export_suite",
    xc.corpus_export_suite,
    xc.CORPUS_EXPORT_SUITE_SQL,
    ("corpus", "sampling", "export"),
)
register(
    "corpus_lm_quality",
    xc.corpus_lm_quality,
    xc.CORPUS_LM_QUALITY_SQL,
    ("corpus", "quality", "lm"),
)
register(
    "correlated_above_avg_orders",
    aq.correlated_above_avg_orders,
    aq.CORRELATED_ABOVE_AVG_SQL,
    ("subquery",),
)
register(
    "customer_rolling_7d_spend",
    aq.customer_rolling_7d_spend,
    aq.CUSTOMER_ROLLING_7D_SQL,
    ("window", "range-frame", "temporal"),
)
register(
    "customer_running_spend",
    rq.customer_running_spend,
    rq.CUSTOMER_RUNNING_SPEND_SQL,
    ("window",),
)
register(
    "customer_spend_slope",
    aq.customer_spend_slope,
    aq.CUSTOMER_SPEND_SLOPE_SQL,
    ("agg", "regression"),
)
register(
    "dedup_exact_documents", xq.dedup_exact_documents, xq.DEDUP_EXACT_SQL, ("dedup",)
)
register(
    "dedup_ngram_jaccard",
    xq.dedup_ngram_jaccard,
    xq.DEDUP_NGRAM_JACCARD_SQL,
    ("dedup", "all-pairs", "bounded-baseline"),
)
register("derived_lineitem", cq.derived_lineitem, cq.DERIVED_LINEITEM_SQL, ("derived",))
register("drop_missing_events", cq.drop_missing_events, cq.DROP_MISSING_SQL, ("nulls",))
register("events_hourly_rollup", rq.events_hourly_rollup, rq.EVENTS_HOURLY_SQL, ("agg",))
register(
    "events_sessionize",
    rq.events_sessionize,
    rq.EVENTS_SESSIONIZE_SQL,
    ("window", "session"),
)
register(
    "explode_document_tokens",
    rq.explode_document_tokens,
    rq.EXPLODE_TOKENS_SQL,
    ("explode",),
)
register(
    "graph_degree_profile",
    gq.graph_degree_profile,
    gq.GRAPH_DEGREE_PROFILE_SQL,
    ("graph", "degree"),
)
register(
    "graph_triangle_count",
    gq.graph_triangle_count,
    gq.GRAPH_TRIANGLE_COUNT_SQL,
    ("graph", "triangles"),
)
register(
    "grouping_sets_orders",
    aq.grouping_sets_orders,
    aq.GROUPING_SETS_ORDERS_SQL,
    ("grouping-sets", "merged-variants"),
)
register(
    "incremental_semdedup_fresh",
    gq.incremental_semdedup_fresh,
    gq.INCREMENTAL_SEMDEDUP_SQL,
    ("dedup", "incremental", "similarity", "semdedup", "index-screen"),
)
register(
    "interpolate_events", cq.interpolate_events, cq.INTERPOLATE_SQL, ("nulls", "window")
)
register(
    "ivm_spend_refresh",
    rq.ivm_spend_refresh,
    rq.IVM_SPEND_REFRESH_SQL,
    ("sink", "ivm", "incremental"),
)
register("json_extract_events", rq.json_extract_events, rq.JSON_EXTRACT_SQL, ("json",))
register(
    "kmeans_suite",
    gq.kmeans_suite,
    gq.KMEANS_SUITE_SQL,
    ("similarity", "iterative", "multi-round", "merged-variants"),
)
register(
    "manifest_pruned_orders",
    rq.manifest_pruned_orders,
    rq.MANIFEST_PRUNED_SQL,
    ("layout", "manifest", "data-skipping", "agg"),
)
register(
    "map_functions_events", fq.map_functions_events, fq.MAP_FUNCTIONS_SQL, ("map",)
)
register(
    "minhash_cluster_suite",
    gq.minhash_cluster_suite,
    gq.MINHASH_CLUSTER_SUITE_SQL,
    ("dedup", "lsh", "graph", "iterative", "merged-variants"),
)
register(
    "normalize_strings_customer",
    cq.normalize_strings_customer,
    cq.NORMALIZE_STRINGS_SQL,
    ("strings",),
)
register("pivot_orders", aq.pivot_orders, aq.PIVOT_ORDERS_SQL, ("pivot",))
register("pricing_summary", rq.pricing_summary, rq.PRICING_SUMMARY_SQL, ("agg",))
register(
    "q3_shipping_priority",
    aq.q3_shipping_priority,
    aq.Q3_SHIPPING_PRIORITY_SQL,
    ("join", "agg", "topk"),
)
register(
    "region_nation_list",
    aq.region_nation_list,
    aq.REGION_NATION_LIST_SQL,
    ("agg", "string-agg"),
)
register(
    "salted_rollup_events",
    rq.salted_rollup_events,
    rq.SALTED_ROLLUP_SQL,
    ("agg", "skew", "salted"),
)
register(
    "scalar_functions_part",
    gq.scalar_functions_part,
    gq.SCALAR_FUNCTIONS_SQL,
    ("scalar",),
)
register("scd2_customer", fq.scd2_customer, fq.SCD2_CUSTOMER_SQL, ("sink", "scd2"))
register(
    "semdedup_suite",
    gq.semdedup_suite,
    gq.SEMDEDUP_SUITE_SQL,
    ("dedup", "similarity", "semdedup", "merged-variants"),
)
register(
    "sql_api_params",
    rq.sql_api_params,
    rq.SQL_API_PARAMS_SQL,
    ("sql", "params"),
)
register(
    "struct_flatten_roundtrip",
    rq.struct_flatten_roundtrip,
    rq.STRUCT_FLATTEN_SQL,
    ("struct",),
)
register(
    "text_analysis_suite",
    xq.text_analysis_suite,
    xq.TEXT_ANALYSIS_SUITE_SQL,
    ("text", "merged-variants"),
)
register("top_orders", rq.top_orders, rq.TOP_ORDERS_SQL, ("sort", "limit"))
register("upsert_orders", rq.upsert_orders, rq.UPSERT_ORDERS_SQL, ("sink", "merge"))
register("validate_orders", cq.validate_orders, cq.VALIDATE_ORDERS_SQL, ("validation",))

# --- 51-97: the r12-green fresh remainder (freshest evidence, lowest
# --- re-check urgency; rotates back into the window at r14) minus the
# --- retired corpus_decontaminate --------------------------------------
register(
    "incremental_dedup_suite",
    xq.incremental_dedup_suite,
    xq.INCREMENTAL_DEDUP_SUITE_SQL,
    ("dedup", "incremental", "merged-variants", "banded-index"),
)
register(
    "quality_calibrate_domains",
    xc.quality_calibrate_domains,
    xc.QUALITY_CALIBRATE_DOMAINS_SQL,
    ("corpus", "quality", "calibration", "bucketed-rank"),
)
register(
    "agg_cardinality_lineitem",
    rq.agg_cardinality_lineitem,
    rq.AGG_CARDINALITY_SQL,
    ("agg",),
)
register(
    "bloom_semi_lineitem",
    rq.bloom_semi_lineitem,
    rq.BLOOM_SEMI_SQL,
    ("join", "semi", "bloom", "runtime-filter"),
)
register(
    "cascade_delete_orders",
    rq.cascade_delete_orders,
    rq.CASCADE_DELETE_SQL,
    ("sink", "referential-action"),
)
register(
    "corpus_cluster_reps",
    xc.corpus_cluster_reps,
    xc.CORPUS_CLUSTER_REPS_SQL,
    ("corpus", "dedup", "iterative"),
)
register(
    "corpus_pack_sequences",
    xc.corpus_pack_sequences,
    xc.CORPUS_PACK_SQL,
    ("corpus", "packing", "window"),
)
register(
    "corpus_quality_funnel",
    xc.corpus_quality_funnel,
    xc.CORPUS_QUALITY_FUNNEL_SQL,
    ("corpus", "quality", "fused-agg"),
)
register(
    "corpus_repetition",
    xc.corpus_repetition,
    xc.CORPUS_REPETITION_SQL,
    ("corpus", "quality"),
)
register(
    "corpus_tfidf_topk",
    xc.corpus_tfidf_topk,
    xc.CORPUS_TFIDF_SQL,
    ("corpus", "text", "topk"),
)
register(
    "dedup_embedding_cosine",
    xq.dedup_embedding_cosine,
    xq.DEDUP_EMBEDDING_COSINE_SQL,
    ("dedup", "similarity", "all-pairs", "bounded-baseline"),
)
register(
    "dedup_simhash_suite",
    xq.dedup_simhash_suite,
    xq.DEDUP_SIMHASH_SUITE_SQL,
    ("dedup", "simhash", "banded", "merged-variants"),
)
register(
    "dedup_variants_lineitem",
    cq.dedup_variants_lineitem,
    cq.DEDUP_VARIANTS_SQL,
    ("dedup", "merged-variants"),
)
register(
    "embedding_retrieval_suite",
    gq.embedding_retrieval_suite,
    gq.EMBEDDING_RETRIEVAL_SUITE_SQL,
    ("similarity", "ann", "ivf", "topk", "merged-variants"),
)
register(
    "events_gapfill_hourly",
    aq.events_gapfill_hourly,
    aq.EVENTS_GAPFILL_SQL,
    ("temporal", "gapfill", "locf"),
)
register(
    "events_zscore_outliers",
    aq.events_zscore_outliers,
    aq.EVENTS_ZSCORE_SQL,
    ("agg", "anomaly"),
)
register(
    "ffill_bfill_events",
    cq.ffill_bfill_events,
    cq.FFILL_BFILL_SQL,
    ("nulls", "window", "merged-variants"),
)
register(
    "fill_strategies_events",
    cq.fill_strategies_events,
    cq.FILL_STRATEGIES_SQL,
    ("nulls", "merged-variants"),
)
register(
    "funnel_events",
    aq.funnel_events,
    aq.FUNNEL_EVENTS_SQL,
    ("agg", "funnel", "fused-agg"),
)
register(
    "group_quantiles_events",
    aq.group_quantiles_events,
    aq.GROUP_QUANTILES_SQL,
    ("agg", "quantile", "per-group"),
)
register(
    "histogram_orders",
    rq.histogram_orders,
    rq.HISTOGRAM_ORDERS_SQL,
    ("profile", "histogram"),
)
register(
    "ngram_frequencies",
    gq.ngram_frequencies,
    gq.NGRAM_FREQUENCIES_SQL,
    ("text", "topk"),
)
register(
    "order_value_deciles",
    aq.order_value_deciles,
    aq.ORDER_VALUE_DECILES_SQL,
    ("agg", "quantile", "discretizer", "exact-selection"),
)
register(
    "pii_redact_customer",
    xc.pii_redact_customer,
    xc.PII_REDACT_SQL,
    ("corpus", "pii", "strings"),
)
register("profile_lineitem", rq.profile_lineitem, rq.PROFILE_LINEITEM_SQL, ("profile",))
register(
    "quantiles_lineitem", aq.quantiles_lineitem, aq.QUANTILES_LINEITEM_SQL, ("agg",)
)
register(
    "repeat_orders_7d",
    aq.repeat_orders_7d,
    aq.REPEAT_ORDERS_7D_SQL,
    ("join", "range", "temporal"),
)
register(
    "rfm_segments",
    aq.rfm_segments,
    aq.RFM_SEGMENTS_SQL,
    ("window", "segmentation", "exact-selection"),
)
register(
    "semdedup_routed_pairs",
    gq.semdedup_routed_pairs,
    gq.SEMDEDUP_ROUTED_PAIRS_SQL,
    ("dedup", "similarity", "ivf", "semdedup", "routing"),
)
register(
    "semdedup_trained_pairs",
    gq.semdedup_trained_pairs,
    gq.SEMDEDUP_TRAINED_PAIRS_SQL,
    ("dedup", "similarity", "ivf", "semdedup", "iterative"),
)
register(
    "set_semi_anti_ops",
    aq.set_semi_anti_ops,
    aq.SET_SEMI_ANTI_OPS_SQL,
    ("set-ops", "join", "merged-variants"),
)
register(
    "sketch_bounds_events",
    aq.sketch_bounds_events,
    aq.SKETCH_BOUNDS_EVENTS_SQL,
    ("agg", "sketch", "bounds-twin"),
)
register(
    "supplier_pagerank",
    gq.supplier_pagerank,
    gq.SUPPLIER_PAGERANK_SQL,
    ("graph", "iterative", "multi-round"),
)
register(
    "tpch_join_suite",
    aq.tpch_join_suite,
    aq.TPCH_JOIN_SUITE_SQL,
    ("join", "agg", "merged-variants", "ratio", "multi-role-dim"),
)
register(
    "unpivot_lineitem",
    aq.unpivot_lineitem,
    aq.UNPIVOT_LINEITEM_SQL,
    ("reshape", "unpivot"),
)
register(
    "upsert_bloom_orders",
    rq.upsert_bloom_orders,
    rq.UPSERT_BLOOM_SQL,
    ("sink", "merge", "bloom", "invariance-twin"),
)
register(
    "window_time_orders",
    aq.window_time_orders,
    aq.WINDOW_TIME_ORDERS_SQL,
    ("window", "scalar", "time", "merged-variants"),
)
register(
    "zorder_orders",
    rq.zorder_orders,
    rq.ZORDER_ORDERS_SQL,
    ("layout", "zorder", "data-skipping"),
)
register(
    "corpus_split_suite",
    gq.corpus_split_suite,
    gq.CORPUS_SPLIT_SUITE_SQL,
    ("corpus", "split", "suite", "graph"),
)
register(
    "bpe_encode_documents",
    xc.bpe_encode_documents,
    xc.BPE_ENCODE_SQL,
    ("corpus", "tokenize", "bpe"),
)
register(
    "corpus_span_dedup",
    xc.corpus_span_dedup,
    xc.CORPUS_SPAN_DEDUP_SQL,
    ("corpus", "dedup", "span"),
)
register(
    "training_corpus_report",
    xc.training_corpus_report,
    xc.TRAINING_CORPUS_REPORT_SQL,
    ("corpus", "capstone", "lineage", "composition"),
)
register(
    "corpus_mix_suite",
    xc.corpus_mix_suite,
    xc.CORPUS_MIX_SUITE_SQL,
    ("corpus", "sampling", "merged-variants"),
)
register(
    "ann_assign_suite",
    gq.ann_assign_suite,
    gq.ANN_ASSIGN_SUITE_SQL,
    ("similarity", "ivf", "routing", "iterative", "merged-variants"),
)
register(
    "pq_suite",
    gq.pq_suite,
    gq.PQ_SUITE_SQL,
    ("similarity", "pq", "compression"),
)
register(
    "ivfpq_suite",
    gq.ivfpq_suite,
    gq.IVFPQ_SUITE_SQL,
    ("similarity", "ivf", "pq", "ann"),
)
register(
    "incremental_pq_fresh",
    gq.incremental_pq_fresh,
    gq.INCREMENTAL_PQ_SQL,
    ("dedup", "similarity", "pq", "incremental"),
)

# --- 98: rows-only specs (no oracle by design) last --------------------
register(
    "sketch_aggregates_events",
    aq.sketch_aggregates_events,
    None,
    ("agg", "sketch", "rows-only"),
)
