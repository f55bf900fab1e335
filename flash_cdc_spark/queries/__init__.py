"""Query registry — the driver-facing inventory.

Every implemented operator/query registers here with a Spark
implementation ``(spark, sf_dir) -> DataFrame`` and (when
SQL-expressible) a DuckDB oracle SQL string over the same parquet
tables. ``__spark_entry__.py`` re-exports this registry to the driver.

Registration is side-effect-on-import: importing
:mod:`flash_cdc_spark.queries` pulls in every query module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# Registrations stashed until every module has imported: the round
# driver's correctness gate only evaluates the first 50 registered
# queries, and it reports ``err: no_oracle`` (not a rows-only check)
# for oracle-less entries — so oracle-less queries must never occupy a
# window slot. ``defer=True`` pushes them to the very end.
_DEFERRED: list[tuple[str, Callable[[SparkSession, str], DataFrame], str | None]] = []


def query(name: str, oracle: str | None = None, defer: bool = False):
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (the driver skips the value compare for it — see ``defer``)."""

    def deco(fn):
        if defer:
            _DEFERRED.append((name, fn, oracle))
        else:
            QUERIES[name] = fn
            if oracle is not None:
                ORACLE[name] = oracle
        return fn

    return deco


def _flush_deferred() -> None:
    for name, fn, oracle in _DEFERRED:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
    _DEFERRED.clear()


# Import for registration side effects. Intra-module order still
# determines the relative order of everything OUTSIDE the explicit
# driver window below; the window itself is applied as a final reorder
# (see ``WINDOW``), so module order no longer decides driver slots.
from flash_cdc_spark.queries import changefeed  # noqa: E402,F401
from flash_cdc_spark.queries import llm  # noqa: E402,F401
from flash_cdc_spark.queries import neardup  # noqa: E402,F401
from flash_cdc_spark.queries import events  # noqa: E402,F401
from flash_cdc_spark.queries import streaming_e2e  # noqa: E402,F401
from flash_cdc_spark.queries import scale  # noqa: E402,F401
from flash_cdc_spark.queries import functions_ext  # noqa: E402,F401
from flash_cdc_spark.queries import pandas_udfs  # noqa: E402,F401
from flash_cdc_spark.queries import batch  # noqa: E402,F401
from flash_cdc_spark.queries import batch_ext  # noqa: E402,F401

# r3 additions (their queries now lead the r4 window; see WINDOW).
from flash_cdc_spark.queries import llm_ext  # noqa: E402,F401
from flash_cdc_spark.queries import events_ext  # noqa: E402,F401
from flash_cdc_spark.queries import multimodal_ext  # noqa: E402,F401
from flash_cdc_spark.queries import llm_ext2  # noqa: E402,F401
from flash_cdc_spark.queries import neardup_ext  # noqa: E402,F401

# r4 additions (window slots 1-32 this round).
from flash_cdc_spark.queries import llm_ext3  # noqa: E402,F401
from flash_cdc_spark.queries import maintenance_ext  # noqa: E402,F401
from flash_cdc_spark.queries import curation_ext  # noqa: E402,F401
from flash_cdc_spark.queries import retrieval_ext  # noqa: E402,F401
from flash_cdc_spark.queries import udtf_ext  # noqa: E402,F401

# r5 additions (past-window; r6 rotation candidates).
from flash_cdc_spark.queries import llm_ext4  # noqa: E402,F401
from flash_cdc_spark.queries import quality_ext  # noqa: E402,F401

# ---------------------------------------------------------------------
# r5 driver window (VERDICT r4, next-round item #1).
#
# The round driver value-compares only the FIRST 50 registered queries,
# so which 50 lead the registry is an explicit per-round decision, not
# a side effect of module import order. This round's composition:
#
# * slots 1-32 — the 32 r4-new queries that registered past the window
#   last round (COVERAGE.md ledger rows 71-73 and 124-152): the
#   TPC-H completion six, the curation second wave (exact prefix
#   Jaccard join, SemDeDup, containment, heavy hitters), retrieval
#   (BM25/RRF/NDCG), graph (PageRank, triangles, 64-bit clusters),
#   the two new streaming-executed sinks, the events second wave, and
#   the UDTF. They are the only registered queries with no driver
#   correctness row yet; rotating them in converts their local-oracle
#   + snapshot evidence into driver evidence.
# * slots 33-47 — 15 regression keepers spanning the r5 diff and the
#   scale-risk surfaces: canonical-docs (re-keyed this round — its r4
#   row was vacuous; this row proves non-vacuous driver green),
#   contamination + simhash64 (the two r4 bench-regression watch
#   items), changefeed + Avro decode, MinHash/clusters, IVF ANN,
#   multimodal feature decode, admin pagination (service layer
#   rewired this round), sketches, sessionize, and two
#   streaming-executed drivers.
# * slots 48-50 — batch canaries from the rotation pool
#   (q01/q14/q18 this round; q05/q13 served in r4, q03/q10 in r3).
#
# Everything rotated out stays continuously checked by the local mimic
# (tests/test_oracle.py) AND pinned against the committed
# oracle-fingerprint snapshot (tests/test_oracle_snapshot.py), so a
# regression in the rotated-out surface still fails pytest loudly.
WINDOW: list[str] = [
    # -- r4 past-window queries: first driver rows this round (32) --
    "q_dedup_clusters64",
    "q_dedup_pagerank_centrality",
    "q_dedup_minhash_calibration",
    "q02_min_cost_supplier",
    "q09_product_type_profit",
    "q12_late_shipment_priority",
    "q15_top_supplier",
    "q20_excess_shipments",
    "q22_global_sales_opportunity",
    "q_streaming_feed_outbox",
    "q_events_top_paths",
    "q_streaming_db_upsert",
    "q_events_resample_locf",
    "q_events_peak_concurrency",
    "q_events_rolling_active_users",
    "q_events_value_histogram",
    "q_text_span_dedup",
    "q_text_bigram_perplexity",
    "q_embedding_covariance_topk",
    "q_embedding_top_eigenvector",
    "q_maintenance_compaction",
    "q_quality_constraint_report",
    "q_dedup_prefix_jaccard_join",
    "q_dedup_semdedup",
    "q_events_heavy_hitters",
    "q_train_per_source_sample",
    "q_retrieval_bm25_topk",
    "q_retrieval_hybrid_rrf",
    "q_graph_triangle_count",
    "q_retrieval_ndcg_eval",
    "q_udtf_chunk_digest",
    "q_dedup_containment_pairs",
    # -- regression keepers (15) --
    "q_dedup_canonical_docs",
    "q_train_contamination_check",
    "q_dedup_simhash64_pairs",
    "q_changefeed_flagship",
    "q_envelope_decode_avro",
    "q_dedup_exact_summary",
    "q_dedup_minhash_lsh",
    "q_dedup_clusters",
    "q_sim_ann_ivf_topk",
    "q_multimodal_decode_features",
    "q_admin_filter_paginate",
    "q_events_sketch_accuracy",
    "q_events_sessionize",
    "q_streaming_latest_state",
    "q_streaming_changefeed_e2e",
    # -- batch canaries (3; rotation pool in COVERAGE.md) --
    "q01_pricing_summary",
    "q14_promo_revenue",
    "q18_large_orders",
]

# This round's batch canaries (tail of WINDOW); exported for the
# registry-contract test and COVERAGE.md's rotation history.
CANARIES: list[str] = [
    "q01_pricing_summary",
    "q14_promo_revenue",
    "q18_large_orders",
]


def _apply_window(window: list[str]) -> None:
    """Reorder the registry so ``window`` occupies the first 50 slots;
    everything else follows in its original registration order."""
    missing = [n for n in window if n not in QUERIES]
    if missing:
        raise RuntimeError(f"WINDOW names not registered: {missing}")
    in_window = set(window)
    new_order = window + [n for n in QUERIES if n not in in_window]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for n in new_order:
        QUERIES[n] = snapshot[n]


_apply_window(WINDOW)

# Oracle-less (rows-only) queries land after every oracle-backed one.
_flush_deferred()

__all__ = ["QUERIES", "ORACLE", "query", "CANARIES", "WINDOW"]
