"""Property tests for the r5 operator wave (queries/llm_ext4.py,
operators/layout.py): planted-data guarantees the oracle compare can't
express — Bloom no-false-negatives, attribution ordering, stratum
balance, streaming near-dup exactly-once."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flash_cdc_spark.queries.llm_ext4 import (
    _BLOOM_K,
    _BLOOM_M,
    _bloom_positions_col,
    q_dedup_cross_source_matrix,
    q_events_touch_attribution,
    q_train_contamination_bloom,
    q_train_length_matched_sample,
)


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(os.path.join(path, "documents.parquet"))


def test_bloom_never_misses_true_contamination(spark, sf_dir):
    """No false negatives: every gram the exact join flags must also be
    bloom-flagged (the Bloom bit table is a superset test). Compares
    per-doc hit counts of the bloom audit against the exact audit."""
    from flash_cdc_spark.queries.llm_ext import q_train_contamination_check

    exact = {
        r["doc_id"]: r["n_contaminated"]
        for r in q_train_contamination_check(spark, sf_dir).collect()
    }
    bloom = {
        r["doc_id"]: r["n_bloom_hits"]
        for r in q_train_contamination_bloom(spark, sf_dir).collect()
    }
    assert set(exact) == set(bloom)
    for doc, n_exact in exact.items():
        assert bloom[doc] >= n_exact, (doc, n_exact, bloom[doc])


def test_bloom_positions_shape(spark):
    df = spark.createDataFrame([("hello world",)], "g string").select(
        _bloom_positions_col(F.col("g")).alias("p")
    )
    [row] = df.collect()
    assert len(row["p"]) == _BLOOM_K
    assert all(0 <= p < _BLOOM_M for p in row["p"])


def test_length_matched_sample_strata_are_balanced(spark, sf_dir):
    """Value-based deciles must spread docs roughly evenly (exact
    balance is impossible when many docs share a length — the midpoint
    rule bounds any stratum by the largest length tie group)."""
    out = q_train_length_matched_sample(spark, sf_dir)
    strata = {r["stratum"] for r in out.collect()}
    assert strata <= set(range(10)) and len(strata) >= 5


def test_touch_attribution_ordering(spark, tmp_path):
    """Planted sequence: first/last view resolve by event time with
    event_id tiebreak, purchases before any view are excluded."""
    rows = [
        # user 1: view(10) view(20) purchase(30) view(40) purchase(50)
        (1, "2024-01-01 00:00:10", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 00:00:20", 1, "view", 1.0, "{}"),
        (3, "2024-01-01 00:00:30", 1, "purchase", 9.0, "{}"),
        (4, "2024-01-01 00:00:40", 1, "view", 1.0, "{}"),
        (5, "2024-01-01 00:00:50", 1, "purchase", 9.0, "{}"),
        # user 2: purchase with NO prior view -> excluded
        (6, "2024-01-01 00:01:00", 2, "purchase", 9.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path / "planted")
    df.write.parquet(os.path.join(d, "events.parquet"))
    got = {
        r["purchase_id"]: (r["first_view_id"], r["last_view_id"], r["n_prior_views"])
        for r in q_events_touch_attribution(spark, d).collect()
    }
    assert got == {3: (1, 2, 2), 5: (1, 4, 3)}


def test_cross_source_matrix_counts_pairs_combinatorially(spark, tmp_path):
    """Planted clusters: 3 same-word-set docs in src A + 2 in src B
    must report C(3,2)=3 within-A, C(2,2)=1 within-B, 3*2=6 cross."""
    rows = [
        (1, "a b c", "en", "A", 5),
        (2, "c b a", "en", "A", 5),
        (3, "b a c", "en", "A", 5),
        (4, "a c b", "en", "B", 5),
        (5, "c a b", "en", "B", 5),
        (6, "lonely", "en", "A", 6),
    ]
    d = str(tmp_path / "planted")
    _write_docs(spark, d, rows)
    got = {
        (r["source_a"], r["source_b"]): r["n_dup_pairs"]
        for r in q_dedup_cross_source_matrix(spark, d).collect()
    }
    assert got == {("A", "A"): 3, ("B", "B"): 1, ("A", "B"): 6}


def test_ivf_incremental_totals(spark, sf_dir):
    """Every base and delta vector lands in exactly one cell."""
    from flash_cdc_spark.queries.llm_ext4 import q_sim_ann_ivf_incremental
    from flash_cdc_spark.tables import load_table

    out = q_sim_ann_ivf_incremental(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    n_delta = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 10 == 7
    ).count()
    assert sum(r["n_delta"] for r in out) == n_delta
    assert sum(r["n_base"] for r in out) == n - n_delta


def test_mmr_diversifies_vs_plain_topk(spark, sf_dir):
    """MMR's selected set must be no MORE self-similar than the plain
    relevance top-3 (that is the whole point of the re-ranker), and
    position 1 must equal the plain top-1."""
    from flash_cdc_spark.operators import similarity as SIM
    from flash_cdc_spark.queries.llm_ext4 import q_retrieval_mmr_topk
    from flash_cdc_spark.tables import load_table

    mmr = q_retrieval_mmr_topk(spark, sf_dir).collect()
    by_q = {}
    for r in mmr:
        by_q.setdefault(r["query_id"], {})[r["position"]] = r["doc_id"]

    e = load_table(spark, sf_dir, "embeddings")
    v = SIM.as_double_vec("embedding")
    vecs = e.select("vec_id", v.alias("v"), SIM.l2_norm(v).alias("nrm"))
    probes = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    from pyspark.sql import Window

    scored = vecs.join(
        F.broadcast(probes), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("doc"),
        F.round(
            SIM.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
        ).alias("qcos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), "doc")
    plain = {}
    for r in (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    ):
        plain.setdefault(r["query_id"], {})[r["rk"]] = r["doc"]

    # pairwise cosine between two docs
    vv = {r["vec_id"]: (r["v"], r["nrm"]) for r in vecs.filter(F.col("vec_id") < 2100).collect()}

    def cos(a, b):
        va, na = vv[a]
        vb, nb = vv[b]
        return sum(x * y for x, y in zip(va, vb)) / (na * nb)

    def mean_pair_sim(docs):
        ds = list(docs.values())
        ps = [cos(ds[i], ds[j]) for i in range(3) for j in range(i + 1, 3)]
        return sum(ps) / len(ps)

    for q in by_q:
        assert by_q[q][1] == plain[q][1]  # relevance anchor identical
        assert mean_pair_sim(by_q[q]) <= mean_pair_sim(plain[q]) + 1e-9
