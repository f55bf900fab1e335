"""Semantic units for the r6 model-adjacent operators: NB classifier
beats chance and partitions the corpus, PSI is ~0 on a stable
distribution and large under a real shift, negative-sampling table is
a valid distribution prefix, hard negatives never share the anchor's
label."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flash_cdc_spark.queries.quality_ext2 import (
    q_quality_nb_classifier,
    q_quality_psi_drift,
    q_retrieval_hard_negatives,
    q_train_negative_sampling,
)


def test_nb_confusion_partitions_and_beats_chance(spark, sf_dir):
    from flash_cdc_spark.tables import load_table

    out = q_quality_nb_classifier(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in out)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert total == n_docs  # every doc classified exactly once
    n_sources = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    diag = sum(r["n_docs"] for r in out if r["true_source"] == r["predicted"])
    # NB on a shared synthetic vocab won't be great, but it must beat
    # 2x chance or the likelihoods aren't doing anything.
    assert diag / total > 2.0 / n_sources


def _write_events(spark, tmp_path, name, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tmp_path / name
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    return str(d)


def test_psi_near_zero_on_stable_and_large_on_shift(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    mid = dt.datetime(2024, 1, 16)
    stable, shifted = [], []
    eid = 0
    for half_start, off in ((base, 0), (mid, 0)):
        for i in range(300):
            stable.append((eid, half_start + dt.timedelta(minutes=i), 1,
                           "t", float(10 + (i * 37) % 100), "{}"))
            eid += 1
    for half_start, off in ((base, 0), (mid, 500)):
        for i in range(300):
            shifted.append((eid, half_start + dt.timedelta(minutes=i), 1,
                            "t", float(10 + off + (i * 37) % 100), "{}"))
            eid += 1
    d_stable = _write_events(spark, tmp_path, "stable", stable)
    d_shift = _write_events(spark, tmp_path, "shift", shifted)
    psi_stable = q_quality_psi_drift(spark, d_stable).collect()[0]["psi"]
    psi_shift = q_quality_psi_drift(spark, d_shift).collect()[0]["psi"]
    assert psi_stable < 0.01
    assert psi_shift > 1.0  # total mass displacement


def test_negative_sampling_is_distribution_prefix(spark, sf_dir):
    out = sorted(
        q_train_negative_sampling(spark, sf_dir).collect(), key=lambda r: r["rk"]
    )
    assert len(out) == 30
    counts = [r["count"] for r in out]
    assert counts == sorted(counts, reverse=True)
    cums = [r["cum_p"] for r in out]
    assert all(b >= a for a, b in zip(cums, cums[1:]))
    assert cums[-1] <= 1.0 + 1e-6
    # 3/4 power flattens: top word's share of p must be LESS than its
    # share of raw counts.
    from flash_cdc_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    tok_total = d.select(
        F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "").count()
    raw_share = counts[0] / tok_total
    assert out[0]["p"] < raw_share


def test_hard_negatives_exclude_anchor_label(spark, sf_dir):
    out = q_retrieval_hard_negatives(spark, sf_dir).collect()
    assert len(out) == 25  # 5 anchors x top-5
    for r in out:
        assert r["neighbor_label"] != r["query_label"]
        assert -1.000001 <= r["cosine"] <= 1.000001
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rk"])
        cos = [r["cosine"] for r in rows]
        assert cos == sorted(cos, reverse=True)


# ------------------------- batch 7 (corpus analysis) -------------------------


def test_ngram_novelty_detects_injected_duplicates(spark, sf_dir, tmp_path):
    """Duplicating a slice of docs drives their novelty to ~0 (every
    gram now appears in the copy), dragging the per-source minimum
    down — the boilerplate-detection property."""
    from flash_cdc_spark.queries.corpus_ext import q_text_ngram_novelty
    from flash_cdc_spark.tables import load_table

    d = tmp_path / "dups"
    d.mkdir()
    docs = load_table(spark, sf_dir, "documents")
    clones = (
        docs.filter(F.col("doc_id") < 10)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    docs.unionByName(clones).write.parquet(str(d / "documents.parquet"))
    out = {r["source"]: r for r in q_text_ngram_novelty(spark, str(d)).collect()}
    cloned_sources = {
        r["source"] for r in docs.filter(F.col("doc_id") < 10)
        .select("source").distinct().collect()
    }
    assert any(out[s]["min_novelty"] == 0.0 for s in cloned_sources)
    assert sum(r["n_boilerplate_docs"] for r in out.values()) >= 10


def test_source_jsd_bounded_and_self_similarity(spark, sf_dir, tmp_path):
    """JSD is within (0, ln 2]; and a source split into two halves has
    LOWER divergence between its halves than between genuinely
    different sources — the redundancy-detection property."""
    import math

    from flash_cdc_spark.queries.corpus_ext import q_text_source_jsd
    from flash_cdc_spark.tables import load_table

    out = q_text_source_jsd(spark, sf_dir).collect()
    assert len(out) == 10
    for r in out:
        assert 0.0 < r["jsd"] <= math.log(2) + 1e-9
    # constructed corpus with genuinely different vocabularies: two
    # same-language sources (xa/xb) and one different-language source
    # (y) — xa↔xb must be the least divergent pair. (The fixture's
    # synthetic sources all share ONE vocabulary distribution, so
    # their pairwise JSD is pure sampling noise and no ordering there
    # is a property; hence the constructed corpus.)
    d = tmp_path / "split"
    d.mkdir()
    rows = []
    did = 0
    for src, words in (
        ("xa", "alpha beta gamma delta"),
        ("xb", "beta alpha delta gamma"),
        ("y", "omega sigma tau rho"),
    ):
        for i in range(10):
            text = " ".join((words + " ").split() * 3)
            rows.append((did, text, "en", src, len(text)))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    out2 = sorted(q_text_source_jsd(spark, str(d)).collect(), key=lambda r: r["rk"])
    assert len(out2) == 3
    assert {out2[0]["source_a"], out2[0]["source_b"]} == {"xa", "xb"}
    assert out2[0]["jsd"] < out2[1]["jsd"]


# ------------------------- batch 8 (training prep) -------------------------


def test_epoch_allocation_caps_and_budget(spark, sf_dir):
    from flash_cdc_spark.queries.training_ext import q_train_epoch_allocation
    from flash_cdc_spark.tables import load_table

    out = q_train_epoch_allocation(spark, sf_dir).collect()
    n_sources = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(out) == n_sources
    for r in out:
        assert 0.0 < r["epochs"] <= 4.0
        assert abs(r["allocated_tokens"] - r["epochs"] * r["toks"]) <= 1
    # uncapped total allocation would be exactly 2x the corpus; caps
    # can only reduce it
    total_alloc = sum(r["allocated_tokens"] for r in out)
    total_toks = sum(r["toks"] for r in out)
    assert total_alloc <= 2 * total_toks + len(out)


def test_embedding_outliers_detect_injected_garbage(spark, sf_dir, tmp_path):
    """A vector with one dimension at 100x the corpus scale must rank
    first."""
    from flash_cdc_spark.queries.training_ext import q_embedding_outliers
    from flash_cdc_spark.tables import load_table

    d = tmp_path / "emb"
    d.mkdir()
    e = load_table(spark, sf_dir, "embeddings")
    bad = e.limit(1).select(
        F.lit(9_999_999).cast("bigint").alias("vec_id"),
        F.transform("embedding", lambda x: x * 100.0).alias("embedding"),
        F.lit(99).cast("int").alias("label"),
    )
    e.unionByName(bad).write.parquet(str(d / "embeddings.parquet"))
    out = sorted(q_embedding_outliers(spark, str(d)).collect(), key=lambda r: r["rk"])
    assert out[0]["vec_id"] == 9_999_999


def test_burst_detection_flags_injected_burst(spark, tmp_path):
    import datetime as dt

    from flash_cdc_spark.queries.training_ext import q_events_burst_detection

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(72):
        # 10-12/hour with variation (a constant baseline has sigma=0,
        # which the query rightly excludes), 100 at hour 60
        n = (10 + h % 3) if h != 60 else 100
        for i in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, seconds=i), 1,
                         "t", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tmp_path / "burst"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    out = q_events_burst_detection(spark, str(d)).collect()
    assert len(out) == 1
    assert out[0]["hour_ts"] == base + dt.timedelta(hours=60)
    assert out[0]["n_events"] == 100


def test_interleave_order_round_robins_sources(spark, sf_dir):
    """The first |sources| schedule positions contain each source at
    most... exactly once per pass: pass_idx must be non-decreasing
    with pos, and within pass 1 every source appears once."""
    from flash_cdc_spark.queries.training_ext import q_train_interleave_order
    from flash_cdc_spark.tables import load_table

    out = sorted(
        q_train_interleave_order(spark, sf_dir).collect(), key=lambda r: r["pos"]
    )
    assert [r["pos"] for r in out] == list(range(1, 51))
    passes = [r["pass_idx"] for r in out]
    assert passes == sorted(passes)
    n_sources = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    first_pass = [r["source"] for r in out if r["pass_idx"] == 1]
    assert len(first_pass) == min(n_sources, len(first_pass))
    assert len(set(first_pass)) == len(first_pass)  # no source repeats in a pass


# ------------------------- batch 10 (maintenance) -------------------------


def test_incremental_agg_merge_is_exact(spark, sf_dir):
    from flash_cdc_spark.queries.maintenance_ext2 import (
        q_maintenance_incremental_agg,
    )
    from flash_cdc_spark.tables import load_table

    out = q_maintenance_incremental_agg(spark, sf_dir).collect()
    assert sum(r["mismatch"] for r in out) == 0
    total = sum(r["n_orders"] for r in out)
    assert total == load_table(spark, sf_dir, "orders").count()
    for r in out:
        whole, frac = r["revenue"].split(".")
        assert len(frac) == 2  # decimal, not float repr


def test_watermark_advisor_matches_bruteforce(spark, tmp_path):
    """The advisor's lateness profile equals a pure-python recompute
    of the same jitter-simulated arrival sequence (high-water-mark
    walk + exact linear-interpolation percentile), and the suggested
    watermark is bounded by the 120 s jitter ceiling by construction."""
    import datetime as dt
    import hashlib
    import math

    from flash_cdc_spark.queries.maintenance_ext2 import q_events_watermark_advisor

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=30 * i), 1, "t", 1.0, "{}")
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tmp_path / "late"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    out = q_events_watermark_advisor(spark, str(d)).collect()[0]

    def jitter(eid: int) -> int:
        return int(hashlib.md5(str(eid).encode()).hexdigest()[:8], 16) % 120000

    evs = sorted(
        (int(ts.timestamp() * 1000) + jitter(eid), eid,
         int(ts.timestamp() * 1000)) for eid, ts, *_ in rows
    )
    hwm, lates = None, []
    for _arr, _eid, ts_ms in evs:
        lates.append(max(0, hwm - ts_ms) if hwm is not None else 0)
        hwm = ts_ms if hwm is None else max(hwm, ts_ms)
    lates_sorted = sorted(lates)
    n = len(lates_sorted)
    pos = 0.99 * (n - 1)
    lo, hi = int(pos), min(int(pos) + 1, n - 1)
    p99 = lates_sorted[lo] + (pos - lo) * (lates_sorted[hi] - lates_sorted[lo])

    assert out["n_events"] == 500
    assert out["pct_out_of_order"] == round(
        100.0 * sum(1 for x in lates if x > 0) / n, 4
    )
    assert abs(out["p99_late_s"] - round(p99 / 1000.0, 4)) < 1e-6
    assert out["suggested_watermark_s"] == math.ceil(p99 / 1000.0)
    assert 0 < out["suggested_watermark_s"] <= 120  # jitter ceiling


# ------------------------- batch 11 (data contracts) -------------------------


def test_wilson_lb_below_raw_and_small_n_penalized(spark, sf_dir, tmp_path):
    from flash_cdc_spark.queries.contracts_ext import q_quality_wilson_ranking

    out = q_quality_wilson_ranking(spark, sf_dir).collect()
    for r in out:
        assert r["wilson_lb"] <= r["raw_rate"] + 1e-9
        assert 0.0 <= r["wilson_lb"] <= 1.0
    # 3/3 passing must rank BELOW 970/1000 by lower bound despite the
    # higher raw rate — the property the correction exists for
    rows = [(i, "x", "en", "tiny", 300) for i in range(3)]
    rows += [(100 + i, "x", "en", "big", 300 if i < 970 else 10)
             for i in range(1000)]
    d = tmp_path / "wil"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    out2 = {r["source"]: r for r in q_quality_wilson_ranking(spark, str(d)).collect()}
    assert out2["tiny"]["raw_rate"] == 1.0
    assert out2["tiny"]["wilson_lb"] < out2["big"]["wilson_lb"]


def test_profile_drift_detects_injected_shift(spark, sf_dir, tmp_path):
    """Doubling prices in the 'after' half must move the mean-shift
    z-score far from the clean baseline."""
    from flash_cdc_spark.queries.contracts_ext import q_quality_profile_drift
    from flash_cdc_spark.tables import load_table

    clean = q_quality_profile_drift(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1996-01-01").cast("date")
    shifted = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderdate") >= cut, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice")),
    )
    d = tmp_path / "drift"
    d.mkdir()
    shifted.write.parquet(str(d / "orders.parquet"))
    drifted = q_quality_profile_drift(spark, str(d)).collect()[0]
    assert abs(drifted["price_mean_shift_z"]) > abs(clean["price_mean_shift_z"]) + 1.0
    assert drifted["price_mean_ratio"] > 1.8
