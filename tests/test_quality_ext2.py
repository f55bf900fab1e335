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
