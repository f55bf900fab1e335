"""Semantic unit tests for the r9-new queries — brute-force Python
oracles and structural invariants on top of the DuckDB value compare
(tests/test_oracle.py covers cross-engine equality; these pin the
MEANING)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flash_cdc_spark.operators import multimodal as MM
from flash_cdc_spark.queries import QUERIES
from flash_cdc_spark.queries.analytics_ext6 import _MW_SRC_A, _MW_SRC_B
from flash_cdc_spark.tables import load_table


def test_ks_d_matches_bruteforce_cdf_distance(spark, sf_dir):
    """D must equal the supremum of |F_a - F_b| computed directly from
    the two samples with exact Fraction arithmetic."""
    from fractions import Fraction

    row = QUERIES["q_stats_ks_test"](spark, sf_dir).collect()[0]
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").isin(_MW_SRC_A, _MW_SRC_B))
        .select("source", "n_chars")
        .collect()
    )
    xa = sorted(r["n_chars"] for r in docs if r["source"] == _MW_SRC_A)
    xb = sorted(r["n_chars"] for r in docs if r["source"] == _MW_SRC_B)
    values = sorted(set(xa) | set(xb))
    import bisect

    best, best_v = Fraction(0), None
    for v in values:
        fa = Fraction(bisect.bisect_right(xa, v), len(xa))
        fb = Fraction(bisect.bisect_right(xb, v), len(xb))
        gap = abs(fa - fb)
        if gap > best:
            best, best_v = gap, v
    assert row["n_a"] == len(xa) and row["n_b"] == len(xb)
    d_num = best * len(xa) * len(xb)
    assert d_num.denominator == 1  # the cross-multiplied gap is integral
    assert row["d_stat"] == d_num.numerator / (len(xa) * len(xb))
    assert row["d_at_value"] == best_v
    assert 0.0 <= row["p_approx"] <= 1.0


def test_spearman_matches_scipy_free_bruteforce(spark, sf_dir):
    """rho must equal Pearson correlation of midranks computed with
    plain Python floats on the collected fixture."""
    row = QUERIES["q_stats_spearman_corr"](spark, sf_dir).collect()[0]
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("n_chars", "text")
        .collect()
    )
    xs = [r["n_chars"] for r in docs]
    ys = [len([t for t in r["text"].split(" ") if t != ""]) for r in docs]

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            mid = (i + 1 + j) / 2.0
            for k in range(i, j):
                ranks[order[k]] = mid
            i = j
        return ranks

    rx, ry = midranks(xs), midranks(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    sx = math.sqrt(sum((a - mx) ** 2 for a in rx))
    sy = math.sqrt(sum((b - my) ** 2 for b in ry))
    assert row["n_docs"] == n
    assert abs(row["spearman_rho"] - cov / (sx * sy)) < 1e-6
    assert -1.0 <= row["spearman_rho"] <= 1.0


def test_curriculum_stages_are_balanced_and_monotone(spark, sf_dir):
    """NTILE contract: stage sizes differ by at most 1, stages are
    difficulty-monotone (max difficulty of stage s <= min of s+1 up to
    rank ties), and the shuffle key matches the closed-form hash."""
    rows = QUERIES["q_train_curriculum_order"](spark, sf_dir).collect()
    by_stage: dict[int, list] = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r)
        assert r["shuffle_key"] == (r["doc_id"] * 2654435761) % 4294967296
    sizes = sorted(len(v) for v in by_stage.values())
    assert set(by_stage) == {1, 2, 3, 4}
    assert sizes[-1] - sizes[0] <= 1
    for s in (1, 2, 3):
        hi = max(r["difficulty"] for r in by_stage[s])
        lo = min(r["difficulty"] for r in by_stage[s + 1])
        assert hi <= lo + 1e-9


def test_editdist_verify_flags_match_definition(spark, sf_dir):
    """verified == (levenshtein distance <= 20% of the longer prefix),
    recomputed in Python on a sample of pairs; distances past the
    decision bound (prefix/5 = 25) come back NULL/unverified."""
    rows = QUERIES["q_dedup_editdist_verify"](spark, sf_dir).collect()
    assert rows, "banded candidates exist at fixture scale"

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    texts = {
        r["doc_id"]: r["text"][:128]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    seen_capped = 0
    for r in rows[:40]:
        d = lev(texts[r["doc_a"]], texts[r["doc_b"]])
        maxlen = max(r["len_a"], r["len_b"], 1)
        if d <= 25:
            assert r["edit_dist"] == d
            assert r["verified"] == int(d * 5 <= maxlen)
            assert abs(r["edit_sim"] - (1.0 - d / maxlen)) < 1e-12
        else:  # past the decision bound: NULLed, never verified
            seen_capped += 1
            assert r["edit_dist"] is None
            assert r["edit_sim"] is None
            assert r["verified"] == 0


def test_scene_video_parse_and_cut_semantics(spark, sf_dir):
    """Every clip must report exactly one cut at the synth's scene
    boundary (2 + doc_id % 3) with a positive lift, through the REAL
    frame parse."""
    rows = QUERIES["q_multimodal_scene_cuts"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_frames"] == MM.SCENE_FRAMES
        assert r["n_cuts"] == 1
        assert r["first_cut_frame"] == MM.scene_boundary(r["doc_id"])
        assert r["cut_lift"] > 30


def test_scene_synth_frames_really_parse():
    """parse_pgm_stream must split the scene clip into SCENE_FRAMES
    frames whose raster sums follow the closed form."""
    # The Spark synth path is covered by the query test; here a
    # hand-built clip (same closed form) re-parses through the real
    # header walker.
    did = 7
    b = MM.scene_boundary(did)
    base0, base1 = 40 + (did % 7) * 3, 160 + (did % 5) * 2
    hdr = f"P5\n{MM.PGM_WIDTH} {MM.PGM_HEIGHT}\n255\n".encode()
    blob = b"".join(
        hdr
        + bytes(
            (base0 if f < b else base1)
            + x
            + 2 * y
            + 2 * ((f - 0) if f < b else (f - b))
            for y in range(MM.PGM_HEIGHT)
            for x in range(MM.PGM_WIDTH)
        )
        for f in range(MM.SCENE_FRAMES)
    )
    frames = MM.parse_pgm_stream(blob)
    assert len(frames) == MM.SCENE_FRAMES
    k = sum(
        x + 2 * y for y in range(MM.PGM_HEIGHT) for x in range(MM.PGM_WIDTH)
    )
    npx = MM.PGM_WIDTH * MM.PGM_HEIGHT
    for f, frame in enumerate(frames):
        w, h, _m, raster = MM.parse_pgm(frame)
        base, fs = (base0, 0) if f < b else (base1, b)
        assert sum(raster) == npx * (base + 2 * (f - fs)) + k
