"""Adversarial-fixture oracle checks (ADVICE r2): cases the driver's
standard corpus never exercises, where the Spark query and its DuckDB
oracle could silently diverge."""

from __future__ import annotations

import duckdb

from tests.oracle_harness import compare


def test_tfidf_null_text_doc_matches_oracle(spark, tmp_path):
    """A NULL-text (or empty-text) document must count toward the IDF
    denominator N identically on both engines (ADVICE r2: the old
    oracle used count(*) FROM documents while Spark counted tokenized
    docs — a NULL text skewed every IDF score)."""
    rows = [
        (1, "web", "spark rows shuffle spark"),
        (2, "web", None),  # the adversarial row
        (3, "books", "shuffle free narrow pass"),
        (4, "books", "spark shuffle"),
        (5, "wiki", ""),  # empty string tokenizes to one '' token
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    r = compare("q_text_tfidf_top_terms", spark, str(tmp_path), con)
    assert r["ok"], r


def test_asof_fixture_has_no_user_ts_duplicates(spark, sf_dir):
    """q_events_asof_join's tie semantics (window ORDER BY ts, event_id
    vs DuckDB ASOF ts >= ts) only coincide when no two events share
    (user_id, ts) — pin that corpus invariant at both driver SFs
    (ADVICE r2)."""
    from flash_cdc_spark.tables import load_table

    for sf in (sf_dir, "/root/testdata/sf0.01"):
        e = load_table(spark, sf, "events")
        dup = (
            e.groupBy("user_id", "ts")
            .count()
            .filter("count > 1")
            .limit(1)
            .collect()
        )
        assert not dup, f"(user_id, ts) duplicate in {sf}: {dup}"
