"""Warehouse analytics, r9 wave: distribution-shift testing, rank
correlation, and curriculum export ordering.

Three standing workloads the inventory did not yet cover:

- two-sample Kolmogorov-Smirnov test (the CDF-distance complement to
  the chi-square / Mann-Whitney pair already shipped: KS localizes
  WHERE two length distributions diverge, not just whether);
- Spearman rank correlation with midrank ties (the nonparametric
  "does length track token count / quality?" monotone-association
  check run before trusting one as a proxy for the other);
- deterministic curriculum export order (difficulty-staged training
  order with an engine-independent within-stage shuffle — the
  curriculum-learning counterpart of the shard manifest).

Determinism follows the repo conventions (STRICT_SWEEP.md): every
count, prefix count, and doubled midrank is integer arithmetic
accumulated exactly (bigint / DECIMAL); cross-multiplied CDF gaps stay
integral until one final division of identical operands; the only
transcendental (the KS tail probability's exp) is computed from
bit-identical inputs and rounded to 9 dp, the same device
q_quality_lognormal_fit ships. No raw double ever folds.

Reference parity note: the reference system (Flash-CDC) has no
analytics surface — these extend the north-star LLM-pipeline scope
(SURVEY.md §2.9 extension families), not §2.1-2.7 parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flash_cdc_spark.operators.global_order import (
    global_ntile,
    with_global_order,
)
from flash_cdc_spark.queries import query
from flash_cdc_spark.queries.analytics_ext6 import _MW_SRC_A, _MW_SRC_B
from flash_cdc_spark.tables import load_table

# Knuth multiplicative hash — same constant and modulus as the shard
# manifest (analytics_ext6._SHARD_MULT) so the two export orders are
# mutually consistent and engine-independent.
_CURR_MULT = 2654435761
_CURR_STAGES = 4

# ---------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov test
# ---------------------------------------------------------------------


@query(
    "q_stats_ks_test",
    oracle=f"""
    WITH per_v AS (
        SELECT n_chars,
               CAST(sum(CASE WHEN source = '{_MW_SRC_A}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cnt_a,
               CAST(sum(CASE WHEN source = '{_MW_SRC_B}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cnt_b
        FROM documents
        WHERE source IN ('{_MW_SRC_A}', '{_MW_SRC_B}')
        GROUP BY n_chars
    ),
    cum AS (
        SELECT n_chars,
               sum(cnt_a) OVER (ORDER BY n_chars
                                ROWS UNBOUNDED PRECEDING) AS cum_a,
               sum(cnt_b) OVER (ORDER BY n_chars
                                ROWS UNBOUNDED PRECEDING) AS cum_b
        FROM per_v
    ),
    tot AS (
        SELECT CAST(sum(cnt_a) AS DECIMAL(19, 0)) AS n_a,
               CAST(sum(cnt_b) AS DECIMAL(19, 0)) AS n_b
        FROM per_v
    ),
    gaps AS (
        SELECT c.n_chars, t.n_a, t.n_b,
               abs(CAST(c.cum_a AS DECIMAL(19, 0)) * t.n_b
                   - CAST(c.cum_b AS DECIMAL(19, 0)) * t.n_a) AS dnum
        FROM cum c CROSS JOIN tot t
    ),
    best AS (
        SELECT min(n_chars) AS d_at_value,
               max(n_a)     AS n_a,
               max(n_b)     AS n_b,
               max(dnum)    AS d_num
        FROM gaps
        WHERE dnum = (SELECT max(dnum) FROM gaps)
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(d_num AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d_stat,
           CAST(d_at_value AS BIGINT) AS d_at_value,
           round(
               least(1.0,
                     2 * exp(-2
                             * (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                                / (CAST(n_a AS DOUBLE)
                                   + CAST(n_b AS DOUBLE)))
                             * (CAST(d_num AS DOUBLE)
                                / (CAST(n_a AS DOUBLE)
                                   * CAST(n_b AS DOUBLE)))
                             * (CAST(d_num AS DOUBLE)
                                / (CAST(n_a AS DOUBLE)
                                   * CAST(n_b AS DOUBLE))))),
               9) AS p_approx
    FROM best
    """,
)
def q_stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test (Kolmogorov 1933, Smirnov
    1939) on the document-length distributions of two sources: the
    supremum CDF distance D, the length value where it is attained
    (WHERE the distributions diverge — the actionable part for a
    curation pipeline), and the asymptotic two-sided tail probability
    2·exp(−2·m·D²), m = n_a·n_b/(n_a+n_b).

    Determinism: the CDF gap stays INTEGRAL — |cum_a·n_b − cum_b·n_a|
    in DECIMAL(19,0)×DECIMAL(19,0) cross-multiplication — so the max
    and its argmin location are exact; D divides identical integers as
    doubles, and the one transcendental (exp) computes from those
    bit-identical doubles and rounds to 9 dp (the lognormal-fit
    device).

    Scale: one corpus scan contracts to the per-VALUE relation
    (distinct n_chars ≪ rows); the exclusive prefix count runs through
    :func:`with_global_order`'s two-phase cumsum on that bounded
    relation (no single-partition window); the argmax is a broadcast
    of a 1-row aggregate. Same shape as ``q_stats_mann_whitney``.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(_MW_SRC_A, _MW_SRC_B)
    )
    per_v = d.groupBy("n_chars").agg(
        F.sum((F.col("source") == _MW_SRC_A).cast("bigint")).alias("cnt_a"),
        F.sum((F.col("source") == _MW_SRC_B).cast("bigint")).alias("cnt_b"),
    )
    cum = with_global_order(
        per_v,
        [F.col("n_chars").asc()],
        sums={"cum_a": F.col("cnt_a"), "cum_b": F.col("cnt_b")},
    )
    tot = per_v.agg(
        F.sum("cnt_a").cast("decimal(19,0)").alias("n_a"),
        F.sum("cnt_b").cast("decimal(19,0)").alias("n_b"),
    )
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "n_chars",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a").cast("decimal(19,0)") * F.col("n_b")
            - F.col("cum_b").cast("decimal(19,0)") * F.col("n_a")
        ).alias("dnum"),
    )
    dmax = gaps.agg(F.max("dnum").alias("d_max"))
    best = (
        gaps.crossJoin(F.broadcast(dmax))
        .filter(F.col("dnum") == F.col("d_max"))
        .agg(
            F.min("n_chars").alias("d_at_value"),
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max("dnum").alias("d_num"),
        )
    )
    na_d = F.col("n_a").cast("double")
    nb_d = F.col("n_b").cast("double")
    d_stat = F.col("d_num").cast("double") / (na_d * nb_d)
    m = na_d * nb_d / (na_d + nb_d)
    return best.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        d_stat.alias("d_stat"),
        F.col("d_at_value").cast("bigint").alias("d_at_value"),
        F.round(
            F.least(F.lit(1.0), 2 * F.exp(-2 * m * d_stat * d_stat)), 9
        ).alias("p_approx"),
    )


# ---------------------------------------------------------------------
# Spearman rank correlation (midrank ties)
# ---------------------------------------------------------------------


@query(
    "q_stats_spearman_corr",
    oracle="""
    WITH base AS (
        SELECT doc_id, n_chars AS x,
               CAST(len(list_filter(string_split(text, ' '),
                                    t -> t <> '')) AS BIGINT) AS y
        FROM documents
    ),
    rx AS (
        SELECT x,
               2 * (sum(cnt) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                    - cnt) + cnt + 1 AS drx
        FROM (SELECT x, CAST(count(*) AS BIGINT) AS cnt
              FROM base GROUP BY x)
    ),
    ry AS (
        SELECT y,
               2 * (sum(cnt) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
                    - cnt) + cnt + 1 AS dry
        FROM (SELECT y, CAST(count(*) AS BIGINT) AS cnt
              FROM base GROUP BY y)
    ),
    joined AS (
        SELECT CAST(rx.drx AS DECIMAL(19, 0)) AS drx,
               CAST(ry.dry AS DECIMAL(19, 0)) AS dry
        FROM base b JOIN rx ON rx.x = b.x JOIN ry ON ry.y = b.y
    ),
    sums AS (
        SELECT CAST(count(*) AS DECIMAL(19, 0)) AS n,
               CAST(sum(drx) AS DECIMAL(38, 0)) AS s1,
               CAST(sum(dry) AS DECIMAL(38, 0)) AS s2,
               CAST(sum(drx * drx) AS DECIMAL(38, 0)) AS sxx,
               CAST(sum(dry * dry) AS DECIMAL(38, 0)) AS syy,
               CAST(sum(drx * dry) AS DECIMAL(38, 0)) AS sxy
        FROM joined
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           round(
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))),
               9) AS spearman_rho
    FROM sums
    """,
)
def q_stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (Spearman 1904) between document
    character length and whitespace token count, with midrank tie
    handling — Pearson on midranks, the textbook tie-corrected form.
    The monotone-association check a curation pipeline runs before
    substituting the cheap signal (chars) for the expensive one
    (tokens) in budget accounting.

    Determinism: doubled midranks (2·below + t + 1) are INTEGERS from
    the same exclusive-prefix-count device as ``q_stats_mann_whitney``;
    all five moments accumulate in DECIMAL (exact); rho is one double
    expression over those identical integers, rounded to 9 dp.

    Scale: two per-VALUE contractions (distinct lengths / distinct
    token counts ≪ rows), each prefix-counted through the two-phase
    cumsum on its bounded relation, broadcast-joined back; one final
    1-row moment aggregate. The corpus is scanned twice (once per
    variable join), never shuffled whole.
    """
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").alias("x"),
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        .cast("bigint")
        .alias("y"),
    )

    def doubled_ranks(col: str, out: str) -> DataFrame:
        per_v = base.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        cum = with_global_order(
            per_v, [F.col(col).asc()], sums={"incl": F.col("cnt")}
        )
        return cum.select(
            col,
            (2 * (F.col("incl") - F.col("cnt")) + F.col("cnt") + 1)
            .cast("decimal(19,0)")
            .alias(out),
        )

    joined = (
        base.join(F.broadcast(doubled_ranks("x", "drx")), "x")
        .join(F.broadcast(doubled_ranks("y", "dry")), "y")
        .select("drx", "dry")
    )
    dec38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    sums = joined.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        dec38(F.sum("drx")).alias("s1"),
        dec38(F.sum("dry")).alias("s2"),
        dec38(F.sum(F.col("drx") * F.col("drx"))).alias("sxx"),
        dec38(F.sum(F.col("dry") * F.col("dry"))).alias("syy"),
        dec38(F.sum(F.col("drx") * F.col("dry"))).alias("sxy"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    rho = (dd("n") * dd("sxy") - dd("s1") * dd("s2")) / F.sqrt(
        (dd("n") * dd("sxx") - dd("s1") * dd("s1"))
        * (dd("n") * dd("syy") - dd("s2") * dd("s2"))
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(rho, 9).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------
# Curriculum export order
# ---------------------------------------------------------------------


@query(
    "q_train_curriculum_order",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               n_chars,
               CAST(len(list_filter(string_split(text, ' '),
                                    t -> t <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    staged AS (
        SELECT doc_id, n_tokens,
               CAST(n_chars AS DOUBLE) / n_tokens AS difficulty,
               CAST(ntile({_CURR_STAGES})
                    OVER (ORDER BY CAST(n_chars AS DOUBLE) / n_tokens,
                                   doc_id) AS INT) AS stage,
               ((doc_id * {_CURR_MULT}) % 4294967296) AS shuffle_key
        FROM scored
        WHERE n_tokens > 0
    )
    SELECT doc_id, stage,
           CAST(shuffle_key AS BIGINT) AS shuffle_key,
           round(difficulty, 9) AS difficulty
    FROM staged
    """,
)
def q_train_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum export order (Bengio et al. 2009):
    documents are staged easiest-first by mean word length
    (chars/token — the cheap difficulty proxy), split into
    {_CURR_STAGES} equal curriculum stages, and given an
    engine-independent within-stage shuffle key (the shard manifest's
    Knuth multiplicative hash — NOT ``hash()``, which differs per
    engine). A trainer consumes ORDER BY (stage, shuffle_key, doc_id):
    stages in difficulty order, documents shuffled inside each stage.

    Determinism: difficulty is one double division of exact integers
    (identical both engines, tie-broken by doc_id), the stage is exact
    NTILE arithmetic from the two-phase global rank, and the shuffle
    key is pure bigint arithmetic.

    Scale: one corpus scan; the global difficulty rank runs through
    :func:`with_global_order` (two-phase, no single-partition sort) and
    the NTILE bucket is closed-form from (rank, total); the shuffle key
    is per-row arithmetic. Nothing here grows worse than the scan.
    """
    scored = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "n_chars",
            F.size(
                F.filter(F.split(F.col("text"), " "), lambda t: t != "")
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            (F.col("n_chars").cast("double") / F.col("n_tokens")).alias(
                "difficulty"
            ),
        )
    )
    ranked = with_global_order(
        scored,
        [F.col("difficulty").asc(), F.col("doc_id").asc()],
        rank_col="crank",
    )
    total = scored.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            global_ntile(F.col("crank"), F.col("n_total"), _CURR_STAGES)
            .alias("stage"),
            ((F.col("doc_id") * F.lit(_CURR_MULT)) % F.lit(4294967296))
            .cast("bigint")
            .alias("shuffle_key"),
            F.round("difficulty", 9).alias("difficulty"),
        )
    )
