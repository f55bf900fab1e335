"""Warehouse analytics, r8 wave: customer-acquisition accounting,
nonparametric two-sample testing, and parametric distribution fitting.

Three standing workloads a 100 TB warehouse/training-data platform
runs that the inventory did not yet cover:

- monthly NEW vs RETURNING revenue split (the acquisition-vs-retention
  ledger every commerce dashboard leads with);
- Mann-Whitney U rank-sum test (Mann & Whitney 1947) with midrank tie
  handling and the normal approximation — the nonparametric complement
  to the chi-square test for "did this source's length distribution
  shift?" questions where no normality holds;
- per-source log-normal fit of document lengths (method of moments on
  ln x) with predicted-vs-empirical median/p90 — the parametric
  profile curation pipelines use to spot truncated or padded sources.

Cross-engine determinism follows the repo conventions: money and rank
sums accumulate in DECIMAL (exact, associative), transcendental terms
(ln) are rounded to 9 dp before decimal accumulation, and every final
float is computed from operands that are bit-identical on both engines
(IEEE division/sqrt of identical inputs is deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.operators.global_order import with_global_order
from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table

# ---------------------------------------------------------------------
# New vs returning revenue
# ---------------------------------------------------------------------


@query(
    "q_sales_new_vs_returning",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               date_trunc('month', min(o_orderdate)) AS first_month
        FROM orders GROUP BY o_custkey
    ),
    tagged AS (
        SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
               o.o_custkey,
               CAST(o.o_totalprice AS DECIMAL(18, 2)) AS price,
               CASE WHEN date_trunc('month', o.o_orderdate) = f.first_month
                    THEN 1 ELSE 0 END AS is_new
        FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    )
    SELECT month,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active,
           CAST(count(DISTINCT CASE WHEN is_new = 1 THEN o_custkey END)
                AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN is_new = 1 THEN price ELSE 0 END) AS DOUBLE)
               AS revenue_new,
           CAST(sum(CASE WHEN is_new = 0 THEN price ELSE 0 END) AS DOUBLE)
               AS revenue_returning,
           CAST(sum(CASE WHEN is_new = 1 THEN price ELSE 0 END) AS DOUBLE)
               / CAST(sum(price) AS DOUBLE) AS new_share
    FROM tagged GROUP BY month
    """,
)
def q_sales_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split between NEW customers (their first-ever
    order month) and RETURNING ones — the acquisition-vs-retention
    ledger: how much of each month's revenue is bought growth vs
    installed base (a cohort-LTV companion; the classic first-touch
    flag is ``order month == customer's min order month``).

    Determinism: revenue accumulates in DECIMAL(18,2) (exact,
    fold-order-free); the share divides the exact totals as doubles —
    identical operands, identical IEEE quotient on both engines.

    Scale: one per-customer min aggregate (shuffle on custkey), one
    orders⋈firsts join co-partitioned on the same key, one monthly
    aggregate over a bounded month grid. No window, no skew hazard
    (custkey is the natural even key). 100 TB cost = two scans of
    orders.
    """
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("first_month")
    )
    price = F.col("o_totalprice").cast("decimal(18,2)")
    is_new = (
        F.date_trunc("month", F.col("o_orderdate")) == F.col("first_month")
    ).cast("int")
    tagged = o.join(firsts, "o_custkey").select(
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month"),
        "o_custkey",
        price.alias("price"),
        is_new.alias("is_new"),
    )
    new_rev = F.sum(F.when(F.col("is_new") == 1, F.col("price")).otherwise(F.lit(0).cast("decimal(18,2)")))
    ret_rev = F.sum(F.when(F.col("is_new") == 0, F.col("price")).otherwise(F.lit(0).cast("decimal(18,2)")))
    return tagged.groupBy("month").agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.countDistinct(
            F.when(F.col("is_new") == 1, F.col("o_custkey"))
        ).alias("n_new"),
        new_rev.cast("double").alias("revenue_new"),
        ret_rev.cast("double").alias("revenue_returning"),
        (new_rev.cast("double") / F.sum("price").cast("double")).alias(
            "new_share"
        ),
    )


# ---------------------------------------------------------------------
# Mann-Whitney U rank-sum test
# ---------------------------------------------------------------------

_MW_SRC_A = "src0"
_MW_SRC_B = "src1"


@query(
    "q_stats_mann_whitney",
    oracle=f"""
    WITH pool AS (
        SELECT n_chars,
               CASE WHEN source = '{_MW_SRC_A}' THEN 1 ELSE 0 END AS a
        FROM documents WHERE source IN ('{_MW_SRC_A}', '{_MW_SRC_B}')
    ),
    per_v AS (
        SELECT n_chars,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(a) AS BIGINT) AS cnt_a
        FROM pool GROUP BY n_chars
    ),
    cum AS (
        SELECT n_chars, cnt, cnt_a,
               CAST(coalesce(sum(cnt) OVER (ORDER BY n_chars
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS below
        FROM per_v
    ),
    sums AS (
        SELECT CAST(sum(cnt_a) AS DECIMAL(38, 0)) AS n_a,
               CAST(sum(cnt - cnt_a) AS DECIMAL(38, 0)) AS n_b,
               CAST(sum(CAST(cnt_a AS DECIMAL(38, 0))
                        * (2 * below + cnt + 1)) AS DECIMAL(38, 0)) AS r2a,
               CAST(sum(CAST(cnt AS DECIMAL(38, 0)) * cnt * cnt - cnt)
                    AS DECIMAL(38, 0)) AS tie3
        FROM cum
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_stat,
           round(
             (CAST(r2a - n_a * (n_a + 1) AS DOUBLE) - CAST(n_a * n_b AS DOUBLE))
             / (2.0 * sqrt(
                 CAST(n_a * n_b AS DOUBLE) / 12.0
                 * (CAST(n_a + n_b + 1 AS DOUBLE)
                    - CAST(tie3 AS DOUBLE)
                      / CAST((n_a + n_b) * (n_a + n_b - 1) AS DOUBLE)))),
             9) AS z_score
    FROM sums
    """,
)
def q_stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947) comparing the
    document-length distributions of two sources — the nonparametric
    "did this source shift?" significance test (no normality
    assumption, robust to the heavy length tails real corpora have).
    Midrank tie handling and the tie-corrected normal approximation,
    exactly as the textbook defines them.

    Determinism: the whole statistic is INTEGER arithmetic until the
    final z — per-value counts, the exclusive prefix count (below),
    and doubled rank sums (2·midrank = 2·below + t + 1 keeps midranks
    integral) accumulate in DECIMAL(38,0) so no float fold exists; z
    then divides/sqrt-s identical integer-derived doubles on both
    engines (IEEE-deterministic).

    Scale: one groupBy(n_chars) contraction (values << rows), the
    exclusive prefix count via :func:`with_global_order`'s two-phase
    cumsum (no single-partition window), one 1-row final aggregate.
    100 TB cost = one corpus scan + a bounded-relation pass.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(_MW_SRC_A, _MW_SRC_B)
    )
    per_v = d.groupBy("n_chars").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum((F.col("source") == _MW_SRC_A).cast("bigint")).alias("cnt_a"),
    )
    cum = with_global_order(
        per_v, [F.col("n_chars").asc()], sums={"incl": F.col("cnt")}
    ).withColumn("below", F.col("incl") - F.col("cnt"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    sums = cum.agg(
        dec(F.sum("cnt_a")).alias("n_a"),
        dec(F.sum(F.col("cnt") - F.col("cnt_a"))).alias("n_b"),
        F.sum(
            dec(F.col("cnt_a"))
            * (2 * F.col("below") + F.col("cnt") + 1)
        ).cast("decimal(38,0)").alias("r2a"),
        F.sum(
            dec(F.col("cnt")) * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).cast("decimal(38,0)").alias("tie3"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    u2 = (F.col("r2a") - n_a * (n_a + 1)).cast("double")
    nn = (n_a * n_b).cast("double")
    n_tot = (n_a + n_b).cast("double")
    sigma_sq = nn / 12.0 * (
        (n_tot + 1)
        - F.col("tie3").cast("double") / (n_tot * (n_tot - 1))
    )
    return sums.select(
        n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        (u2 / 2.0).alias("u_stat"),
        F.round((u2 - nn) / (2.0 * F.sqrt(sigma_sq)), 9).alias("z_score"),
    )


# ---------------------------------------------------------------------
# Log-normal length fit per source
# ---------------------------------------------------------------------

_Z90 = 1.2815515655446004  # Phi^-1(0.9), double literal on both engines


@query(
    "q_quality_lognormal_fit",
    oracle=f"""
    WITH lx AS (
        SELECT source, n_chars, doc_id,
               CAST(round(ln(CAST(n_chars AS DOUBLE)), 9)
                    AS DECIMAL(18, 9)) AS l
        FROM documents WHERE n_chars > 0
    ),
    fit AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(l) AS DOUBLE) AS s1,
               CAST(sum(CAST(l * l AS DECIMAL(38, 18))) AS DOUBLE) AS s2
        FROM lx GROUP BY source
    ),
    ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rk,
               count(*) OVER (PARTITION BY source) AS n
        FROM lx
    ),
    emp AS (
        SELECT source,
               max(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN n_chars END) AS emp_median,
               max(CASE WHEN rk = CAST(ceil(0.9 * n) AS BIGINT)
                        THEN n_chars END) AS emp_p90
        FROM ranked GROUP BY source
    )
    SELECT f.source,
           f.n_docs,
           round(f.s1 / f.n_docs, 6) AS mu,
           round(sqrt((f.s2 - f.s1 * f.s1 / f.n_docs) / (f.n_docs - 1)), 6)
               AS sigma,
           round(exp(f.s1 / f.n_docs), 6) AS pred_median,
           round(exp(f.s1 / f.n_docs
                     + {_Z90} * sqrt((f.s2 - f.s1 * f.s1 / f.n_docs)
                                     / (f.n_docs - 1))), 6) AS pred_p90,
           CAST(e.emp_median AS BIGINT) AS emp_median,
           CAST(e.emp_p90 AS BIGINT) AS emp_p90
    FROM fit f JOIN emp e ON e.source = f.source
    """,
)
def q_quality_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-normal fit of document lengths per source (method of moments
    on ln x) with predicted-vs-empirical median and p90 — the
    parametric length profile curation pipelines keep per source:
    natural text lengths are approximately log-normal, so a source
    whose empirical p90 sits far from exp(mu + 1.2816 sigma) is
    truncated, padded, or templated.

    Determinism: ln terms are rounded to 9 dp then accumulated in
    DECIMAL (the KM device) — both the first and second moments, so no
    float fold anywhere; mu/sigma/predictions are then computed from
    bit-identical doubles (exp rounded to 6 dp, the repo's
    transcendental guard). Empirical percentiles are exact rank
    selections inside per-source windows (partitioned — no
    single-partition window).

    Scale: one corpus scan for moments (partial-aggregatable), one
    per-source window sort for the exact percentiles — at 100 TB the
    window is per-source parallel; swap to the two-phase rank if one
    source dominates the corpus.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    lx = d.select(
        "source",
        "n_chars",
        "doc_id",
        F.round(F.log(F.col("n_chars").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("l"),
    )
    fit = lx.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("l").cast("double").alias("s1"),
        F.sum((F.col("l") * F.col("l")).cast("decimal(38,18)"))
        .cast("double")
        .alias("s2"),
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = lx.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    emp = ranked.groupBy("source").agg(
        F.max(
            F.when(
                F.col("rk") == F.ceil(0.5 * F.col("n")).cast("bigint"),
                F.col("n_chars"),
            )
        ).alias("emp_median"),
        F.max(
            F.when(
                F.col("rk") == F.ceil(0.9 * F.col("n")).cast("bigint"),
                F.col("n_chars"),
            )
        ).alias("emp_p90"),
    )
    s1, nd = F.col("s1"), F.col("n_docs")
    var = (F.col("s2") - s1 * s1 / nd) / (nd - 1)
    return fit.join(emp, "source").select(
        "source",
        "n_docs",
        F.round(s1 / nd, 6).alias("mu"),
        F.round(F.sqrt(var), 6).alias("sigma"),
        F.round(F.exp(s1 / nd), 6).alias("pred_median"),
        F.round(F.exp(s1 / nd + F.lit(_Z90) * F.sqrt(var)), 6).alias(
            "pred_p90"
        ),
        F.col("emp_median").cast("bigint").alias("emp_median"),
        F.col("emp_p90").cast("bigint").alias("emp_p90"),
    )


# ---------------------------------------------------------------------
# Deterministic shard manifest
# ---------------------------------------------------------------------

_N_SHARDS = 16
_SHARD_MULT = 2654435761  # Knuth multiplicative hash, fits bigint


@query(
    "q_train_shard_manifest",
    oracle=f"""
    WITH assigned AS (
        SELECT ((doc_id * {_SHARD_MULT}) % 4294967296) % {_N_SHARDS}
                   AS shard,
               n_chars,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
        FROM documents
    ),
    per_shard AS (
        SELECT CAST(shard AS INT) AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               CAST(sum(n_chars) AS BIGINT) AS n_bytes
        FROM assigned GROUP BY shard
    ),
    tot AS (SELECT sum(n_tokens) AS t FROM per_shard)
    SELECT shard, n_docs, n_tokens, n_bytes,
           CAST(n_tokens AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE)
               AS token_share
    FROM per_shard
    """,
)
def q_train_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard manifest for training-data export: every
    document is assigned to one of {_N_SHARDS} shards by a
    multiplicative integer hash of its id (engine-independent — NOT
    ``hash()``, whose implementation differs per engine), and the
    manifest reports each shard's document/token/byte budget plus its
    token share — the balance report a pipeline checks before writing
    shards, since a skewed manifest becomes a straggler epoch.

    Determinism: the hash is pure bigint arithmetic (identical on both
    engines); all budgets are integer sums; the share divides identical
    integer totals as doubles. At >2^26 documents move the product into
    DECIMAL(38,0) to keep the multiply overflow-free.

    Scale: one corpus scan, one {_N_SHARDS}-row aggregate, the grand
    total broadcast back — partial-aggregatable end to end.
    """
    d = load_table(spark, sf_dir, "documents")
    shard = (
        (F.col("doc_id") * F.lit(_SHARD_MULT)) % F.lit(4294967296)
        % F.lit(_N_SHARDS)
    ).cast("int")
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    )
    per_shard = (
        d.select(
            shard.alias("shard"),
            n_tokens.alias("n_tokens"),
            F.col("n_chars"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_bytes"),
        )
    )
    tot = per_shard.agg(F.sum("n_tokens").alias("t"))
    return per_shard.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "n_tokens",
        "n_bytes",
        (F.col("n_tokens").cast("double") / F.col("t").cast("double")).alias(
            "token_share"
        ),
    )


# ---------------------------------------------------------------------
# Inter-arrival burstiness profile
# ---------------------------------------------------------------------


@query(
    "q_events_interarrival_burstiness",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               date_diff('second',
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id),
                         ts) AS gap
        FROM events
    ),
    per_user AS (
        SELECT user_id,
               CAST(count(gap) AS BIGINT) AS n_gaps,
               CAST(sum(gap) AS BIGINT) AS s1,
               CAST(sum(gap * gap) AS BIGINT) AS s2
        FROM gaps WHERE gap IS NOT NULL
        GROUP BY user_id HAVING count(gap) >= 2
    ),
    scored AS (
        SELECT n_gaps,
               (sqrt(greatest(CAST(s2 AS DOUBLE) / n_gaps
                              - (CAST(s1 AS DOUBLE) / n_gaps)
                                * (CAST(s1 AS DOUBLE) / n_gaps), 0.0))
                - CAST(s1 AS DOUBLE) / n_gaps)
               / (sqrt(greatest(CAST(s2 AS DOUBLE) / n_gaps
                                - (CAST(s1 AS DOUBLE) / n_gaps)
                                  * (CAST(s1 AS DOUBLE) / n_gaps), 0.0))
                  + CAST(s1 AS DOUBLE) / n_gaps) AS b
        FROM per_user
    )
    SELECT CAST(least(floor((b + 1.0) * 5.0), 9) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_users,
           round(min(b), 6) AS min_b,
           round(max(b), 6) AS max_b,
           CAST(sum(n_gaps) AS BIGINT) AS n_gaps
    FROM scored GROUP BY bin
    """,
)
def q_events_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inter-arrival burstiness profile (Goh & Barabasi 2008): per
    user, the burstiness index B = (sigma - mu) / (sigma + mu) of the
    gaps between consecutive events — B near -1 is a metronome, 0 is
    Poisson, +1 is maximally bursty. The histogram of B across users is
    the signature a feed-health dashboard watches: bot traffic shifts
    the mass toward -1, batch replays toward +1.

    Determinism: gaps are integer seconds; per-user first and second
    moments are exact integer sums, so mu/sigma/B come out of identical
    integer-derived doubles on both engines (IEEE division/sqrt; the
    variance is clamped at 0 against catastrophic cancellation in the
    same way on both sides). Bin edges floor identical doubles.

    Scale: one user-partitioned lag window (the natural CDC
    partitioning), one per-user aggregate, one 10-row histogram.
    Second moments exceed bigint only past ~2^31 seconds of gap -
    not reachable; at larger event horizons switch s2 to DECIMAL(38,0).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ).alias("gap")
    per_user = (
        e.select("user_id", gap)
        .filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.sum("gap").alias("s1"),
            F.sum(F.col("gap") * F.col("gap")).alias("s2"),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    mu = F.col("s1").cast("double") / F.col("n_gaps")
    sigma = F.sqrt(
        F.greatest(
            F.col("s2").cast("double") / F.col("n_gaps") - mu * mu,
            F.lit(0.0),
        )
    )
    scored = per_user.select(
        "n_gaps", ((sigma - mu) / (sigma + mu)).alias("b")
    )
    return (
        scored.groupBy(
            F.least(F.floor((F.col("b") + 1.0) * 5.0), F.lit(9))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.min("b"), 6).alias("min_b"),
            F.round(F.max("b"), 6).alias("max_b"),
            F.sum("n_gaps").alias("n_gaps"),
        )
    )


# ---------------------------------------------------------------------
# Code / markup detection by keyword density
# ---------------------------------------------------------------------

_CODE_KEYWORDS = (
    "join", "select", "table", "scan", "merge", "sort", "hash",
    "window", "index", "key",
)
_CODE_THRESHOLD = 0.30


@query(
    "q_text_code_detection",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tok,
               len(list_filter(string_split(text, ' '),
                   x -> list_contains({list(_CODE_KEYWORDS)!r}, x)))
                   AS n_kw
        FROM documents
    ),
    flagged AS (
        SELECT source, n_tok, n_kw,
               CASE WHEN n_tok > 0 AND CAST(n_kw AS DOUBLE) / n_tok
                         > {_CODE_THRESHOLD}
                    THEN 1 ELSE 0 END AS is_code
        FROM toks
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_code) AS BIGINT) AS n_flagged,
           CAST(sum(n_kw) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)
               AS kw_density
    FROM flagged GROUP BY source
    """,
)
def q_text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code/markup detection by keyword-token density — the curation
    filter that routes documents into code vs prose subsets (the
    StarCoder/Gopher pipelines run exactly this shape with a
    language-specific keyword list; the list here is the fixture's
    tech vocabulary so the signal is exercised end-to-end, and it is a
    module constant a deployment swaps for its own). A document whose
    keyword density exceeds {_CODE_THRESHOLD} is flagged; the per-source
    report carries flag counts and corpus-level keyword density.

    Determinism: keyword and token counts are integers; the density
    divides identical integer sums as doubles. The per-doc flag
    compares an integer-ratio double against a literal on both engines.

    Scale: one corpus scan, all work inside codegen (split + filter on
    the token array, no UDF), one per-source aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    kw_arr = F.array(*[F.lit(k) for k in _CODE_KEYWORDS])
    kws = F.filter(
        F.split(F.col("text"), " "),
        lambda x: F.array_contains(kw_arr, x),
    )
    base = d.select(
        "source",
        F.size(toks).alias("n_tok"),
        F.size(kws).alias("n_kw"),
    )
    is_code = (
        (F.col("n_tok") > 0)
        & (F.col("n_kw").cast("double") / F.col("n_tok") > _CODE_THRESHOLD)
    ).cast("int")
    return (
        base.withColumn("is_code", is_code)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("is_code").alias("n_flagged"),
            (
                F.sum("n_kw").cast("double") / F.sum("n_tok").cast("double")
            ).alias("kw_density"),
        )
    )


# ---------------------------------------------------------------------
# CDC tombstone / lifecycle audit
# ---------------------------------------------------------------------

_TOMBSTONE_GC_HOURS = 48


@query(
    "q_changefeed_tombstone_audit",
    oracle=f"""
    WITH ops AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_ops,
               lag(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_del
        FROM events
    ),
    ref AS (SELECT max(ts) AS ref_ts FROM events),
    per_key AS (
        SELECT user_id,
               max(CASE WHEN rn = 1 THEN is_del END) AS first_is_del,
               max(CASE WHEN rn = n_ops THEN is_del END) AS last_is_del,
               max(CASE WHEN rn = n_ops THEN ts END) AS last_ts,
               CAST(sum(CASE WHEN prev_del = 1 AND is_del = 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS resurrections
        FROM ops GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(last_is_del) AS BIGINT) AS n_tombstoned,
           CAST(sum(first_is_del) AS BIGINT) AS n_delete_first,
           CAST(sum(resurrections) AS BIGINT) AS n_resurrections,
           CAST(sum(CASE WHEN last_is_del = 1
                          AND last_ts < (SELECT ref_ts FROM ref)
                                        - INTERVAL {_TOMBSTONE_GC_HOURS} HOUR
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_gc_eligible
    FROM per_key
    """,
)
def q_changefeed_tombstone_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDC tombstone / key-lifecycle audit — the log-compaction health
    check a changefeed operator runs before garbage-collecting delete
    markers (mirrors the reference's delete-event handling,
    Flash-CDC app/services/processor.py record-op dispatch): per key,
    classify delete-marker anomalies. ``error`` events model the
    delete op on the events-as-changelog fixture. Reports: keys whose
    LAST op is a delete (live tombstones), keys whose FIRST op is a
    delete (delete-before-create, an ordering bug upstream),
    delete-then-update transitions (resurrections — a compaction
    hazard), and tombstones older than the {_TOMBSTONE_GC_HOURS}h
    retention horizon (safe to GC).

    Determinism: pure integer flags and counts; timestamps compare
    exactly.

    Scale: one key-partitioned window pass (the natural CDC
    partitioning), one per-key aggregate, one 1-row rollup — the
    changelog is touched once.
    """
    e = load_table(spark, sf_dir, "events")
    is_del = (F.col("event_type") == "error").cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ops = e.select(
        "user_id",
        "ts",
        is_del.alias("is_del"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_ops"),
        F.lag(is_del).over(w).alias("prev_del"),
    )
    per_key = ops.groupBy("user_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("is_del"))).alias(
            "first_is_del"
        ),
        F.max(F.when(F.col("rn") == F.col("n_ops"), F.col("is_del"))).alias(
            "last_is_del"
        ),
        F.max(F.when(F.col("rn") == F.col("n_ops"), F.col("ts"))).alias(
            "last_ts"
        ),
        F.sum(
            F.when(
                (F.col("prev_del") == 1) & (F.col("is_del") == 0), 1
            ).otherwise(0)
        ).alias("resurrections"),
    )
    # Reference = max ts anywhere = max of per-key last_ts (each key's
    # last-ordered op carries its max ts), so the GC horizon rides the
    # per-key aggregate instead of re-scanning the changelog.
    ref = per_key.agg(F.max("last_ts").alias("ref_ts"))
    gc_cut = F.col("ref_ts") - F.expr(
        f"INTERVAL {_TOMBSTONE_GC_HOURS} HOURS"
    )
    return per_key.crossJoin(F.broadcast(ref)).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("last_is_del").alias("n_tombstoned"),
        F.sum("first_is_del").alias("n_delete_first"),
        F.sum("resurrections").alias("n_resurrections"),
        F.sum(
            F.when(
                (F.col("last_is_del") == 1) & (F.col("last_ts") < gc_cut), 1
            ).otherwise(0)
        ).alias("n_gc_eligible"),
    )
