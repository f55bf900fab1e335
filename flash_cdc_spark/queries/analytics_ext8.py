"""Statistics / sequence-analysis extensions (r10): spend inequality,
rank correlation without moments, hourly autocorrelation, behavioral
transition matrices, and Zipf-law vocabulary fits.

Five workloads a 100 TB warehouse + LLM-curation stack runs routinely:

- **Gini coefficient** over per-customer spend — the standard
  inequality KPI (concentration of revenue), and a consumer of the
  two-phase exact global rank.
- **Kendall's tau-b** between two bounded-domain measures — the
  robust rank correlation when values are heavily tied; computed by
  CELL CONTRACTION (group to the bounded (x, y) value grid first), so
  the pairwise step is domain-bounded and flat in corpus size.
- **Hourly autocorrelation** of event counts (lag 1-3) — the
  seasonality screen before building forecast features.
- **Markov transition matrix** over per-user event sequences — the
  behavioral model behind next-event prediction and anomaly scoring.
- **Zipf slope** of the token rank-frequency curve — the classic
  natural-text diagnostic for LLM corpora (templated/synthetic text
  departs from slope ≈ -1).

Cross-engine determinism follows the repo conventions: every
corpus-scale sum accumulates in DECIMAL (counts, cell products, 9-dp
rounded ln terms), all downstream double arithmetic is the identical
expression tree on identical operands, and every ordering carries a
unique tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.operators.global_order import with_global_order
from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


# ---------------------------------------------------------------------
# Gini coefficient of per-customer spend
# ---------------------------------------------------------------------


@query(
    "q_sales_gini_coefficient",
    oracle="""
    WITH percust AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2)))
                    AS DECIMAL(18, 2)) AS spend
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT spend,
               row_number() OVER (ORDER BY spend, o_custkey) AS rk
        FROM percust
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(spend AS DECIMAL(38, 2))) AS DECIMAL(38, 2))
                   AS sx,
               CAST(sum(CAST(rk AS DECIMAL(18, 0)) * spend)
                    AS DECIMAL(38, 2)) AS sixi
        FROM ranked
    )
    SELECT n AS n_customers,
           CAST(sx AS DOUBLE) AS total_spend,
           round((2.0 * CAST(sixi AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                 - (n + 1.0) / n, 9) AS gini
    FROM s
    """,
)
def q_sales_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer total spend — the standard
    revenue-concentration KPI: 0 = every customer spends the same,
    → 1 = one customer carries all revenue. Uses the rank formulation
    ``G = 2·Σ i·x_(i) / (n·Σ x) − (n+1)/n`` over spend sorted
    ascending.

    Determinism: spend accumulates in DECIMAL(18,2); the rank-weighted
    sum multiplies DECIMAL(18,0) ranks by DECIMAL(18,2) spends (exact,
    fits DECIMAL(38,2) at any realistic scale) and the final Gini is
    double arithmetic over identical exact operands on both engines.
    The ascending order carries ``o_custkey`` as the unique tiebreak —
    ties in spend cannot permute the rank-weighted sum anyway
    (equal x under tied ranks contribute the same Σ i·x), but the
    total order keeps the two-phase rank deterministic by contract.

    Scale: customers grow with the corpus, so the rank goes through
    :func:`with_global_order` (range-partitioned two-phase exact rank
    — no single-partition sort); everything after it is one
    partial-aggregatable pass to a single row.
    """
    o = load_table(spark, sf_dir, "orders")
    percust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("spend")
    )
    ranked = with_global_order(
        percust,
        [F.col("spend").asc(), F.col("o_custkey").asc()],
        rank_col="rk",
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("spend").cast("decimal(38,2)"))
        .cast("decimal(38,2)")
        .alias("sx"),
        F.sum(F.col("rk").cast("decimal(18,0)") * F.col("spend"))
        .cast("decimal(38,2)")
        .alias("sixi"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sixi_d = F.col("sixi").cast("double")
    return s.select(
        F.col("n").alias("n_customers"),
        sx_d.alias("total_spend"),
        F.round(
            (F.lit(2.0) * sixi_d) / (n_d * sx_d)
            - (F.col("n") + F.lit(1.0)) / F.col("n"),
            9,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------
# Kendall's tau-b by cell contraction
# ---------------------------------------------------------------------


@query(
    "q_stats_kendall_tau",
    oracle="""
    WITH cells AS (
        SELECT l_quantity AS x, l_discount AS y,
               CAST(count(*) AS DECIMAL(18, 0)) AS c
        FROM lineitem GROUP BY l_quantity, l_discount
    ),
    pairs AS (
        SELECT CAST(sum(CASE WHEN (b.x > a.x AND b.y > a.y)
                              OR (b.x < a.x AND b.y < a.y)
                             THEN a.c * b.c ELSE 0 END)
                    AS DECIMAL(38, 0)) AS conc,
               CAST(sum(CASE WHEN (b.x > a.x AND b.y < a.y)
                              OR (b.x < a.x AND b.y > a.y)
                             THEN a.c * b.c ELSE 0 END)
                    AS DECIMAL(38, 0)) AS disc
        FROM cells a JOIN cells b
          ON (a.x < b.x) OR (a.x = b.x AND a.y < b.y)
    ),
    tot AS (
        SELECT CAST(sum(c) AS DECIMAL(38, 0)) AS n,
               CAST(sum(c * (c - 1)) AS DECIMAL(38, 0)) AS tboth2
        FROM cells
    ),
    tx AS (
        SELECT CAST(sum(cx * (cx - 1)) AS DECIMAL(38, 0)) AS tx2
        FROM (SELECT CAST(sum(c) AS DECIMAL(18, 0)) AS cx
              FROM cells GROUP BY x)
    ),
    ty AS (
        SELECT CAST(sum(cy * (cy - 1)) AS DECIMAL(38, 0)) AS ty2
        FROM (SELECT CAST(sum(c) AS DECIMAL(18, 0)) AS cy
              FROM cells GROUP BY y)
    )
    SELECT CAST(t.n AS BIGINT) AS n_rows,
           CAST(p.conc AS DOUBLE) AS concordant,
           CAST(p.disc AS DOUBLE) AS discordant,
           round((CAST(p.conc AS DOUBLE) - CAST(p.disc AS DOUBLE))
                 / (sqrt(CAST(t.n * (t.n - 1) - x.tx2 AS DOUBLE) / 2.0)
                    * sqrt(CAST(t.n * (t.n - 1) - y.ty2 AS DOUBLE) / 2.0)),
                 9) AS tau_b
    FROM pairs p, tot t, tx x, ty y
    """,
)
def q_stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b rank correlation between line-item quantity and
    discount — the robust correlation when both variables are heavily
    tied (quantity is an integer 1-50, discount an 11-step grid), where
    Pearson overweights the tails and Spearman's midranks blur.

    Computed by CELL CONTRACTION: the corpus contracts to the bounded
    (quantity, discount) value grid (≤ a few hundred cells at ANY
    corpus size) with per-cell counts; concordant/discordant pair
    counts are then one triangular join over the grid weighted by count
    products, and the tie corrections come from the grid's marginals.
    All pair counting is exact DECIMAL (count products overflow BIGINT
    at petabyte row counts); tau-b's final arithmetic is double over
    identical exact operands — ``(C−D) / (√((n0−n1)) · √((n0−n2)))``
    with ``n0−n1 = (n(n−1) − Σ tx(tx−1))/2`` kept as exact integers
    until the single cast.

    Scale: one partial-aggregatable groupBy to the bounded grid; the
    O(cells²) triangular join is flat in corpus rows (the same
    contraction-before-pairwise posture as the KS/Spearman queries).
    """
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_quantity").alias("x"), F.col("l_discount").alias("y")
    ).agg(F.count(F.lit(1)).cast("decimal(18,0)").alias("c"))
    a, b = cells.alias("a"), cells.alias("b")
    ax, ay, ac = F.col("a.x"), F.col("a.y"), F.col("a.c")
    bx, by, bc = F.col("b.x"), F.col("b.y"), F.col("b.c")
    pairs = (
        a.join(
            F.broadcast(b),
            (ax < bx) | ((ax == bx) & (ay < by)),
        )
        .agg(
            F.sum(
                F.when(
                    ((bx > ax) & (by > ay)) | ((bx < ax) & (by < ay)),
                    ac * bc,
                ).otherwise(F.lit(0))
            )
            .cast("decimal(38,0)")
            .alias("conc"),
            F.sum(
                F.when(
                    ((bx > ax) & (by < ay)) | ((bx < ax) & (by > ay)),
                    ac * bc,
                ).otherwise(F.lit(0))
            )
            .cast("decimal(38,0)")
            .alias("disc"),
        )
    )
    tot = cells.agg(
        F.sum("c").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("decimal(38,0)").alias("tboth2"),
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("c").cast("decimal(18,0)").alias("cx"))
        .agg(
            F.sum(F.col("cx") * (F.col("cx") - 1))
            .cast("decimal(38,0)")
            .alias("tx2")
        )
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("c").cast("decimal(18,0)").alias("cy"))
        .agg(
            F.sum(F.col("cy") * (F.col("cy") - 1))
            .cast("decimal(38,0)")
            .alias("ty2")
        )
    )
    joined = (
        pairs.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    n = F.col("n")
    num = F.col("conc").cast("double") - F.col("disc").cast("double")
    denx = F.sqrt((n * (n - 1) - F.col("tx2")).cast("double") / F.lit(2.0))
    deny = F.sqrt((n * (n - 1) - F.col("ty2")).cast("double") / F.lit(2.0))
    return joined.select(
        n.cast("bigint").alias("n_rows"),
        F.col("conc").cast("double").alias("concordant"),
        F.col("disc").cast("double").alias("discordant"),
        F.round(num / (denx * deny), 9).alias("tau_b"),
    )


# ---------------------------------------------------------------------
# Hourly autocorrelation of event counts
# ---------------------------------------------------------------------


@query(
    "q_events_hourly_autocorr",
    oracle="""
    WITH grid AS (
        SELECT event_type,
               epoch_ms(ts) // 3600000 AS h,
               CAST(count(*) AS DECIMAL(18, 0)) AS c
        FROM events GROUP BY event_type, epoch_ms(ts) // 3600000
    ),
    lags AS (SELECT unnest([1, 2, 3]) AS k),
    pairs AS (
        SELECT a.event_type, l.k,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(a.c) AS DECIMAL(38, 0)) AS sx,
               CAST(sum(b.c) AS DECIMAL(38, 0)) AS sy,
               CAST(sum(a.c * b.c) AS DECIMAL(38, 0)) AS sxy,
               CAST(sum(a.c * a.c) AS DECIMAL(38, 0)) AS sxx,
               CAST(sum(b.c * b.c) AS DECIMAL(38, 0)) AS syy
        FROM grid a CROSS JOIN lags l
        JOIN grid b ON b.event_type = a.event_type AND b.h = a.h + l.k
        GROUP BY a.event_type, l.k
    )
    SELECT event_type, CAST(k AS INT) AS k, n_pairs,
           round((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 9) AS acf
    FROM pairs
    WHERE CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
    """,
)
def q_events_hourly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/2/3 autocorrelation of hourly event counts per event type
    — the seasonality screen a forecasting pipeline runs before
    committing to lag features: Pearson r between the hourly count
    series and itself shifted by k hours, over hour pairs where both
    buckets exist.

    Determinism: hour ids come from exact integer division of
    epoch-milliseconds (never a double divide near bucket boundaries);
    counts and all second-moment sums accumulate in DECIMAL; the
    correlation is double arithmetic over identical exact operands on
    both engines, degenerate (zero-variance) slices excluded by the
    same exact predicate.

    Scale: the corpus contracts to the (type × hour) grid in one
    partial-aggregatable pass; the lag join is grid-vs-grid on
    (type, hour+k) — domain-bounded, flat in corpus rows.
    """
    e = load_table(spark, sf_dir, "events")
    grid = (
        e.select(
            "event_type",
            F.expr("unix_millis(ts) div 3600000").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("decimal(18,0)").alias("c"))
    )
    lags = spark.range(1, 4).select(F.col("id").cast("int").alias("k"))
    a, b = grid.alias("a"), grid.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.h") == F.col("a.h") + F.col("k")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("a.c")).cast("decimal(38,0)").alias("sx"),
            F.sum(F.col("b.c")).cast("decimal(38,0)").alias("sy"),
            F.sum(F.col("a.c") * F.col("b.c"))
            .cast("decimal(38,0)")
            .alias("sxy"),
            F.sum(F.col("a.c") * F.col("a.c"))
            .cast("decimal(38,0)")
            .alias("sxx"),
            F.sum(F.col("b.c") * F.col("b.c"))
            .cast("decimal(38,0)")
            .alias("syy"),
        )
    )
    nd = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    denx = nd * sxx - sx * sx
    deny = nd * syy - sy * sy
    return pairs.filter((denx > 0) & (deny > 0)).select(
        "event_type",
        "k",
        "n_pairs",
        F.round(
            (nd * sxy - sx * sy) / (F.sqrt(denx) * F.sqrt(deny)), 9
        ).alias("acf"),
    )


# ---------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# ---------------------------------------------------------------------


@query(
    "q_events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type AS from_type, event_type AS to_type,
               CAST(count(*) AS BIGINT) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    tot AS (
        SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS n_from
        FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n_transitions,
           round(CAST(t.n_transitions AS DOUBLE)
                 / CAST(o.n_from AS DOUBLE), 9) AS prob
    FROM trans t JOIN tot o USING (from_type)
    """,
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type), estimated from
    consecutive event pairs within each user's timeline — the
    behavioral model behind next-event prediction, funnel analysis,
    and sequence-anomaly scoring.

    Determinism: sequences are ordered by (ts, event_id) — event_id is
    the unique tiebreak, so the lag pairing is identical on both
    engines; probabilities are exact-integer ratios divided as doubles
    (identical operands).

    Scale: the lag window partitions by user_id (millions of
    independent groups — no single-partition window); transitions then
    contract to the (type × type) grid in one partial-aggregatable
    pass, and the row-probability join is broadcast-sized.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    tot = trans.groupBy("from_type").agg(
        F.sum("n_transitions").cast("bigint").alias("n_from")
    )
    return trans.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.col("n_from").cast("double"),
            9,
        ).alias("prob"),
    )


# ---------------------------------------------------------------------
# Zipf rank-frequency slope of the corpus vocabulary
# ---------------------------------------------------------------------


@query(
    "q_text_zipf_slope",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    freq AS (
        SELECT w, CAST(count(*) AS BIGINT) AS f
        FROM words WHERE w <> '' GROUP BY w
    ),
    ranked AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rk
        FROM freq
    ),
    t AS (
        SELECT CAST(round(ln(CAST(rk AS DOUBLE)), 9) AS DECIMAL(18, 9)) AS x,
               CAST(round(ln(CAST(f AS DOUBLE)), 9) AS DECIMAL(18, 9)) AS y
        FROM ranked WHERE rk <= 1000
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS DECIMAL(38, 9)) AS sx,
               CAST(sum(y) AS DECIMAL(38, 9)) AS sy,
               CAST(sum(x * y) AS DECIMAL(38, 18)) AS sxy,
               CAST(sum(x * x) AS DECIMAL(38, 18)) AS sxx
        FROM t
    )
    SELECT n AS n_terms,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
               AS zipf_slope,
           round((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
               AS intercept
    FROM s
    """,
)
def q_text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus vocabulary: OLS slope of
    ln(frequency) on ln(rank) over the top-1000 terms — the classic
    natural-text diagnostic for LLM training corpora (natural language
    sits near slope −1; templated, synthetic, or boilerplate-heavy
    corpora flatten or steepen the curve).

    Determinism: term ranks are exact (frequency DESC with the term
    string as the unique tiebreak); each ln term is rounded to 9 dp
    and accumulated in DECIMAL (the lognormal-fit device — no float
    fold anywhere), and the OLS closed form is double arithmetic over
    identical exact operands on both engines, rounded to 6 dp (the
    repo's transcendental guard).

    Scale: term frequencies are one partial-aggregatable explode +
    groupBy; the vocabulary grows sublinearly but unboundedly, so the
    rank goes through :func:`with_global_order` (two-phase exact
    global rank — no single-partition sort) and only the bounded
    top-1000 slice feeds the regression.
    """
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    ranked = with_global_order(
        freq, [F.col("f").desc(), F.col("w").asc()], rank_col="rk"
    ).filter(F.col("rk") <= 1000)
    x = F.round(F.log(F.col("rk").cast("double")), 9).cast("decimal(18,9)")
    y = F.round(F.log(F.col("f").cast("double")), 9).cast("decimal(18,9)")
    s = ranked.select(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,9)").alias("sx"),
        F.sum("y").cast("decimal(38,9)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,18)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,18)").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / nd, 6).alias("intercept"),
    )
