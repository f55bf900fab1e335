"""Tokenizer-apply queries (r6): segment the corpus with the learned
BPE merges and publish real token counts.

Closes the loop ``q_text_bpe_merge_candidates`` opened: that query
LEARNS the top-20 first-round merges; this one APPLIES them to every
word (greedy left-to-right, rank order — see
``operators/tokenize.py``), so downstream budget/packing queries can
use learned-tokenizer counts instead of the whitespace approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flash_cdc_spark.operators import tokenize as TOK
from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table

_BPE_K = 20


@query(
    "q_text_bpe_tokenize",
    oracle=f"""
    WITH RECURSIVE merges AS (
        SELECT pair, row_number() OVER (ORDER BY c DESC, pair) AS rk
        FROM (
            SELECT pair, count(*) AS c FROM (
                SELECT unnest(list_transform(range(length(w) - 1),
                              i -> substr(w, CAST(i + 1 AS INT), 2))) AS pair
                FROM (
                    SELECT unnest(string_split(lower(text), ' ')) AS w
                    FROM documents
                )
                WHERE regexp_matches(w, '{TOK.WORD_RE}')
                  AND length(w) >= 2
            ) GROUP BY pair
        )
        QUALIFY rk <= {_BPE_K}
    ),
    words AS (
        SELECT d.doc_id, w.w
        FROM documents d, unnest(string_split(lower(d.text), ' ')) AS w(w)
        WHERE regexp_matches(w.w, '{TOK.WORD_RE}')
    ),
    seg AS (
        SELECT doc_id, length(w) AS n_chars,
               '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS seg,
               0 AS step
        FROM words
        UNION ALL
        SELECT s.doc_id, s.n_chars,
               replace(s.seg,
                       '|' || substr(m.pair, 1, 1) || '|'
                           || substr(m.pair, 2, 1) || '|',
                       '|' || m.pair || '|'),
               s.step + 1
        FROM seg s JOIN merges m ON m.rk = s.step + 1
    ),
    counted AS (
        SELECT doc_id, n_chars,
               length(seg) - length(replace(seg, '|', '')) - 1 AS toks
        FROM seg WHERE step = {_BPE_K}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)   AS ws_tokens,
           CAST(sum(toks) AS BIGINT)  AS bpe_tokens,
           round(sum(n_chars) / sum(toks), 6) AS chars_per_token
    FROM counted GROUP BY doc_id
    """,
)
def q_text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLY (VERDICT r5 #5b): learn the top-20
    first-round merges (same ranking as ``q_text_bpe_merge_candidates``
    — count desc, pair asc), then segment every word with them in rank
    order and publish per-document whitespace vs BPE token counts and
    chars-per-token. Segmentation is pure builtins: words are exploded
    once, each word becomes a ``|``-delimited symbol string via one
    regexp, each merge is one literal ``replace`` whose left-to-right
    non-overlapping scan IS greedy BPE application (see
    ``operators/tokenize.py`` for the delimiter-safety argument), and
    token counts fold into one partial-aggregatable groupBy(doc_id).
    The learned state is a 20-row driver collect memoized per corpus —
    the trained-tokenizer analog of the IVF-center/logreg-weight memos.
    The oracle re-learns the merges in a CTE and re-applies them with a
    recursive CTE stepping through rank order — both engines compute
    the segmentation independently, so a wrong merge rank, a
    false-match across symbol boundaries, or a non-greedy replace all
    mismatch. At 100 TB: learn = one charset²-bounded aggregate; apply
    = one narrow projection + one groupBy. Linear."""
    d = load_table(spark, sf_dir, "documents")
    merges = TOK.learn_first_merges(d, k=_BPE_K, cache_key=sf_dir)
    return TOK.bpe_token_counts(d, merges)
