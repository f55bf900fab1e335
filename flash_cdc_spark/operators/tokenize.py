"""BPE tokenizer: learn first-round merges, then SEGMENT the corpus
with them — relationally (VERDICT r5 #5b).

``q_text_bpe_merge_candidates`` learns the top-k adjacent-character
merges (Sennrich et al. 2016, the public BPE paper); this module closes
the loop by APPLYING them: every word is segmented by the learned
merges in rank order, greedy left-to-right — so token counts downstream
(budget selection, packing) can use real learned-tokenizer counts
instead of the whitespace approximation.

Representation: a word's segmentation is a delimiter-wrapped string —
``"order"`` → ``"|o|r|d|e|r|"`` — and applying merge ``de`` is ONE
builtin ``replace(seg, '|d|e|', '|de|')``. The wrapping delimiters make
symbol boundaries explicit, so multi-character symbols can never
false-match (``"|xa|b|"`` does not contain ``"|a|b|"``), and SQL
``replace``'s left-to-right non-overlapping scan IS greedy BPE order
(``"|a|a|a|"`` + merge ``aa`` → ``"|aa|a|"``). Everything stays in
whole-stage codegen: one regexp to explode chars, k chained literal
``replace`` calls, zero Python in the hot path.

Scale: the learned state is k rows (k=20 here) — a metadata-sized
driver collect memoized per corpus, the same trained-state shape as
the IVF centers and logreg weights. The apply pass is one narrow
projection over words + one partial-aggregatable groupBy(doc_id).
Linear at 100 TB.

Semantics note: these are FIRST-ROUND merges (all character pairs,
ranked once). Full BPE re-counts pair frequencies after every merge;
that loop is k sequential corpus aggregations and slots in here
unchanged — each round is the same learn step over the previous
round's segmentation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["WORD_RE", "learn_first_merges", "bpe_segment", "bpe_token_counts"]

# Words eligible for segmentation: lowercase alphanumeric only, so the
# '|' delimiter can never collide with word content (and empty strings
# from repeated spaces are dropped). Mirrored verbatim in the oracle.
WORD_RE = "^[a-z0-9]+$"

# Learned-merges memo per (process, corpus): the trained-tokenizer
# state is k strings — metadata-sized, same memo shape as the logreg
# weights and IVF centers.
_MERGES_MEMO: dict[tuple[str, int], list[str]] = {}


def _words(df: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        df.select(F.explode(F.split(F.lower(text_col), " ")).alias("w"))
        .filter(F.col("w").rlike(WORD_RE))
    )


def learn_first_merges(
    docs: DataFrame, k: int = 20, text_col: str = "text", cache_key: str | None = None
) -> list[str]:
    """Top-k adjacent-character pairs by corpus frequency (ties broken
    by pair ascending — the deterministic rank ``q_text_bpe_merge_
    candidates`` publishes), returned as a driver-side list in rank
    order. Pair cardinality is charset²-bounded, so the aggregate state
    and the collect are tiny at any corpus size."""
    if cache_key is not None and (cache_key, k) in _MERGES_MEMO:
        return _MERGES_MEMO[(cache_key, k)]
    pairs = (
        _words(docs, text_col)
        .filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "pair")
        .limit(k)
    )
    merges = [r["pair"] for r in pairs.collect()]
    if cache_key is not None:
        _MERGES_MEMO[(cache_key, k)] = merges
    return merges


def bpe_segment(word: Column, merges: list[str]) -> Column:
    """Segmentation string of ``word`` under ``merges`` (rank order):
    ``"|o|r|d|e|r|"`` → merges applied as chained literal ``replace``
    expressions. Pure builtins — stays in codegen."""
    seg = F.concat(F.lit("|"), F.regexp_replace(word, "(.)", "$1|"))
    for m in merges:
        seg = F.replace(seg, F.lit(f"|{m[0]}|{m[1]}|"), F.lit(f"|{m}|"))
    return seg


def bpe_token_counts(
    docs: DataFrame, merges: list[str], id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token counts under the learned merges:
    ``(doc_id, ws_tokens, bpe_tokens, chars_per_token)``. One explode +
    one groupBy(doc_id) — partial-aggregatable, linear."""
    words = (
        docs.select(id_col, F.explode(F.split(F.lower(text_col), " ")).alias("w"))
        .filter(F.col("w").rlike(WORD_RE))
    )
    seg = words.select(
        id_col,
        F.length("w").alias("n_chars"),
        bpe_segment(F.col("w"), merges).alias("seg"),
    )
    # symbols per word = delimiter count - 1
    toks = (F.length("seg") - F.length(F.translate("seg", "|", ""))) - 1
    return (
        seg.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("ws_tokens"),
            F.sum(toks).alias("bpe_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .select(
            id_col,
            F.col("ws_tokens").cast("bigint").alias("ws_tokens"),
            F.col("bpe_tokens").cast("bigint").alias("bpe_tokens"),
            F.round(F.col("n_chars") / F.col("bpe_tokens"), 6).alias(
                "chars_per_token"
            ),
        )
    )
