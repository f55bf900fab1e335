"""Python UDTF surface (Spark 4 `pyspark.sql.functions.udtf`): the
table-function escape hatch — one input row, many output rows, driven
through a SQL LATERAL join.

Like the pandas-UDF module this is API-surface coverage with a real
oracle, not a scale path: UDTFs run row-at-a-time Python, so anything
expressible with JVM sequence/transform/explode (see `q_text_chunking`)
should stay there. The sanctioned UDTF use is logic that genuinely
needs imperative Python per row — here the digest loop stands in for
e.g. a tokenizer or parser library call. The reference has no UDF/UDTF
framework at all (SURVEY.md §2.9).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table

_CHUNK = 32


@query(
    "q_udtf_chunk_digest",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n
        FROM documents WHERE doc_id < 100
    ),
    chunks AS (
        SELECT doc_id, t, n,
               CAST(unnest(range(0, n, {_CHUNK})) AS INT) AS start
        FROM toks
    )
    SELECT doc_id,
           CAST(start // {_CHUNK} AS INT) AS chunk_idx,
           CAST(least({_CHUNK}, n - start) AS INT) AS n_tokens,
           md5(array_to_string(
               list_transform(range(least({_CHUNK}, n - start)),
                              k -> t[CAST(start + k + 1 AS INT)]), ' '))
               AS digest
    FROM chunks
    """,
)
def q_udtf_chunk_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF driven through a SQL LATERAL join: each
    document row fans out to one row per 32-token chunk carrying the
    chunk's md5 digest (hashlib and SQL md5 agree byte-for-byte, so
    the oracle is exact). Demonstrates the full UDTF lifecycle —
    class-based eval generator, `spark.udtf.register`, correlated
    LATERAL invocation — the API a user reaches for when per-row
    logic needs a real Python library (tokenizers, parsers).

    Scale note: row-at-a-time Python; the JVM-side chunking query
    (`q_text_chunking`) is the 100 TB path. Kept to a bounded slice
    (doc_id < 100) accordingly."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, n_tokens int, digest string")
    class ChunkDigest:
        def eval(self, doc_id: int, text: str):  # noqa: D102
            toks = text.split(" ") if text is not None else []
            for start in range(0, len(toks), _CHUNK):
                chunk = toks[start : start + _CHUNK]
                yield (
                    doc_id,
                    start // _CHUNK,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode("utf-8")).hexdigest(),
                )

    spark.udtf.register("chunk_digest", ChunkDigest)
    load_table(spark, sf_dir, "documents").filter("doc_id < 100").createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        "SELECT f.* FROM __udtf_docs AS d, "
        "LATERAL chunk_digest(d.doc_id, d.text) AS f"
    )
