"""Python UDTF (user-defined TABLE function) — the newest Python
extension point in Spark (3.5+): one input row → many output rows,
invoked via ``LATERAL`` in SQL, completing the Python API taxonomy
alongside the pandas-UDF family.

Demonstrated op: fixed-size token chunking — THE preprocessing shape
of LLM training pipelines (split every document into 20-word context
windows with an index). The same chunking exists as a declarative
sequence+slice in training_prep.py's packing family; this variant
exercises the UDTF execution path and is oracle-checked against a
DuckDB closed form.

UDTFs run row-at-a-time Python (Arrow-optimized when
``spark.sql.execution.pythonUDTF.arrow.enabled`` is on) — slower than
native expressions, so the engine treats them as an integration
surface, not a hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query

CHUNK_WORDS = 20


class ChunkDocument:
    """UDTF: (text) -> rows of (chunk_idx, n_tokens, chunk)."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract method
        if not text:
            return
        words = [w for w in text.split(" ") if w]
        for i in range(0, len(words), CHUNK_WORDS):
            piece = words[i : i + CHUNK_WORDS]
            yield i // CHUNK_WORDS, len(piece), " ".join(piece)


_CHUNK_ORACLE = f"""
WITH w AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS arr
    FROM documents
), c AS (
    SELECT doc_id, arr,
           unnest(generate_series(0, CAST(ceil(len(arr) / {CHUNK_WORDS}.0) - 1 AS BIGINT)))
               AS chunk_idx
    FROM w
    WHERE len(arr) > 0
)
SELECT doc_id,
       chunk_idx,
       CAST(least((chunk_idx + 1) * {CHUNK_WORDS}, len(arr)) - chunk_idx * {CHUNK_WORDS}
            AS INT) AS n_tokens,
       array_to_string(
           arr[CAST(chunk_idx * {CHUNK_WORDS} + 1 AS INT)
               : CAST(least((chunk_idx + 1) * {CHUNK_WORDS}, len(arr)) AS INT)],
           ' ') AS chunk
FROM c
"""


@query("q_udtf_chunks", oracle=_CHUNK_ORACLE, tags=("llm", "udtf", "text"))
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → 20-word context-window chunks through a registered
    Python UDTF applied with LATERAL — one input row fanning out to
    len/20 output rows inside the executor, no driver involvement."""
    from pyspark.sql.functions import udtf

    from ..catalog import load_table

    chunker = udtf(ChunkDocument, returnType="chunk_idx bigint, n_tokens int, chunk string")
    spark.udtf.register("chunk_document", chunker)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk
        FROM documents_for_udtf d, LATERAL chunk_document(d.text) c
        """
    )
