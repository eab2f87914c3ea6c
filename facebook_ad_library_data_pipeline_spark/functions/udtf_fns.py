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


# ------------------------------------------------ polymorphic UDTF

NGRAM_N = 3


class WordNgrams:
    """POLYMORPHIC UDTF (Spark 4 `analyze()` contract): the output
    schema is computed at PLAN TIME from the constant `n` argument —
    (start_idx, w0..w{n-1}) — so one registered function serves any
    gram width with full Catalyst schema knowledge (column pruning,
    downstream resolution), where a fixed-returnType UDTF would need
    one registration per width. `n` must be foldable; a non-constant
    argument fails analysis loudly rather than guessing a schema."""

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import LongType, StringType, StructType

        if n.value is None:
            raise ValueError("WordNgrams requires a constant n")
        schema = StructType().add("start_idx", LongType())
        for i in range(int(n.value)):
            schema = schema.add(f"w{i}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):
        if not text:
            return
        words = [w for w in text.split(" ") if w]
        for i in range(len(words) - n + 1):
            yield (i, *words[i : i + n])


_NGRAM_UDTF_ORACLE = f"""
WITH w AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS arr
    FROM documents
), g AS (
    SELECT doc_id, arr,
           unnest(generate_series(0, len(arr) - {NGRAM_N})) AS start_idx
    FROM w
    WHERE len(arr) >= {NGRAM_N}
)
SELECT doc_id, start_idx,
       {", ".join(f"arr[CAST(start_idx + {i + 1} AS INT)] AS w{i}" for i in range(NGRAM_N))}
FROM g
"""


@query("q_udtf_polymorphic_ngrams", oracle=_NGRAM_UDTF_ORACLE, tags=("llm", "udtf", "text"))
def q_udtf_polymorphic_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word {NGRAM_N}-grams via the polymorphic UDTF: LATERAL
    word_ngrams(text, {NGRAM_N}) — the schema (start_idx, w0..w2) is
    derived by analyze() from the literal, not declared at
    registration. Same executor-side fan-out shape as q_udtf_chunks;
    the DuckDB oracle replays the sliding window in closed form."""
    from pyspark.sql.functions import udtf

    from ..catalog import load_table

    spark.udtf.register("word_ngrams", udtf(WordNgrams))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_for_ngram_udtf")
    return spark.sql(
        f"""
        SELECT d.doc_id, g.start_idx, {", ".join(f"g.w{i}" for i in range(NGRAM_N))}
        FROM documents_for_ngram_udtf d, LATERAL word_ngrams(d.text, {NGRAM_N}) g
        """
    )
