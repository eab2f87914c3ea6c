"""Arrow-NATIVE Python extension points: ``mapInArrow`` and
``GroupedData.applyInArrow`` — the zero-pandas siblings of
mapInPandas/applyInPandas. The pandas variants pay an Arrow→pandas
conversion on every batch (object boxing for strings, index
construction); the Arrow-native path hands the worker raw
``pyarrow.RecordBatch``/``Table`` objects, so vectorized kernels from
``pyarrow.compute`` run directly on the wire format — the right shape
for high-throughput byte/string feature extraction at 100 TB, where
the conversion tax is pure overhead.

These two queries complete the Python extension taxonomy (SURVEY.md
§2.C row "Python extension taxonomy"): scalar/grouped pandas UDFs,
mapInPandas, applyInPandas(+WithState), transformWithStateInPandas,
cogrouped-map, UDTF were already covered; mapInArrow and applyInArrow
were the two remaining public extension APIs with no query.

Reference parity note: the reference's per-row pandas transforms
(`/root/reference/transform_raw_data.py`) are the workload class
these APIs accelerate; no reference code is copied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# Whitespace tokens must mean the SAME thing in both engines:
# len(string_split(text, ' ')) in DuckDB counts empty pieces from runs
# of spaces, and count_substring(text, ' ') + 1 reproduces exactly
# that (the q_token_count convention).
_ARROW_TOKEN_ORACLE = """
SELECT source,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_ws_tokens
FROM documents
GROUP BY source
"""


@query("q_arrow_token_stats", oracle=_ARROW_TOKEN_ORACLE, tags=("llm", "text", "arrow"))
def q_arrow_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character/token mass computed through ``mapInArrow``:
    the worker receives raw RecordBatches and runs ``pyarrow.compute``
    kernels (utf8_length, count_substring) with no pandas conversion
    anywhere; Spark aggregates the per-doc features JVM-side. The
    oracle restates both features in SQL, so a broken batch iterator,
    a kernel semantics drift (code points vs bytes — utf8_length is
    code points, matching both engines' length()), or a dropped batch
    flips the hash."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")

    def batch_features(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("source"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.add(pc.count_substring(text, " "), 1), pa.int64()
                    ),
                ],
                names=["source", "n_chars_text", "ws_tokens"],
            )

    per_doc = docs.mapInArrow(
        batch_features, "source string, n_chars_text bigint, ws_tokens bigint"
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars_text").alias("sum_chars"),
        F.sum("ws_tokens").alias("sum_ws_tokens"),
    )


# numpy's median and DuckDB's median agree exactly on integer input
# (even count -> mean of the two middle values, as a double).
_ARROW_GROUP_ORACLE = """
SELECT source,
       count(*) AS n_docs,
       CAST(median(n_chars) AS DOUBLE) AS median_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents
GROUP BY source
"""


@query("q_arrow_group_stats", oracle=_ARROW_GROUP_ORACLE, tags=("llm", "agg", "arrow"))
def q_arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source order statistics through ``applyInArrow``: each group
    arrives as one ``pyarrow.Table``, reduced with numpy on the
    zero-copied column (exact median — the hole in pyarrow.compute's
    aggregate kernels, and exactly the kind of custom per-group reduce
    this API exists for). Keys are carried in the data (the grouping
    column is present in each group's table), so an applyInArrow
    implementation that mis-sliced group boundaries would change some
    group's min/max/median and flip the hash. Scale shape: groups
    stream through workers one shuffle wide, like applyInPandas, minus
    the pandas conversion."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")

    def group_stats(table):
        import pyarrow as pa

        v = table.column("n_chars").to_numpy()
        import numpy as np

        return pa.table(
            {
                "source": [table.column("source")[0].as_py()],
                "n_docs": [len(v)],
                "median_chars": [float(np.median(v))],
                "min_chars": [int(v.min())],
                "max_chars": [int(v.max())],
            }
        )

    return docs.groupBy("source").applyInArrow(
        group_stats,
        "source string, n_docs bigint, median_chars double, "
        "min_chars bigint, max_chars bigint",
    )
