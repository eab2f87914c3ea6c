"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (north-star surface).

The container has no image/audio libraries, so the real decoders are
STUBBED behind import-tries (clearly marked NotImplementedError); the
Spark-side plumbing is real and tested: binary column construction,
explicit output schemas, Arrow-batched ``mapInPandas`` feature
extraction, deterministic fake features (byte statistics) standing in
for pixel statistics, and chunked frame sampling.

At scale: binary payloads ride in parquet; feature extraction is an
embarrassingly parallel mapInPandas over whatever partitioning the scan
produced — no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def decode_image_real(payload: bytes):  # pragma: no cover
    """Real image decode — requires PIL, absent here by design."""
    if not HAS_PIL:
        raise NotImplementedError(
            "STUB: image decoding needs PIL; container ships without it. "
            "The Spark plumbing below (binary col, mapInPandas, schema) is real."
        )
    raise NotImplementedError("PIL path intentionally unimplemented in v1")


_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS payload_bytes,
       md5(text)                  AS payload_md5,
       CASE WHEN octet_length(encode(text)) >= 400 THEN 'large'
            WHEN octet_length(encode(text)) >= 150 THEN 'medium'
            ELSE 'small' END      AS size_class
FROM documents
"""


@query("q_multimodal_meta", oracle=_META_ORACLE, tags=("llm", "multimodal"))
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata: documents.text re-encoded as an opaque
    binary payload (the testdata has no real media bytes) → byte length,
    content digest, size class. All JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    size_class = (
        F.when(F.octet_length(payload) >= 400, "large")
        .when(F.octet_length(payload) >= 150, "medium")
        .otherwise("small")
    )
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("payload_bytes"),
        F.md5(payload).alias("payload_md5"),
        size_class.alias("size_class"),
    )


FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, mean_byte double, std_byte double, hist array<double>"
)


def extract_byte_features(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Arrow-batched feature extractor: deterministic byte statistics as
    the stand-in for pixel statistics (a real decoder would slot in at
    the marked line). Pure pandas/numpy per batch — no driver round-trip."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            # <-- real image/audio decode would replace `arr` here
            hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": int(arr.size),
                    "mean_byte": float(arr.mean()) if arr.size else 0.0,
                    "std_byte": float(arr.std()) if arr.size else 0.0,
                    "hist": (hist / max(arr.size, 1)).tolist(),
                }
            )
        yield pd.DataFrame(rows)


@query("q_multimodal_features", oracle=None, tags=("llm", "multimodal"))
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: real Arrow
    batch plumbing + explicit schema; deterministic fake features
    (byte histogram) — rows-only check, determinism asserted in tests."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(extract_byte_features, schema=FEATURE_SCHEMA)


_FRAME_ORACLE = """
WITH frames AS (
    SELECT doc_id,
           unnest(generate_series(0, CAST(floor((length(text) - 1) / 32) AS BIGINT)))
               AS frame_idx,
           text
    FROM documents
    WHERE length(text) > 0
)
SELECT doc_id,
       frame_idx,
       md5(substring(text, CAST(frame_idx * 32 + 1 AS INT), 32)) AS frame_digest
FROM frames
WHERE frame_idx % 4 = 0
"""


@query("q_frame_sample", oracle=_FRAME_ORACLE, tags=("llm", "multimodal"))
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: chunk the payload into fixed 32-byte
    'frames', keep every 4th, digest each — the exact shape of video
    frame-sample-then-embed, minus the codec (stubbed)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_frames = F.floor((F.length("text") - 1) / 32).cast("long")
    frames = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), n_frames)).alias("frame_idx"),
        F.col("text"),
    ).filter(F.col("frame_idx") % 4 == 0)
    frame_digest = F.md5(
        F.encode(
            F.substring(F.col("text"), (F.col("frame_idx") * 32 + 1).cast("int"), 32), "UTF-8"
        )
    )
    return frames.select("doc_id", "frame_idx", frame_digest.alias("frame_digest"))
