"""Multimodal column operators (driver north star: image/audio/video
as opaque binary columns with typed metadata).

Design: a multimodal asset is ``struct<data: binary, meta: struct<...>>``
or a plain binary column + metadata columns. Heavy per-asset work
(decode, resize, frame-sample, feature-extract) runs as Arrow-batched
``mapInPandas`` — one Python worker per partition, vectorized batches,
the ONLY sanctioned Python hot path in the engine. Partitioning rule at
100 TB: repartition so each task holds O(100 MB) of binary payload, and
keep metadata-only predicates (format, size, dims) in native columns so
Catalyst prunes assets BEFORE bytes reach Python.

The image/audio codec libraries are not in this container, so the
codec call itself is stubbed (``NotImplementedError``) behind
deterministic byte-level metadata extraction — the Spark-side plumbing
(schemas, batch iteration, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

META_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, header_hex STRING, fake_width BIGINT, fake_height BIGINT"
)


def decode_image(data: bytes) -> "object":
    """Real codec hook — requires PIL/opencv, not present in this
    container. Deployments swap this in; everything around it (batching,
    schema, partition sizing) is unchanged."""
    raise NotImplementedError("image codec not available in this environment")


def _meta_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    for pdf in batches:
        data = pdf["data"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": data.map(len),
                "header_hex": data.map(lambda b: b[:8].hex().upper()),
                # deterministic stand-in for decoded dimensions
                "fake_width": data.map(lambda b: len(b) % 640),
                "fake_height": data.map(lambda b: len(b) % 480),
            }
        )


def extract_metadata(assets: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over (doc_id, data binary)."""
    return assets.select("doc_id", "data").mapInPandas(_meta_batches, META_SCHEMA)


def binary_assets_from_documents(df: DataFrame) -> DataFrame:
    """Build a binary asset column from the documents fixture (UTF-8
    bytes stand in for opaque media payloads)."""
    return df.select(
        "doc_id", F.encode("text", "UTF-8").alias("data"), F.col("n_chars").alias("meta_len")
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling *plan*: emits (doc_id, frame_idx)
    rows for frames 0, n, 2n… based on a metadata frame count — the
    explode pattern used to fan one asset into per-frame work items
    without touching bytes. Decode of each frame is the stubbed hook."""
    n_frames = (F.length("data") % 100).alias("n_frames")  # stand-in metadata
    with_counts = assets.select("doc_id", n_frames)
    return with_counts.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
