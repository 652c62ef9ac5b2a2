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


RESIZE_SCHEMA = (
    "doc_id BIGINT, src_bytes BIGINT, thumb_w BIGINT, thumb_h BIGINT, "
    "thumb_bytes BIGINT, thumb_checksum BIGINT"
)


def resize_image(data: bytes, w: int, h: int) -> bytes:
    """Real resize hook — requires PIL/opencv, not in this container.
    Deployments swap this in; the batching/schema/partitioning around
    it is unchanged."""
    raise NotImplementedError("image codec not available in this environment")


def _resize_batches(target_w: int, target_h: int):
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        stride = 7  # deterministic stand-in for the decode+resample step

        def thumb_stats(b: bytes) -> tuple[int, int]:
            # stand-in "thumbnail": every stride-th byte, exactly what a
            # row-major nearest-neighbor downsample does to a pixel
            # buffer; checksum = sum of sampled byte values (numpy
            # strided view + vectorized sum — no per-byte Python loop)
            sampled = np.frombuffer(b, dtype=np.uint8)[::stride]
            return len(sampled), int(sampled.sum(dtype=np.int64))

        for pdf in batches:
            stats = pdf["data"].map(thumb_stats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_bytes": pdf["data"].map(len),
                    "thumb_w": target_w,
                    "thumb_h": target_h,
                    "thumb_bytes": stats.map(lambda t: t[0]),
                    "thumb_checksum": stats.map(lambda t: t[1]),
                }
            )

    return run


def resize_plan(assets: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Image-resize plumbing: Arrow-batched mapInPandas over the binary
    column producing thumbnail metadata + a deterministic byte-stride
    checksum (the codec hook ``resize_image`` is the swap-in point).
    The stride subsample IS the memory-access pattern of a
    nearest-neighbor downsample, so the plumbing carries realistic
    bytes-per-row and the checksum pins worker correctness."""
    return assets.select("doc_id", "data").mapInPandas(
        _resize_batches(target_w, target_h), RESIZE_SCHEMA
    )


FEATURE_SCHEMA = "doc_id BIGINT, n_bytes BIGINT, feat ARRAY<BIGINT>"


def extract_features(data: bytes) -> "object":
    """Real feature-extractor hook (CNN embedding, CLIP, mel
    spectrogram…) — requires model/codec libs absent here; the
    batching/schema around it is the deployment contract."""
    raise NotImplementedError("feature extractor not available in this environment")


def _feature_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import numpy as np
    import pandas as pd

    def hist16(b: bytes):
        # deterministic stand-in feature vector: 16-bin byte-value
        # histogram — same shape/dtype contract a learned embedding
        # would have, reproducible by byte arithmetic in the oracle
        arr = np.frombuffer(b, dtype=np.uint8)
        return np.bincount(arr >> 4, minlength=16).astype("int64").tolist()

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["data"].map(len),
                "feat": pdf["data"].map(hist16),
            }
        )


def feature_plan(assets: DataFrame) -> DataFrame:
    """Feature-extraction plumbing: binary assets → fixed-width
    feature vectors through Arrow-batched mapInPandas (the stubbed
    ``extract_features`` is the swap-in point)."""
    return assets.select("doc_id", "data").mapInPandas(_feature_batches, FEATURE_SCHEMA)
