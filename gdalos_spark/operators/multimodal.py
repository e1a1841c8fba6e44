"""Multimodal column handling (SURVEY §2 #40) — binary payloads with
typed metadata, decoded/feature-extracted through Arrow-batched
`mapInPandas`.

The Spark-side plumbing is real and exactly what a production pipeline
needs at 100 TB: an opaque `binary` column plus typed metadata columns,
processed in Arrow record batches by a pandas iterator UDF (never
row-at-a-time Python), with the output schema declared up front so
Catalyst can prune/plan around the opaque stage. The actual image/audio
codec is STUBBED: this container has no PIL/librosa/av, so
`_decode_real` raises NotImplementedError and the pipeline uses a
deterministic fake feature extractor (mean byte value, pseudo frame
count) over the real bytes instead. Swapping `_decode_fake` for a real
codec changes nothing about the distributed plan.

This operator is rows-only in the driver contract (no SQL oracle): the
pandas stage is not expressible in DuckDB SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdalos_spark.datamodel import load

DECODE_SCHEMA = (
    "doc_id bigint, media_type string, byte_len int, "
    "feat_mean double, n_frames int, width int, height int"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal layout from `documents`: payload is the
    utf-8 text bytes standing in for an encoded image/audio/video blob,
    media_type and nominal dimensions derive deterministically from
    doc_id. At production scale this is exactly the parquet layout:
    binary column + typed metadata, partitioned by media_type."""
    docs = load(spark, sf_dir, "documents")
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        (64 + (F.col("doc_id") % 8) * 32).cast("int").alias("width"),
        (64 + (F.col("doc_id") % 5) * 32).cast("int").alias("height"),
    )


def _decode_real(payload: bytes, media_type: str):  # pragma: no cover
    """Real codec entry point — intentionally stubbed in this container."""
    raise NotImplementedError(
        "image/audio codecs (PIL/librosa/av) are not available in this "
        "container; the pipeline uses the deterministic fake extractor"
    )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract the binary column in Arrow batches via
    mapInPandas. The fake extractor computes real statistics over the
    real bytes (mean byte value, 1KiB pseudo frame count) so the batch
    shapes, schema contract, and partition behavior match a real codec
    run."""
    media = media_table(spark, sf_dir)

    def decode_batches(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            byte_len = payloads.map(len)
            feat_mean = payloads.map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if len(b) else 0.0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": byte_len.astype("int32"),
                    "feat_mean": feat_mean.round(6),
                    "n_frames": (byte_len // 1024 + 1).astype("int32"),
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    return media.mapInPandas(decode_batches, DECODE_SCHEMA)


FRAMES_SCHEMA = (
    "doc_id bigint, media_type string, frame_idx int, "
    "frame_offset int, frame_bytes int, frame_mean double"
)

FRAME_SIZE = 256  # bytes per pseudo-frame


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: a one-to-many Arrow-batched pandas stage that
    explodes each binary payload into fixed-stride frame records (every
    other frame kept — the sampling), with per-frame byte statistics.
    This is the mapInPandas shape a real video frame-sampler needs: rows
    out != rows in, schema declared up front, all byte work vectorized
    in numpy. The actual video codec is stubbed (see _decode_real); the
    fixed-stride slicing over real bytes keeps the batch shapes and
    distributed behavior identical."""
    media = media_table(spark, sf_dir)

    def frame_batches(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "media_type": [], "frame_idx": [],
                "frame_offset": [], "frame_bytes": [], "frame_mean": [],
            }
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_frames = (len(arr) + FRAME_SIZE - 1) // FRAME_SIZE
                for idx in range(0, n_frames, 2):  # sample every other frame
                    chunk = arr[idx * FRAME_SIZE:(idx + 1) * FRAME_SIZE]
                    out["doc_id"].append(doc_id)
                    out["media_type"].append(mtype)
                    out["frame_idx"].append(idx)
                    out["frame_offset"].append(idx * FRAME_SIZE)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_mean"].append(round(float(chunk.mean()), 6))
            yield pd.DataFrame(out)

    return media.mapInPandas(frame_batches, FRAMES_SCHEMA)
