"""Multimodal column plumbing (SURVEY.md §2.5 E20).

Media (image/audio/video) at 100 TB is an opaque ``binary`` payload
column plus a typed metadata struct, processed by Arrow-batched
``mapInPandas`` transforms. This module makes all the Spark-side
plumbing real — schemas, batch iteration, output contracts,
partition-size control — while the actual codec is STUBBED: the
container ships no image/audio libraries, so ``decode_image`` raises
``NotImplementedError`` at the clearly-marked plug point and
:func:`extract_features` uses a deterministic byte-level feature
(256-bin byte histogram folded to ``dim`` floats) so the pipeline is
end-to-end testable.

Scale notes: mapInPandas streams Arrow batches (bounded memory per
task regardless of partition size); binary payloads make input
partitions weigh far more than row counts suggest — size
``spark.sql.files.maxPartitionBytes`` down (or repartition by a key)
so a task's batch of payloads fits the worker, and NEVER collect a
binary column to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: metadata struct carried next to every payload
MEDIA_META = "format string, width int, height int, n_bytes long"
FEATURE_SCHEMA = "media_id long, n_bytes long, features array<float>"


def as_media_table(
    df: DataFrame, id_col: str, payload_col: str, fmt: str = "raw"
) -> DataFrame:
    """Normalize to the media contract: (media_id, payload binary,
    meta struct). Pure projection."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """PLUG POINT — real deployments replace this with PIL/libvips/
    ffmpeg. Not installed in this container by design."""
    raise NotImplementedError(
        "media decoding requires an image/audio codec library "
        "(PIL/libvips/ffmpeg); install one and replace decode_image()."
    )


def _byte_histogram_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a learned feature extractor: 256-bin
    byte histogram folded into ``dim`` L1-normalized floats."""
    hist = [0] * dim
    if payload:
        for b in payload:
            hist[b % dim] += 1
        total = float(len(payload))
        return [h / total for h in hist]
    return [0.0] * dim


def extract_features(
    media: DataFrame, dim: int = 16, batch_size_hint: int | None = None
) -> DataFrame:
    """media table → (media_id, n_bytes, features array<float>).

    Arrow-batched ``mapInPandas``: the worker sees an iterator of
    pandas DataFrames (one per Arrow batch), yields transformed
    batches — constant memory however large the partition. The
    feature fn is the deterministic stub; swap in a real decoder +
    model at the marked point for production.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    # PLUG POINT: decode_image(p) → model(pixels) here.
                    "features": payloads.map(
                        lambda p: _byte_histogram_features(p or b"", dim)
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms long, frame binary"


def frame_sample(
    media: DataFrame,
    frame_bytes: int = 4096,
    every: int = 10,
    ms_per_frame: int = 40,
) -> DataFrame:
    """Video → sampled frames: one input payload explodes into every
    ``every``-th fixed-size chunk as its own row (media_id,
    frame_idx, ts_ms, frame binary).

    The one-to-many mapInPandas contract a real frame sampler uses —
    output batches need not align with input rows, so a single huge
    video yields many rows without ever materializing all frames in
    one worker allocation. The "decoder" is the deterministic
    byte-chunk stand-in (PLUG POINT: pyav/ffmpeg demux + keyframe
    select); the Spark-side shape — explode fan-out, stable frame
    indices, timestamp metadata — is the real thing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "ts_ms": [], "frame": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = payload or b""
                n_frames = (len(p) + frame_bytes - 1) // frame_bytes
                # PLUG POINT: real demux/keyframe selection here.
                for i in range(0, n_frames, every):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * ms_per_frame)
                    out["frame"].append(p[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, payload binary, "
    "meta struct<format string, width int, height int, n_bytes long>"
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Binary→binary transform with metadata update — the resize
    shape. The stand-in "resampler" truncates/zero-pads each payload
    to width·height bytes (deterministic, testable); a real
    deployment decodes, resamples, re-encodes at the PLUG POINT.
    What's real: the batch-streaming binary transform, the meta
    struct rewrite (width/height/n_bytes reflect the output), and
    constant worker memory per Arrow batch.
    """
    target = int(width) * int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # PLUG POINT: decode_image(p) → resample → re-encode.
            resized = [
                (p or b"").ljust(target, b"\0")[:target] for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "meta": [
                        {
                            "format": m["format"] if m is not None else "raw",
                            "width": width,
                            "height": height,
                            "n_bytes": target,
                        }
                        for m in pdf["meta"]
                    ],
                }
            )

    return media.select("media_id", "payload", "meta").mapInPandas(
        run, RESIZED_SCHEMA
    )
