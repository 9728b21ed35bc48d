"""Multimodal column handling for training-data pipelines.

Media (image/audio/video) are opaque ``binary`` payload columns plus typed
metadata — the storage shape that survives 100 TB: payloads stay columnar
in parquet, never hit the JVM heap as strings, and flow to Python workers
as Arrow binary batches only in the stages that need bytes.

The decode step itself is a **stub**: this container has no image/audio
codecs, so ``real=True`` raises ``NotImplementedError`` where PIL/ffmpeg
would be called, and the default deterministic fake parser derives
metadata from the payload bytes alone.  Everything AROUND the decode —
schemas, Arrow batch iteration, ``mapInPandas`` signatures, per-frame
explode, feature vectors — is real and tested; swapping in a real codec
changes only the marked function bodies.

Scale notes: ``decode_media`` and ``sample_frames`` are map-side-only
(``mapInPandas`` preserves partitioning, no shuffle); metadata
aggregations afterwards are plain hash aggregations.  Feature extraction
returns fixed-width ``array<float>`` ready for the operators in
``similarity.py`` (LSH bucketing / cosine top-k).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

MEDIA_TYPES = ("image", "audio", "video")
_FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}

DECODED_SCHEMA = (
    "media_id BIGINT, media_type STRING, format STRING, "
    "width INT, height INT, n_bytes INT"
)
FRAME_SCHEMA = "media_id BIGINT, frame_idx INT, frame BINARY"


def media_table(spark, sf_dir: str):
    """Derive a media table from ``documents``: payload = the UTF-8 bytes
    of the text (a deterministic stand-in for real image/audio bytes),
    media_type round-robined by doc_id."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    types = F.array(*[F.lit(t) for t in MEDIA_TYPES])
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(types, (F.col("doc_id") % 3 + 1).cast("int")).alias(
            "media_type"
        ),
        F.encode("text", "UTF-8").alias("payload"),
    )


def _fake_parse(media_type: str, payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic fake header parse — metadata from byte length only,
    so a SQL oracle can recompute it exactly."""
    n = len(payload)
    width = (n * 7) % 640 + 16
    height = (n * 13) % 480 + 16
    return _FORMATS[media_type], width, height, n


def decode_media(media_df, real: bool = False):
    """Binary payload -> typed metadata via ``mapInPandas``.

    ``real=True`` is the integration point for actual codecs (PIL,
    soundfile, ffmpeg): not available in this container."""

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:
            # STUB: real decoding needs image/audio libraries that are not
            # installed here.  Plug `PIL.Image.open(io.BytesIO(payload))`
            # (etc.) into this branch on a cluster that has them.
            raise NotImplementedError(
                "real media decoding requires codec libraries not present "
                "in this environment; use real=False for the deterministic "
                "fake parser"
            )
        for pdf in batches:
            parsed = [
                _fake_parse(mt, pl)
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "format": [p[0] for p in parsed],
                    "width": pd.Series([p[1] for p in parsed], dtype="int32"),
                    "height": pd.Series([p[2] for p in parsed], dtype="int32"),
                    "n_bytes": pd.Series([p[3] for p in parsed], dtype="int32"),
                }
            )

    return media_df.mapInPandas(parse_batches, DECODED_SCHEMA)


def sample_frames(media_df, stride: int = 256):
    """Per-media frame sampling: payload -> one row per ``stride``-byte
    slice (the video-frame / audio-window analogue).  Map-side explode —
    output rows stay in the input partition."""

    def slice_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, pl in zip(pdf["media_id"], pdf["payload"]):
                for k in range(0, max(len(pl), 1), stride):
                    ids.append(mid)
                    idxs.append(k // stride)
                    frames.append(bytes(pl[k : k + stride]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media_df.mapInPandas(slice_batches, FRAME_SCHEMA)


def resize_media(media_df, target_bytes: int = 4096, real: bool = False):
    """Resize: payload -> fixed-size payload (truncate / cycle-pad), with
    the real-codec branch (PIL thumbnail / ffmpeg scale) stubbed exactly
    like ``decode_media``.  Map-side only; output schema == input schema
    plus ``orig_bytes`` so the pipeline stays re-entrant."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:
            # STUB: a real implementation decodes, rescales pixels/samples,
            # and re-encodes; codec libraries are not in this container.
            raise NotImplementedError(
                "real media resizing requires codec libraries not present "
                "in this environment; use real=False for byte-level resize"
            )
        for pdf in batches:
            out_payloads, orig = [], []
            for pl in pdf["payload"]:
                orig.append(len(pl))
                if len(pl) >= target_bytes:
                    out_payloads.append(bytes(pl[:target_bytes]))
                else:
                    reps = -(-target_bytes // max(len(pl), 1))
                    out_payloads.append(bytes((pl * reps)[:target_bytes]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": out_payloads,
                    "orig_bytes": pd.Series(orig, dtype="int32"),
                }
            )

    return media_df.mapInPandas(
        resize_batches,
        "media_id BIGINT, media_type STRING, payload BINARY, orig_bytes INT",
    )


def extract_features(media_df, bins: int = 16, out_col: str = "features"):
    """Payload -> fixed-width float feature vector (normalized byte
    histogram — the deterministic stand-in for a real image/audio
    embedding model).  Vectorized numpy over Arrow batches; output feeds
    ``similarity.cosine_topk`` / ``with_lsh_bucket`` directly."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def featurize(payloads: pd.Series) -> pd.Series:
        out = []
        for pl in payloads:
            if pl is None or len(pl) == 0:
                out.append([0.0] * bins)
                continue
            arr = np.frombuffer(pl, dtype=np.uint8)
            hist = np.bincount(arr // (256 // bins), minlength=bins).astype(
                np.float64
            )
            out.append((hist / hist.sum()).astype(np.float32).tolist())
        return pd.Series(out)

    return media_df.withColumn(out_col, featurize("payload"))
