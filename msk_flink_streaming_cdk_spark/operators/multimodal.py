"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(schemas.MULTIMODAL_ASSET); decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so each
executor processes whole record batches without JVM round-trips.

The actual codecs (PIL/ffmpeg/etc.) are NOT in this container, so the
decode step is STUBBED: ``decode_stub=True`` produces deterministic
fake features (documented below); ``decode_stub=False`` raises
NotImplementedError where the real library call belongs. Everything
around the stub — schema, batching, partitioning, UDF signature — is
real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id long, modality string, n_bytes long, payload_md5 string, "
    "fake_width int, fake_height int"
)


def synth_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic multimodal asset table from the documents fixture
    (no media libs in-container): payload = UTF-8 bytes of text,
    modality cycles by doc_id."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.concat(modality, F.lit("/synthetic")).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def extract_features(assets: DataFrame, decode_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real pipeline shape: repartition so batches are balanced, then one
    Arrow pass computing per-asset features. The md5/n_bytes columns
    are real computations on the payload bytes (oracle-checkable); the
    width/height are the stubbed decode outputs (deterministic fake
    derived from the digest)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            digests = payloads.map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()
            )
            n_bytes = payloads.map(len).astype("int64")
            if decode_stub:
                # Deterministic fake decode (oracle-reproducible):
                # dims derived from the byte length.
                fake_w = 64 + (n_bytes * 2654435761) % 1024
                fake_h = 64 + (n_bytes * 40503) % 1024
            else:
                raise NotImplementedError(
                    "real decode requires PIL/ffmpeg — not in container"
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": n_bytes,
                    "payload_md5": digests,
                    "fake_width": fake_w.astype("int32"),
                    "fake_height": fake_h.astype("int32"),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id long, modality string, src_width int, src_height int, "
    "out_width int, out_height int"
)


def resize_assets(
    assets: DataFrame, max_dim: int = 256, decode_stub: bool = True
) -> DataFrame:
    """mapInPandas resize stage: decode → scale longest side to
    ``max_dim`` (never upscale) → re-encode. Aspect-preserving integer
    math (``w * max_dim // max(w, h)``) so the stubbed output is
    engine-reproducible; the real PIL resize belongs where the
    NotImplementedError is raised."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = pdf["payload"].map(len).astype("int64")
            if not decode_stub:
                raise NotImplementedError(
                    "real decode/resize requires PIL — not in container"
                )
            # same deterministic fake-decode dims as extract_features
            w = (64 + (n_bytes * 2654435761) % 1024).astype("int64")
            h = (64 + (n_bytes * 40503) % 1024).astype("int64")
            longest = w.combine(h, max)
            scale_needed = longest > max_dim
            out_w = w.where(~scale_needed, w * max_dim // longest)
            out_h = h.where(~scale_needed, h * max_dim // longest)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "src_width": w.astype("int32"),
                    "src_height": h.astype("int32"),
                    "out_width": out_w.astype("int32"),
                    "out_height": out_h.astype("int32"),
                }
            )

    return assets.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "asset_id long, frame_idx long, frame_ts_ms long"


def sample_frames(
    assets: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """mapInPandas frame sampling for video assets: one output row per
    sampled frame — the 1→N fan-out batch shape (unlike the 1→1
    feature/resize stages). Stubbed duration is a deterministic
    function of the byte length; the real ffmpeg probe/extract belongs
    at the NotImplementedError."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["modality"] == "video"]
            if len(vids) == 0:
                continue
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg — not in container"
                )
            n_bytes = vids["payload"].map(len).astype("int64")
            duration_ms = 1000 + (n_bytes * 7919) % 30000
            n_frames = (duration_ms + every_ms - 1) // every_ms
            out = pd.DataFrame(
                {
                    "asset_id": vids["asset_id"].repeat(n_frames).values,
                    "frame_idx": [
                        i for n in n_frames for i in range(int(n))
                    ],
                }
            )
            out["frame_ts_ms"] = out["frame_idx"] * every_ms
            yield out

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


SEGMENT_BYTES_PER_SEC = 32_000  # 16 kHz mono s16le


def segment_audio(
    assets: DataFrame, segment_ms: int = 10
) -> DataFrame:
    """Fixed-duration audio segmentation PLAN: byte-range boundaries
    per segment computed from payload length and the PCM byte rate
    (16 kHz mono s16le = 32 000 B/s) — the partitioning step that
    precedes any real transcription/embedding stage. Pure Catalyst
    (sequence + explode), no decode needed: segment boundaries are
    arithmetic on lengths, so the whole stage stays JVM-side and the
    heavy payload column is never carried past the length read."""
    seg_bytes = SEGMENT_BYTES_PER_SEC * segment_ms // 1000
    n_bytes = F.length("payload").cast("long")
    n_segs = F.ceil(n_bytes / F.lit(float(seg_bytes))).cast("long")
    return (
        assets.filter(F.col("modality") == "audio")
        .select(
            "asset_id",
            n_bytes.alias("n_bytes"),
            F.explode(
                F.sequence(F.lit(0).cast("long"), n_segs - 1)
            ).alias("seg_idx"),
        )
        .select(
            "asset_id",
            "seg_idx",
            (F.col("seg_idx") * seg_bytes).alias("start_byte"),
            F.least(
                (F.col("seg_idx") + 1) * seg_bytes, F.col("n_bytes")
            ).alias("end_byte"),
            (F.col("seg_idx") * segment_ms).alias("start_ms"),
        )
    )


ARROW_STATS_SCHEMA = (
    "asset_id long, modality string, n_bytes long, payload_md5 string"
)


def arrow_byte_stats(assets: DataFrame) -> DataFrame:
    """mapInArrow byte-stats stage: the Arrow-NATIVE batch path (no
    Arrow→pandas conversion at all — each batch stays a
    ``pyarrow.RecordBatch``). Length stats run vectorized in Arrow
    compute (``pc.binary_length`` on the binary buffer); the md5
    digest is inherently per-row, computed straight off the Arrow
    buffer views. This is the shape for decode-adjacent work where
    pandas conversion of a large binary column would double memory:
    the payload bytes are touched exactly once, zero-copy from the
    Arrow buffers."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it):
        for batch in it:
            payload = batch.column(batch.schema.get_field_index("payload"))
            digests = pa.array(
                [
                    hashlib.md5(p.as_py()).hexdigest()
                    if p.is_valid
                    else None
                    for p in payload
                ],
                type=pa.string(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(
                        batch.schema.get_field_index("asset_id")
                    ),
                    batch.column(
                        batch.schema.get_field_index("modality")
                    ),
                    pc.cast(pc.binary_length(payload), pa.int64()),
                    digests,
                ],
                names=["asset_id", "modality", "n_bytes", "payload_md5"],
            )

    return assets.mapInArrow(batches, schema=ARROW_STATS_SCHEMA)
