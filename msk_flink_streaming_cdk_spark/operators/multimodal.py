"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(schemas.MULTIMODAL_ASSET); decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so each
executor processes whole record batches without JVM round-trips.

The actual codecs (PIL/ffmpeg/etc.) are NOT in this container, so the
decode step defaults to a STUB: ``decode_stub=True`` produces
deterministic fake features (documented below). ``decode_stub=False``
is the CLUSTER path: each stage takes an injectable ``decoder`` /
``prober`` callable (pickled into the UDF closure, so it reaches the
Python workers like any other closure) defaulting to a Pillow-backed
image decoder / PyAV-backed duration probe that raises a clear
NotImplementedError only when the library is genuinely absent. The
Spark-side plumbing — schema, batching, partitioning, UDF signature,
closure shipping — is identical either way and tested in-sandbox by
injecting deterministic fake decoders (a ``sys.modules`` monkeypatch
would NOT reach the worker processes; a pickled callable does).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pil_image_decoder(data: bytes) -> tuple[int, int]:
    """Default real decoder: (width, height) via Pillow. Raises
    NotImplementedError when Pillow is missing (this sandbox) — a
    cluster deployment installs Pillow on executors and this just
    works; any other callable ``bytes -> (w, h)`` can be injected
    instead (e.g. a turbojpeg header parse)."""
    import io

    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - PIL absent here
        raise NotImplementedError(
            "real image decode requires Pillow on the executors "
            "(pip install Pillow) — or inject decoder=..., or use "
            "decode_stub=True"
        ) from exc
    with Image.open(io.BytesIO(data)) as im:
        return int(im.width), int(im.height)


def av_duration_prober(data: bytes) -> int:
    """Default real media-duration probe (ms) via PyAV. Same
    optional-import contract as ``pil_image_decoder``."""
    import io

    try:
        import av
    except ImportError as exc:  # pragma: no cover - av absent here
        raise NotImplementedError(
            "real duration probe requires PyAV on the executors "
            "(pip install av) — or inject prober=..., or use "
            "decode_stub=True"
        ) from exc
    with av.open(io.BytesIO(data)) as container:
        return int(container.duration // 1000)

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


def extract_features(
    assets: DataFrame,
    decode_stub: bool = True,
    decoder: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real pipeline shape: repartition so batches are balanced, then one
    Arrow pass computing per-asset features. The md5/n_bytes columns
    are real computations on the payload bytes (oracle-checkable).
    With ``decode_stub=True`` the width/height are a deterministic
    fake derived from the byte length; with ``decode_stub=False`` the
    per-IMAGE dims come from ``decoder`` (default
    ``pil_image_decoder``), and non-image rows get NULL dims (their
    decode belongs to the audio/video stages)."""
    decoder = decoder or pil_image_decoder

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
                w = (64 + (n_bytes * 2654435761) % 1024).astype("Int32")
                h = (64 + (n_bytes * 40503) % 1024).astype("Int32")
            else:
                is_img = pdf["modality"] == "image"
                dims = [
                    decoder(bytes(b)) if img else (None, None)
                    for b, img in zip(payloads, is_img)
                ]
                w = pd.array([d[0] for d in dims], dtype="Int32")
                h = pd.array([d[1] for d in dims], dtype="Int32")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": n_bytes,
                    "payload_md5": digests,
                    "fake_width": w,
                    "fake_height": h,
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id long, modality string, src_width int, src_height int, "
    "out_width int, out_height int"
)


def resize_assets(
    assets: DataFrame,
    max_dim: int = 256,
    decode_stub: bool = True,
    decoder: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """mapInPandas resize stage: decode → scale longest side to
    ``max_dim`` (never upscale). Aspect-preserving integer math
    (``w * max_dim // max(w, h)``) so the output is
    engine-reproducible for ANY decoder; source dims come from the
    deterministic stub (``decode_stub=True``) or from ``decoder``
    (default ``pil_image_decoder``) on the cluster path."""
    decoder = decoder or pil_image_decoder

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = pdf["payload"].map(len).astype("int64")
            if decode_stub:
                # same deterministic fake-decode dims as extract_features
                w = (64 + (n_bytes * 2654435761) % 1024).astype("int64")
                h = (64 + (n_bytes * 40503) % 1024).astype("int64")
            else:
                dims = [decoder(bytes(b)) for b in pdf["payload"]]
                w = pd.Series(
                    [d[0] for d in dims], index=pdf.index, dtype="int64"
                )
                h = pd.Series(
                    [d[1] for d in dims], index=pdf.index, dtype="int64"
                )
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
    assets: DataFrame,
    every_ms: int = 1000,
    decode_stub: bool = True,
    prober: Callable[[bytes], int] | None = None,
) -> DataFrame:
    """mapInPandas frame sampling for video assets: one output row per
    sampled frame — the 1→N fan-out batch shape (unlike the 1→1
    feature/resize stages). Duration comes from the deterministic
    byte-length stub (``decode_stub=True``) or from ``prober``
    (default ``av_duration_prober``, ms) on the cluster path."""
    prober = prober or av_duration_prober

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["modality"] == "video"]
            if len(vids) == 0:
                continue
            n_bytes = vids["payload"].map(len).astype("int64")
            if decode_stub:
                duration_ms = 1000 + (n_bytes * 7919) % 30000
            else:
                duration_ms = pd.Series(
                    [int(prober(bytes(b))) for b in vids["payload"]],
                    index=vids.index,
                    dtype="int64",
                )
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
