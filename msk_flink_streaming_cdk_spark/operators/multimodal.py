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
