"""Cluster-path multimodal decode: the injectable decoder/prober.

The stub path is oracle-checked by the registry queries
(multimodal_feature_extract / _resize_plan / _frame_samples /
_arrow_byte_stats). These tests cover the ``decode_stub=False``
CLUSTER path by injecting deterministic fake decoders — a pickled
callable reaches the Python workers like any closure, which is
exactly how the default Pillow/PyAV decoders ship; a ``sys.modules``
monkeypatch would never leave the driver process.
"""

from __future__ import annotations

import os

import pytest

from msk_flink_streaming_cdk_spark.operators.multimodal import (
    av_duration_prober,
    extract_features,
    pil_image_decoder,
    resize_assets,
    sample_frames,
    synth_assets_from_documents,
)


@pytest.fixture(scope="module")
def assets(spark, sf_small):
    docs = spark.read.parquet(
        os.path.join(sf_small, "documents.parquet")
    ).limit(60)
    return synth_assets_from_documents(docs).cache()


def _fake_decoder(data: bytes) -> tuple[int, int]:
    # Deterministic, content-derived — stands in for PIL.Image.open.
    return 100 + data[0] % 50, 200 + len(data) % 70


def _fake_prober(data: bytes) -> int:
    return 1500 + (len(data) % 7) * 1000


def test_extract_features_injected_decoder(assets):
    rows = {
        r.asset_id: r
        for r in extract_features(
            assets, decode_stub=False, decoder=_fake_decoder
        ).collect()
    }
    payloads = {
        r.asset_id: (r.modality, bytes(r.payload))
        for r in assets.collect()
    }
    assert rows.keys() == payloads.keys()
    for aid, r in rows.items():
        modality, payload = payloads[aid]
        assert r.n_bytes == len(payload)
        if modality == "image":
            assert (r.fake_width, r.fake_height) == _fake_decoder(payload)
        else:
            # non-image decode belongs to the audio/video stages
            assert r.fake_width is None and r.fake_height is None


def test_extract_features_stub_and_real_share_plumbing(assets):
    # md5/n_bytes are decode-independent: identical across paths.
    stub = {
        r.asset_id: (r.n_bytes, r.payload_md5)
        for r in extract_features(assets, decode_stub=True).collect()
    }
    real = {
        r.asset_id: (r.n_bytes, r.payload_md5)
        for r in extract_features(
            assets, decode_stub=False, decoder=_fake_decoder
        ).collect()
    }
    assert stub == real


def test_resize_assets_injected_decoder(assets):
    rows = resize_assets(
        assets, max_dim=128, decode_stub=False, decoder=_fake_decoder
    ).collect()
    payloads = {
        r.asset_id: bytes(r.payload) for r in assets.collect()
    }
    assert len(rows) == len(payloads)
    for r in rows:
        w, h = _fake_decoder(payloads[r.asset_id])
        assert (r.src_width, r.src_height) == (w, h)
        longest = max(w, h)
        if longest > 128:
            assert (r.out_width, r.out_height) == (
                w * 128 // longest,
                h * 128 // longest,
            )
            assert max(r.out_width, r.out_height) == 128
        else:
            assert (r.out_width, r.out_height) == (w, h)


def test_sample_frames_injected_prober(assets):
    rows = sample_frames(
        assets, every_ms=1000, decode_stub=False, prober=_fake_prober
    ).collect()
    vids = {
        r.asset_id: bytes(r.payload)
        for r in assets.filter("modality = 'video'").collect()
    }
    got: dict[int, list[int]] = {}
    for r in rows:
        got.setdefault(r.asset_id, []).append(r.frame_idx)
        assert r.frame_ts_ms == r.frame_idx * 1000
    assert got.keys() == vids.keys()
    for aid, idxs in got.items():
        dur = _fake_prober(vids[aid])
        n = (dur + 999) // 1000
        assert sorted(idxs) == list(range(n))


def test_default_decoders_raise_clear_not_implemented():
    # Pillow / PyAV are genuinely absent in this container: the
    # DEFAULT decoders must fail actionably, not with a bare
    # ImportError from inside a worker.
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present — default decoder is live")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        pil_image_decoder(b"\x89PNG\r\n")
    try:
        import av  # noqa: F401

        pytest.skip("PyAV present — default prober is live")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PyAV"):
        av_duration_prober(b"\x00\x00")
