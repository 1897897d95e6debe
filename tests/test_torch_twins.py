"""Torch-twin contract tests (SURVEY §9 item 2).

Sandbox-runnable part (no torch): the dispatch seam — real-model weights
serialize/deserialize through the same broadcast blob, and extract_spans
fails fast ON THE DRIVER when torch is absent.

Torch-equipped CI part (skipped here): build both twins from synthetic
loader-validated checkpoints and assert the I/O contracts end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from manuscript_ocr_spark.models.loader import (
    build_real_weights,
    east_manifest,
    synthetic_state_dict,
    trba_manifest,
)
from manuscript_ocr_spark.models.torch_twins import HAVE_TORCH

CHARSET = ["<PAD>", "<SOS>", "<EOS>"] + list("abc")


def _real_weights(hidden=16):
    east_sd = synthetic_state_dict(east_manifest())
    trba_sd = synthetic_state_dict(trba_manifest(hidden, len(CHARSET)))
    return build_real_weights(east_sd, trba_sd, CHARSET, hidden_size=hidden)


def test_real_weights_broadcast_roundtrip():
    """The combined checkpoint pair ships as ONE npz blob through the same
    serialize/deserialize the stand-in bank uses."""
    from manuscript_ocr_spark.models.glyphs import (
        deserialize_weights,
        serialize_weights,
    )

    w = _real_weights()
    back = deserialize_weights(serialize_weights(w))
    assert back["kind"] == "real_models"
    assert back["itos"] == CHARSET
    assert back["trba"]["hidden_size"] == 16 and back["trba"]["max_len"] == 25
    assert set(back["east"]["tensors"]) == set(w["east"]["tensors"])
    assert set(back["trba"]["tensors"]) == set(w["trba"]["tensors"])
    np.testing.assert_array_equal(
        back["east"]["tensors"]["output_head.geo_map.weight"],
        w["east"]["tensors"]["output_head.geo_map.weight"],
    )


def test_real_models_fail_fast_on_driver():
    """extract_spans(weights=real) must raise on the driver, before any job
    is submitted, when the checkpoint has no runnable backbone (round 4:
    torch absence alone no longer fails — the numpy twins execute full
    checkpoints — but a manifest-only checkpoint with no backbone.* tensors
    cannot run on either path)."""
    from manuscript_ocr_spark.fixtures import ensure_tier
    from manuscript_ocr_spark.pipeline import extract_spans, load_fixture_tables
    from manuscript_ocr_spark.session import get_spark

    spark = get_spark(master="local[2]", app_name="twins-failfast")
    docs, media = load_fixture_tables(spark, ensure_tier("sf-small"))
    with pytest.raises(ValueError, match="backbone"):
        extract_spans(docs, media, weights=_real_weights())


@pytest.mark.skipif(not HAVE_TORCH, reason="torch not installed in sandbox")
class TestTorchTwins:
    def test_east_forward_contract(self):
        """Synthetic checkpoint → maps at stride 4 with the stand-in's
        shapes; full post-chain runs."""
        from manuscript_ocr_spark.models.east_tiny import DetectorConfig
        from manuscript_ocr_spark.models.torch_twins import build_east, detect_quads

        w = _real_weights()
        fwd = build_east(w["east"]["tensors"])
        img = np.full((256, 256, 3), 255, np.uint8)
        img[64:96, 64:160] = 30
        score, geo = fwd(img)
        assert score.shape == (64, 64) and geo.shape == (64, 64, 8)
        assert 0.0 <= float(score.min()) and float(score.max()) <= 1.0
        quads = detect_quads(img, DetectorConfig(target_size=256), w["east"])
        assert quads.ndim == 2 and quads.shape[1] == 9

    def test_trba_predict_contract(self):
        """Greedy decode over synthetic weights: contract keys, charset-only
        text, confidence in [0,1]. The cnn backbone is injected (here a
        fixed random conv standing in for SE-ResNet-31)."""
        import torch

        from manuscript_ocr_spark.models.torch_twins import predict

        w = _real_weights()
        g = torch.Generator().manual_seed(0)
        conv = torch.nn.Conv2d(3, 512, 3, stride=4, padding=1)
        with torch.no_grad():
            conv.weight.copy_(torch.randn(conv.weight.shape, generator=g) * 0.01)
            conv.bias.zero_()

        crops = [np.full((20, 60), 200, np.uint8) for _ in range(3)]
        out = predict(crops, w["trba"], cnn_forward=lambda x: conv(x))
        assert len(out) == 3
        for r in out:
            assert set(r) == {"text", "confidence"}
            assert 0.0 <= r["confidence"] <= 1.0
            assert all(ch in "abc" for ch in r["text"])

    def test_pipeline_dispatch_runs(self):
        """page_to_line_texts routes through the twins without touching the
        glyph stand-ins (real checkpoint swap is data-only)."""
        from manuscript_ocr_spark.models.east_tiny import DetectorConfig
        from manuscript_ocr_spark.oracle import page_to_line_texts

        w = _real_weights()
        w["_cnn_forward"] = None  # exercised via cnn_factory in production
        img = np.full((128, 128, 3), 255, np.uint8)
        lines = page_to_line_texts(img, w, DetectorConfig(target_size=128))
        assert isinstance(lines, list)
