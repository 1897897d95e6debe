"""Weights-loader contract (SURVEY.md §9.4): a real EAST/TRBA checkpoint
swap must be data-only. Validates the declared reference layouts
(east.py:13-108, model.py:10-74), the fail-fast rejection paths, and the
broadcast npz round-trip."""

import numpy as np
import pytest

from manuscript_ocr_spark.models.loader import (
    convert_state_dict,
    deserialize_model_weights,
    east_manifest,
    serialize_model_weights,
    synthetic_state_dict,
    trba_manifest,
)


def test_east_roundtrip_with_backbone_passthrough():
    sd = synthetic_state_dict(east_manifest())
    sd["backbone.extractor.conv1.weight"] = np.zeros((64, 3, 7, 7), np.float16)
    sd["decoder.block1.conv1x1.1.num_batches_tracked"] = np.array(12)
    w = convert_state_dict(sd, "east")
    assert w["kind"] == "east_state"
    assert "decoder.block1.conv1x1.1.num_batches_tracked" not in w["tensors"]
    assert w["tensors"]["backbone.extractor.conv1.weight"].dtype == np.float32
    back = deserialize_model_weights(serialize_model_weights(w))
    assert back["kind"] == "east_state"
    assert set(back["tensors"]) == set(w["tensors"])
    for k in w["tensors"]:
        np.testing.assert_array_equal(back["tensors"][k], w["tensors"][k])


def test_trba_roundtrip_carries_charset():
    charset = ["<PAD>", "<SOS>", "<EOS>", "a", "b", "c"]
    sd = synthetic_state_dict(trba_manifest(32, len(charset), 48))
    w = convert_state_dict(sd, "trba", charset=charset, hidden_size=32, input_size=48)
    back = deserialize_model_weights(serialize_model_weights(w))
    assert back["itos"] == charset and back["stoi"]["a"] == 3
    assert back["hidden_size"] == 32 and back["input_size"] == 48
    assert back["tensors"]["Prediction.generator.weight"].shape == (6, 32)


def test_shape_mismatch_and_unknown_key_fail_fast():
    sd = synthetic_state_dict(east_manifest())
    sd["output_head.geo_map.weight"] = np.zeros((9, 32, 1, 1), np.float32)
    with pytest.raises(ValueError, match="shape"):
        convert_state_dict(sd, "east")
    sd = synthetic_state_dict(east_manifest())
    sd["detector.head.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unexpected key"):
        convert_state_dict(sd, "east")
    sd = synthetic_state_dict(east_manifest())
    del sd["output_head.score_map.bias"]
    with pytest.raises(ValueError, match="missing"):
        convert_state_dict(sd, "east")
    with pytest.raises(ValueError, match="charset"):
        convert_state_dict({}, "trba")


def test_manifest_shapes_match_reference_wiring():
    """Spot-pin the transcription: decoder block2 consumes 512+1024 channels
    (east.py:76-78), attention LSTMCell consumes input+num_classes
    (model.py:30)."""
    m = east_manifest()
    assert m["decoder.block2.conv1x1.0.weight"] == (256, 1536, 1, 1)
    assert m["output_head.geo_map.weight"] == (8, 32, 1, 1)
    t = trba_manifest(hidden_size=256, num_classes=100, input_size=512)
    assert t["Prediction.attention_cell.rnn.weight_ih"] == (1024, 612)
    assert t["SequenceModeling.linear.weight"] == (256, 512)
