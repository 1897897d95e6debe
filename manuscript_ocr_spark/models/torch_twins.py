"""Torch-side kernel twins (SURVEY §9 item 2): real-model execution behind an
import-try, consuming loader.py-converted checkpoints.

The sandbox ships no torch, so everything here is inert locally (tests are
skipped; the dispatch seam fails fast on the driver). Where torch exists, a
real checkpoint swap is: load state_dict → loader.convert_state_dict →
build_east / build_trba → pipeline.extract_spans(weights=real) — no other
wiring changes; weights still arrive at executors as one broadcast npz blob.

Twinned layers (inference-only, functional torch built directly from the
validated tensors — the manifest IS the wiring spec):
- EAST: torchvision resnet50 feature extractor (backbone.* passthrough keys,
  reference east.py:33-67) + decoder blocks conv1x1→BN→ReLU→conv3x3→BN→ReLU
  with ×2 bilinear upsample + skip concat (east.py:70-94) + sigmoid score /
  geo 1×1 heads (east.py:97-105). Preprocess: resize to target_size,
  ToTensor, Normalize(0.5, 0.5) (infer.py:127-131, 303-305). Everything
  downstream of the maps is the engine's existing post-chain (kernels.*).
- TRBA: two stacked BidirectionalLSTMs (enc_rnn.{0,1}, model.py:323-335,
  367-370) + attention greedy decode (model.py:228-259: onehot feedback,
  AttentionCell i2h/h2h/score/LSTMCell, generator, blank mask, early all-EOS
  stop) + the exact decode_tokens / mean-exp-log-softmax confidence already
  shared with the stand-in. Preprocess: ResizeAndPad 64×256 letterbox (the
  engine's numpy port) + Normalize(0.5, 0.5) (transforms.py:179).
  The conv feature extractor (cnn.*) is the reference's custom SE-ResNet-31
  (seresnet31.py:1-187) — a third-party architecture this repo does not
  re-declare; its tensors pass through the loader opaquely and its forward
  is injected as `cnn_forward` (the checkpoint publisher's module, or any
  callable [B,3,64,256]→[B,512,H',W']). Everything after the backbone —
  pool→permute (model.py:388-390), encoder, decoder — is fully twinned.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - exercised only on torch-equipped hosts
    import torch
    import torch.nn.functional as TF

    HAVE_TORCH = True
except ImportError:  # pragma: no cover
    torch = None
    TF = None
    HAVE_TORCH = False


def require_torch(what: str):
    if not HAVE_TORCH:
        raise RuntimeError(
            f"{what} needs the real-model execution path, but torch is not "
            "installed in this environment. Install torch (and torchvision "
            "for EAST) or pass the default stand-in weights."
        )


def _t(tensors: dict, key: str):
    return torch.from_numpy(np.ascontiguousarray(tensors[key]))


# --- EAST ---------------------------------------------------------------------

def build_east(tensors: dict):
    """EAST forward from converted tensors → fn(image_uint8) → (score, geo)
    numpy maps at stride 4, matching the stand-in east_tiny.forward contract
    (east.py:96-139 semantics)."""
    require_torch("build_east")
    from torchvision.models import resnet50
    from torchvision.models.feature_extraction import create_feature_extractor

    model = resnet50(weights=None)
    extractor = create_feature_extractor(
        model,
        return_nodes={"layer1": "res1", "layer2": "res2",
                      "layer3": "res3", "layer4": "res4"},
    )
    prefix = "backbone.extractor."
    backbone_sd = {
        k[len(prefix):]: _t(tensors, k) for k in tensors if k.startswith(prefix)
    }
    extractor.load_state_dict(backbone_sd)
    extractor.eval()

    def _block(x, b: str):
        # conv1x1 → BN → ReLU → conv3x3(pad 1) → BN → ReLU (east.py:13-30)
        x = TF.conv2d(x, _t(tensors, f"{b}.conv1x1.0.weight"),
                      _t(tensors, f"{b}.conv1x1.0.bias"))
        x = TF.batch_norm(
            x, _t(tensors, f"{b}.conv1x1.1.running_mean"),
            _t(tensors, f"{b}.conv1x1.1.running_var"),
            _t(tensors, f"{b}.conv1x1.1.weight"),
            _t(tensors, f"{b}.conv1x1.1.bias"), training=False)
        x = TF.relu(x)
        x = TF.conv2d(x, _t(tensors, f"{b}.conv3x3.0.weight"),
                      _t(tensors, f"{b}.conv3x3.0.bias"), padding=1)
        x = TF.batch_norm(
            x, _t(tensors, f"{b}.conv3x3.1.running_mean"),
            _t(tensors, f"{b}.conv3x3.1.running_var"),
            _t(tensors, f"{b}.conv3x3.1.weight"),
            _t(tensors, f"{b}.conv3x3.1.bias"), training=False)
        return TF.relu(x)

    def _up(x):
        return TF.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=False)

    @torch.no_grad()
    def forward(image: np.ndarray):
        img = np.asarray(image)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        # ToTensor + Normalize(mean=.5, std=.5)  (infer.py:127-131)
        x = torch.from_numpy(img).float().permute(2, 0, 1) / 255.0
        x = (x - 0.5) / 0.5
        feats = extractor(x.unsqueeze(0))
        # decoder merge (east.py:86-93)
        h4 = _block(feats["res4"], "decoder.block1")
        h3 = _block(torch.cat([_up(h4), feats["res3"]], 1), "decoder.block2")
        h2 = _block(torch.cat([_up(h3), feats["res2"]], 1), "decoder.block3")
        h1 = _block(torch.cat([_up(h2), feats["res1"]], 1), "decoder.block4")
        score = torch.sigmoid(
            TF.conv2d(h1, _t(tensors, "output_head.score_map.weight"),
                      _t(tensors, "output_head.score_map.bias")))
        geo = TF.conv2d(h1, _t(tensors, "output_head.geo_map.weight"),
                        _t(tensors, "output_head.geo_map.bias"))
        return (
            score[0, 0].cpu().numpy(),
            geo[0].permute(1, 2, 0).cpu().numpy(),  # (H/4, W/4, 8)
        )

    return forward


def detect_quads(image: np.ndarray, cfg, east_state: dict) -> np.ndarray:
    """Real-EAST detect_quads: same resize + post-processing chain as the
    stand-in (east_tiny.detect_quads / infer.py:300-356); only the forward
    differs."""
    from ..kernels.boxes import (
        convert_to_axis_aligned,
        decode_quads_from_maps,
        expand_boxes,
        remove_area_anomalies,
        remove_fully_contained_boxes,
        scale_boxes_to_original,
    )
    from ..kernels.geometry import locality_aware_nms
    from ..kernels.image import resize

    forward = east_state.get("_forward")
    if forward is None:
        forward = build_east(east_state["tensors"])
        east_state["_forward"] = forward  # per-worker memo alongside the blob

    orig_h, orig_w = image.shape[:2]
    if (orig_h, orig_w) != (cfg.target_size, cfg.target_size):
        resized = resize(image, cfg.target_size, cfg.target_size, interp="linear")
    else:
        resized = image
    score_map, geo_map = forward(resized)
    quads = decode_quads_from_maps(
        score_map=score_map, geo_map=geo_map, score_thresh=cfg.score_thresh,
        scale=1.0 / cfg.score_geo_scale, quantization=cfg.quantization)
    quads = locality_aware_nms(quads, iou_threshold=cfg.iou_threshold)
    quads = expand_boxes(quads, expand_w=cfg.expand_ratio_w,
                         expand_h=cfg.expand_ratio_h)
    quads = scale_boxes_to_original(quads, (orig_h, orig_w), cfg.target_size)
    quads = remove_fully_contained_boxes(quads)
    quads = remove_area_anomalies(
        quads, sigma_threshold=cfg.anomaly_sigma_threshold,
        min_box_count=cfg.anomaly_min_box_count,
        enabled=cfg.remove_area_anomalies)
    if cfg.axis_aligned_output:
        quads = convert_to_axis_aligned(quads)
    return quads


# --- TRBA ---------------------------------------------------------------------

def _bilstm(x, tensors: dict, layer: int):
    """One BidirectionalLSTM(in, H, H): nn.LSTM(bidirectional, batch_first)
    + Linear(2H, H)  (model.py:323-335). Functional via torch._VF-free path:
    run the two directions with torch.nn.LSTM built from the tensors."""
    import torch.nn as nn

    p = f"enc_rnn.{layer}.rnn."
    in_dim = tensors[p + "weight_ih_l0"].shape[1]
    H = tensors[p + "weight_hh_l0"].shape[1]
    rnn = nn.LSTM(in_dim, H, bidirectional=True, batch_first=True)
    rnn.load_state_dict({
        k: _t(tensors, p + k)
        for k in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0",
                  "weight_ih_l0_reverse", "weight_hh_l0_reverse",
                  "bias_ih_l0_reverse", "bias_hh_l0_reverse")
    })
    rnn.eval()
    h, _ = rnn(x)
    return TF.linear(h, _t(tensors, f"enc_rnn.{layer}.linear.weight"),
                     _t(tensors, f"enc_rnn.{layer}.linear.bias"))


@torch.no_grad() if HAVE_TORCH else (lambda f: f)
def _greedy_decode(batch_H, tensors: dict, meta: dict):
    """model.py:228-259 verbatim semantics at eval: onehot(prev) feedback,
    AttentionCell (i2h/h2h/score softmax context + LSTMCell over
    [context, onehot]), generator logits, blank mask, argmax, early stop when
    every row has emitted <EOS>."""
    B, _, _ = batch_H.shape
    H = tensors["attn.attention_cell.h2h.weight"].shape[0]
    V = tensors["attn.generator.weight"].shape[0]
    sos, eos, blank = meta["sos_id"], meta["eos_id"], meta["blank_id"]
    steps = meta["max_len"] + 1

    w_i2h = _t(tensors, "attn.attention_cell.i2h.weight")
    w_h2h = _t(tensors, "attn.attention_cell.h2h.weight")
    b_h2h = _t(tensors, "attn.attention_cell.h2h.bias")
    w_score = _t(tensors, "attn.attention_cell.score.weight")
    w_ih = _t(tensors, "attn.attention_cell.rnn.weight_ih")
    w_hh = _t(tensors, "attn.attention_cell.rnn.weight_hh")
    b_ih = _t(tensors, "attn.attention_cell.rnn.bias_ih")
    b_hh = _t(tensors, "attn.attention_cell.rnn.bias_hh")
    w_gen = _t(tensors, "attn.generator.weight")
    b_gen = _t(tensors, "attn.generator.bias")

    proj_H = TF.linear(batch_H, w_i2h)  # [B, T, H], input-side projection
    h = torch.zeros(B, H)
    c = torch.zeros(B, H)
    targets = torch.full((B,), sos, dtype=torch.long)
    probs, preds = [], []
    for _ in range(steps):
        onehots = TF.one_hot(targets, V).float()
        # attention (model.py:35-46)
        e = TF.linear(torch.tanh(proj_H + TF.linear(h, w_h2h, b_h2h).unsqueeze(1)),
                      w_score)                       # [B, T, 1]
        alpha = TF.softmax(e, dim=1)
        context = torch.bmm(alpha.transpose(1, 2), batch_H).squeeze(1)
        x = torch.cat([context, onehots], 1)
        gates = TF.linear(x, w_ih, b_ih) + TF.linear(h, w_hh, b_hh)
        gi, gf, gc, go = gates.chunk(4, 1)           # LSTMCell gate order
        gi, gf, go = torch.sigmoid(gi), torch.sigmoid(gf), torch.sigmoid(go)
        c = gf * c + gi * torch.tanh(gc)
        h = go * torch.tanh(c)
        logits_t = TF.linear(h, w_gen, b_gen)
        if blank is not None:
            logits_t[:, blank] = -1e4                # _mask_logits (model.py:85-91)
        probs.append(logits_t.unsqueeze(1))
        targets = logits_t.argmax(1)
        preds.append(targets.unsqueeze(1))
        if (targets == eos).all():
            break
    return torch.cat(probs, 1), torch.cat(preds, 1)


def predict(images, trba_state: dict, batch_size: int = 32,
            mode: str = "greedy", cnn_forward=None):
    """Real-TRBA predict: same contract as trba_tiny.predict
    (_trba/__init__.py:290-434). cnn_forward maps normalized [B,3,64,256]
    tensors to [B,512,H',W'] feature maps (the SE-ResNet-31 backbone, see
    module docstring)."""
    require_torch("trba predict")
    if mode != "greedy":
        raise NotImplementedError(
            "the torch twin wires the pipeline's greedy path; beam on real "
            "checkpoints is served by the numpy twin "
            "(numpy_twins._beam_decode_states, model.py:93-226 semantics) — "
            "oracle.page_to_line_texts routes weights['decoding']='beam' "
            "there automatically")
    if cnn_forward is None:
        raise ValueError(
            "cnn_forward is required: the SE-ResNet-31 conv backbone "
            "(reference seresnet31.py) is the checkpoint publisher's module "
            "and is not re-declared here; pass its forward callable")
    from ..kernels.image import resize_and_pad
    from ..kernels.textproc import decode_tokens, mean_prob_confidence

    t = trba_state["tensors"]
    meta = {
        "sos_id": trba_state["stoi"]["<SOS>"],
        "eos_id": trba_state["stoi"]["<EOS>"],
        "pad_id": trba_state["stoi"]["<PAD>"],
        "blank_id": trba_state["stoi"].get("<BLANK>"),
        "max_len": trba_state.get("max_len", 25),
    }
    if not isinstance(images, list):
        images = [images]
    results = []
    with torch.no_grad():
        for i in range(0, len(images), batch_size):
            batch = []
            for crop in images[i:i + batch_size]:
                img = np.asarray(crop)
                if img.ndim == 2:
                    img = np.stack([img] * 3, axis=-1)
                lb = resize_and_pad(img, img_h=64, img_w=256)
                x = torch.from_numpy(lb).float().permute(2, 0, 1) / 255.0
                batch.append((x - 0.5) / 0.5)
            xb = torch.stack(batch)
            f = cnn_forward(xb)                       # [B, 512, H', W']
            f = TF.adaptive_avg_pool2d(f, (1, f.shape[-1])).squeeze(2)
            f = f.permute(0, 2, 1)                    # [B, W', C] (model.py:388-390)
            f = _bilstm(f, t, 0)
            f = _bilstm(f, t, 1)                      # [B, W', H]
            logits, pred_ids = _greedy_decode(f, t, meta)
            log_probs = TF.log_softmax(logits, dim=-1)
            for j in range(pred_ids.shape[0]):
                row = pred_ids[j].tolist()
                text = decode_tokens(row, trba_state["itos"],
                                     pad_id=meta["pad_id"], eos_id=meta["eos_id"],
                                     blank_id=meta["blank_id"])
                confidence = mean_prob_confidence(
                    log_probs[j].cpu().numpy(), row)
                results.append({"text": text, "confidence": confidence})
    return results
