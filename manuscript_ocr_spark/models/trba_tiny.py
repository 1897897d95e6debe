"""TrbaTiny — deterministic numpy stand-in recognizer.

Same I/O contract as the reference TRBA recognizer
(reference: src/manuscript/recognizers/_trba/__init__.py:290-434):
`predict(list_of_crops) -> list of {"text": str, "confidence": float}`, with
`batch_size` micro-batching (O3, _trba/__init__.py:382-390), the
ResizeAndPadA 64×256 letterbox preprocessing (transforms.py:62-120 — our
numpy port), greedy decode to token ids, `decode_tokens` (transforms.py:
196-206 verbatim port) and mean-exp-log-softmax confidence
(_trba/__init__.py:413-430).

The "network" replaces SEResNet31+BiLSTM+attention (model.py:338-416; torch
absent offline) with a deterministic glyph-prototype matcher: segment the
letterboxed crop's ink region into equal-width cells (the fixture glyphs are
monospaced squares), down-pool each cell to an 8×8 binary patch, and emit
per-timestep logits = −Hamming distance to the broadcast glyph bank. Greedy
argmax per step then <EOS> — the reference's greedy mode (model.py:227-259).
"""

from __future__ import annotations

import numpy as np

from ..kernels.image import luminance, resize_and_pad
from ..kernels.textproc import decode_tokens, mean_prob_confidence
from .glyphs import COARSE, GLYPH_GAP_RATIO, GLYPH_SIZE

INK_THRESH = 140  # between blurred ink (≈20..110) and word background (200)
NEG = -100.0      # logit floor for non-candidate tokens


def _log_softmax(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    z = logits - m
    return z - np.log(np.exp(z).sum(axis=-1, keepdims=True))


from functools import lru_cache


@lru_cache(maxsize=4096)
def _frac_axis_weights(lo: float, hi: float, n_out: int, size: int) -> np.ndarray:
    """(n_out, size) overlap weights pooling the fractional interval [lo, hi)
    into n_out equal cells (area average with fractional edges).

    lru_cache: crops on rendered pages share a handful of (lo, hi, size)
    windows, so the weight matrices repeat heavily; the cache returns the
    SAME ndarray (callers only read it — wy @ mask @ wx.T)."""
    w = np.zeros((n_out, size), dtype=np.float64)
    span = (hi - lo) / n_out
    for d in range(n_out):
        a = lo + d * span
        b = a + span
        i0 = max(0, int(np.floor(a)))
        i1 = min(size, int(np.ceil(b)))
        total = 0.0
        for i in range(i0, i1):
            ov = min(b, i + 1) - max(a, i)
            if ov > 0:
                w[d, i] = ov
                total += ov
        if total > 0:
            w[d] /= total
    return w


def _pool_fractional(mask: np.ndarray, y0: float, y1: float, x0: float, x1: float,
                     out_h: int = GLYPH_SIZE, out_w: int = GLYPH_SIZE) -> np.ndarray:
    """Area-average the float ink mask over the fractional window
    [y0,y1)×[x0,x1) into an (out_h, out_w) patch — sub-pixel cell alignment
    so resampled glyph cells pool without integer-rounding drift."""
    wy = _frac_axis_weights(y0, y1, out_h, mask.shape[0])
    wx = _frac_axis_weights(x0, x1, out_w, mask.shape[1])
    return wy @ mask @ wx.T


# per-process memo of the normalized coarse-grid glyph prototypes, keyed
# by identity of the glyphs array (stable per deserialized weights blob —
# the pipeline._WEIGHTS_CACHE pattern): the slice+reshape+norm is identical
# for every crop, and recomputing it per crop was measurable at bench
# page rates. Holding the array in the value keeps the id stable.
_PROTO_CACHE: dict = {}


def _proto_normed(glyphs: np.ndarray) -> np.ndarray:
    key = id(glyphs)
    hit = _PROTO_CACHE.get(key)
    if hit is not None and hit[0] is glyphs:
        return hit[1]
    # coarse-grid prototypes (glyphs are COARSE patterns upsampled 2×)
    proto = glyphs[:, ::2, ::2].reshape(len(glyphs), -1).astype(np.float64)
    proto_n = proto / np.linalg.norm(proto, axis=1, keepdims=True)
    _PROTO_CACHE.clear()
    _PROTO_CACHE[key] = (glyphs, proto_n)
    return proto_n


def _crop_logits(crop: np.ndarray, weights: dict) -> np.ndarray:
    """One crop → (T, V) logits, T = n_cells + 1 (chars then <EOS> step)."""
    glyphs = weights["glyphs"]
    V = len(weights["itos"])
    eos = weights["eos_id"]
    max_len = weights["max_len"]

    # single-channel hot path: every downstream feature is luminance-based,
    # so letterbox the gray plane (3x less resample work and memory traffic
    # than RGB; identical values for replicated-channel inputs — the
    # channel mean is re-quantized to uint8 exactly like per-channel rint)
    g = luminance(np.asarray(crop))
    if g.dtype != np.uint8:
        g = np.clip(np.rint(g), 0, 255).astype(np.uint8)
    gray = resize_and_pad(g, img_h=weights["img_h"], img_w=weights["img_w"])
    ink = gray < INK_THRESH
    ys, xs = np.nonzero(ink)

    if len(ys) == 0:
        logits = np.full((1, V), NEG, dtype=np.float64)
        logits[0, eos] = 0.0
        return logits

    y0, y1 = float(ys.min()), float(ys.max() + 1)
    x0, x1 = float(xs.min()), float(xs.max() + 1)
    h = y1 - y0
    w = x1 - x0

    # monospaced square glyphs: cell width == ink height, gap == 0.75 * cell
    gap = GLYPH_GAP_RATIO * h
    n = int(round((w + gap) / (h + gap)))
    n = max(1, min(n, max_len))

    stride = (w + gap) / n
    # continuous darkness field in [0,1]: word background (200) → 0,
    # ink (20) → 1 — pooling this avoids ink-threshold jaggies entirely
    dark = np.clip((200.0 - gray) / 180.0, 0.0, 1.0)
    proto_n = _proto_normed(glyphs)

    logits = np.full((n + 1, V), NEG, dtype=np.float64)
    # hoist the row pooling out of the cell loop (round-8): every cell's
    # _pool_fractional evaluates (wy @ dark) @ wx.T left-to-right, and
    # wy @ dark — the dominant GEMM, over the full crop — is identical
    # across cells (same wy, same dark). Same inputs → same BLAS result,
    # so pooled values are bit-identical to the per-cell calls.
    wy = _frac_axis_weights(y0, y1, COARSE, dark.shape[0])
    row_pooled = wy @ dark
    for i in range(n):
        cs = x0 + i * stride
        wx = _frac_axis_weights(cs, cs + h, COARSE, dark.shape[1])
        pooled = (row_pooled @ wx.T).ravel()
        nrm = np.linalg.norm(pooled)
        if nrm > 0:
            # scale-invariant cosine similarity to each glyph prototype —
            # robust to resampling blur shrinking the pooled magnitudes;
            # sharpened ×16 so the softmax confidence is meaningful
            sims = proto_n @ (pooled / nrm)
            logits[i, 3 : 3 + len(sims)] = 16.0 * sims
    logits[n, eos] = 0.0
    return logits


def _beam_decode(
    logits: np.ndarray,
    eos_id: int,
    beam_size: int,
    alpha: float,
    temperature: float,
    max_len: int,
):
    """Beam search over per-step logits — the reference's beam algorithm
    (model.py:92-225 verbatim: temperature scaling, length penalty
    lp = ((5+t+1)^α)/6^α applied to the running sum, finished-beam masking
    to -inf-except-EOS=0, top-k over beam×V with first-index tie order, and
    a per-beam trace of the temperature-scaled logits for confidence).

    Our stand-in decoder is stateless (step logits don't depend on the
    emitted prefix), so beam provably returns the greedy argmax path — the
    property tests/test_eval_beam.py pins. The mode exists for contract
    parity (reference predict(mode='beam', beam_size=8, T=1.7, α=0.9)).
    """
    T0, V = logits.shape
    k = beam_size
    steps = min(max_len, max(T0, 1))

    beam_tokens = [[] for _ in range(k)]
    beam_scores = np.full(k, -np.inf)
    beam_scores[0] = 0.0
    finished = np.zeros(k, dtype=bool)
    trace = [[] for _ in range(k)]  # per-beam list of (V,) scaled logits

    lp = 1.0
    for t in range(steps):
        step_logits = logits[min(t, T0 - 1)].copy()
        if temperature != 1.0:
            step_logits = step_logits / max(temperature, 1e-6)
        log_probs = _log_softmax(step_logits[None, :])[0]

        lp_t = ((5.0 + (t + 1)) ** alpha) / (6.0 ** alpha) if alpha > 0 else 1.0

        next_scores = np.empty((k, V))
        for b in range(k):
            if finished[b]:
                row = np.full(V, -np.inf)
                row[eos_id] = 0.0
            else:
                row = log_probs
            next_scores[b] = beam_scores[b] + row
        scaled = next_scores / lp_t if alpha > 0 else next_scores

        flat = scaled.reshape(-1)
        # torch.topk tie order: descending value, then lower flat index
        order = np.argsort(-flat, kind="stable")[:k]
        top_scores = flat[order]
        next_beam = order // V
        next_token = order % V

        beam_tokens = [beam_tokens[nb] + [int(tok)] for nb, tok in zip(next_beam, next_token)]
        trace = [trace[nb] + [step_logits] for nb in next_beam]
        beam_scores = top_scores * lp_t if alpha > 0 else top_scores
        finished = finished[next_beam] | (next_token == eos_id)
        lp = lp_t
        if finished.all():
            break

    best = int(np.argmax(beam_scores))
    return np.array(beam_tokens[best], dtype=np.int64), np.stack(trace[best])


def predict(
    images,
    weights: dict,
    batch_size: int = 32,
    mode: str = "greedy",
    beam_size: int = 8,
    temperature: float = 1.7,
    alpha: float = 0.9,
):
    """list of RGB (or grayscale) crops → list of {"text", "confidence"}.
    Contract: reference _trba/__init__.py:290-434; modes greedy | beam with
    the reference's beam defaults (beam_size=8, T=1.7, α=0.9)."""
    if not isinstance(images, list):
        images = [images]

    results = []
    for i in range(0, len(images), batch_size):
        for crop in images[i : i + batch_size]:
            logits = _crop_logits(crop, weights)
            if mode == "greedy":
                pred_ids = logits.argmax(axis=-1)  # greedy decode per step
                log_probs = _log_softmax(logits)
            elif mode == "beam":
                pred_ids, traced = _beam_decode(
                    logits,
                    eos_id=weights["eos_id"],
                    beam_size=beam_size,
                    alpha=alpha,
                    temperature=temperature,
                    max_len=weights["max_len"] + 1,
                )
                log_probs = _log_softmax(traced)
            else:
                raise ValueError(f"Unknown mode: {mode}")
            text = decode_tokens(
                pred_ids,
                weights["itos"],
                pad_id=weights["pad_id"],
                eos_id=weights["eos_id"],
                blank_id=weights["blank_id"],
            )
            confidence = mean_prob_confidence(log_probs, pred_ids.tolist())
            results.append({"text": text, "confidence": confidence})
    return results
