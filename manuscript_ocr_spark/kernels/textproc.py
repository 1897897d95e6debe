"""Text kernels: token decode, charset, boilerplate strip, text analysis.

`decode_tokens` / `load_charset` are verbatim ports of the reference
(src/manuscript/recognizers/_trba/data/transforms.py:39-59,196-206).

The boilerplate-strip / language-id / quality heuristics are the engine's
text-span path (BASELINE.json north_star: "text spans pass through
boilerplate-strip heuristics"). Each has three equivalent expressions that
MUST stay in lockstep:
  - this module (pure Python, used by the single-process oracle),
  - manuscript_ocr_spark.functions.text (Spark built-in expressions, JVM-side),
  - the DuckDB oracle SQL in __spark_entry__.py.
"""

from __future__ import annotations

import math
import re

# ---------------------------------------------------------------------------
# Charset / token decode (reference: transforms.py:39-59, 196-206)
# ---------------------------------------------------------------------------

PAD, SOS, EOS, BLANK = "<PAD>", "<SOS>", "<EOS>", "<BLANK>"


def load_charset_lines(lines):
    """Charset from an iterable of token lines → (itos, stoi).
    Reference: transforms.py:39-59."""
    itos = []
    for line in lines:
        tok = line.rstrip("\n")
        if tok == "":
            continue
        itos.append(tok)
    stoi = {s: i for i, s in enumerate(itos)}
    return itos, stoi


def decode_tokens(ids, itos, pad_id, eos_id, blank_id=None):
    """ids → text: stop at <EOS>, skip <PAD>/<BLANK>.
    Reference: transforms.py:196-206."""
    out = []
    for t in ids:
        t = int(t)
        if t == eos_id:
            break
        if t == pad_id or (blank_id is not None and t == blank_id):
            continue
        out.append(itos[t])
    return "".join(out)


def mean_prob_confidence(log_probs_row, pred_ids):
    """Confidence = mean of exp(log-softmax prob) of each chosen token over
    the full prediction row (including post-EOS positions — verbatim
    reference behavior). Reference: _trba/__init__.py:424-430."""
    if len(pred_ids) == 0:
        return 0.0
    total = 0.0
    for t, tok in enumerate(pred_ids):
        total += math.exp(float(log_probs_row[t, int(tok)]))
    return total / len(pred_ids)


# ---------------------------------------------------------------------------
# Boilerplate strip (text-span path of the extraction pipeline)
# ---------------------------------------------------------------------------

# Markers injected by the fixture generator (FIXTURES.md §1) emulating
# nav/header/footer/ad boilerplate in web-crawl text. `(?s)` so blocks can
# span newlines; non-greedy so adjacent blocks don't merge. One pattern PER
# TAG, applied sequentially — RE2 (DuckDB oracle) has no backreferences, so
# a single `(nav|...)\1` alternation could not be mirrored there; sequential
# per-tag replacement keeps Python re, Java regex (Spark regexp_replace) and
# RE2 rigorously identical.
BOILERPLATE_TAGS = ("nav", "header", "footer", "ad")
BOILERPLATE_TAG_RES = {
    tag: r"(?s)\{\{%s\}\}.*?\{\{/%s\}\}" % (tag, tag) for tag in BOILERPLATE_TAGS
}
WHITESPACE_RE = r"\s+"

_TAG_RES = [re.compile(BOILERPLATE_TAG_RES[t]) for t in BOILERPLATE_TAGS]
_WS = re.compile(WHITESPACE_RE)


def strip_boilerplate(text: str) -> str:
    """Remove {{nav}}..{{/nav}}-style blocks, collapse whitespace, trim."""
    if text is None:
        return None
    cleaned = text
    for rx in _TAG_RES:
        cleaned = rx.sub("", cleaned)
    cleaned = _WS.sub(" ", cleaned)
    return cleaned.strip()


# ---------------------------------------------------------------------------
# Text analysis (training-data-pipeline operators; Spark/SQL mirrors exist)
# ---------------------------------------------------------------------------

# Tiny per-language stopword sets for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible (word-boundary regex counts).
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une"],
    "es": ["el", "la", "que", "de", "los", "es", "una", "por"],
}


def count_word_hits(text: str, words) -> int:
    if not text:
        return 0
    t = " " + text.lower() + " "
    return sum(t.count(" " + w + " ") for w in words)


def lang_id(text: str) -> str:
    """Pick the language with the most stopword hits; ties and zero hits →
    'und'. Mirrored in functions.text.lang_id_col and the DuckDB oracle."""
    if not text:
        return "und"
    scores = {lang: count_word_hits(text, ws) for lang, ws in LANG_STOPWORDS.items()}
    best = max(scores.values())
    if best == 0:
        return "und"
    winners = [lang for lang, s in scores.items() if s == best]
    if len(winners) > 1:
        return "und"
    return winners[0]


def token_count(text: str) -> int:
    """Whitespace token count (0 for empty/blank)."""
    if not text or not text.strip():
        return 0
    return len(text.split())


def alpha_ratio(text: str) -> float:
    if not text:
        return 0.0
    n = len(text)
    alpha = sum(1 for c in text if c.isalpha())
    return alpha / n


def digit_ratio(text: str) -> float:
    if not text:
        return 0.0
    return sum(1 for c in text if c.isdigit()) / len(text)


def quality_score(text: str) -> float:
    """Heuristic quality score in [0,1]: mix of alpha ratio, mean word
    length band, and stopword presence. Deterministic; SQL mirror in
    __spark_entry__.py."""
    if not text or not text.strip():
        return 0.0
    toks = text.split()
    n_tok = len(toks)
    mean_len = sum(len(t) for t in toks) / n_tok
    a = alpha_ratio(text)
    len_ok = 1.0 if 2.0 <= mean_len <= 12.0 else 0.0
    stop_hits = count_word_hits(text, LANG_STOPWORDS["en"])
    stop_ok = 1.0 if stop_hits > 0 else 0.0
    return round(0.5 * a + 0.25 * len_ok + 0.25 * stop_ok, 6)


def pack_attention_targets(texts, stoi, max_len: int, drop_blank: bool = True):
    """Text labels → attention-decoder training targets (numpy):
    text_in (B, max_len+1) starting with <SOS>, target_y (B, max_len+1)
    ending each row with <EOS>, lengths (B,) = label length + 1. Unknown
    charset characters are skipped; <BLANK> ids are dropped when
    drop_blank. Reference: transforms.py:123-157 (verbatim semantics incl.
    truncation at max_len and PAD fill)."""
    import numpy as np

    pad = stoi["<PAD>"]
    sos = stoi["<SOS>"]
    eos = stoi["<EOS>"]
    blank = stoi.get("<BLANK>")

    b = len(texts)
    t = max_len + 1
    text_in = np.full((b, t), pad, dtype=np.int64)
    text_in[:, 0] = sos
    target_y = np.full((b, t), pad, dtype=np.int64)
    lengths = np.zeros(b, dtype=np.int64)
    for i, s in enumerate(texts):
        ids = []
        for ch in s:
            if ch not in stoi:
                continue
            idx = stoi[ch]
            if drop_blank and blank is not None and idx == blank:
                continue
            ids.append(idx)
        ln = min(len(ids), max_len)
        if ln > 0:
            text_in[i, 1:1 + ln] = ids[:ln]
            target_y[i, :ln] = ids[:ln]
        target_y[i, ln] = eos
        lengths[i] = ln + 1
    return text_in, target_y, lengths
