"""Text-analysis operators for large-scale training-data pipelines.

All kernels are vectorized (pandas string ops / numpy) and run inside
``map_batches``; stateful pieces (compiled regexes, stopword tables) live
in actor classes initialised once per actor.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# Minimal per-language stopword profiles for the n-gram/stopword heuristic
# language identifier (public-knowledge word lists).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "with", "as", "on", "be", "at", "by", "this", "have", "are"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "mit", "den",
           "nicht", "ein", "eine", "auf", "für", "im", "dem", "sich", "des"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "que",
           "pour", "dans", "qui", "pas", "sur", "au", "avec", "ce", "il"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "en", "un", "una",
           "es", "por", "con", "para", "no", "se", "del", "al", "como"},
}

_WORD_RE = re.compile(r"[\w']+", re.UNICODE)
_PUNCT_RE = re.compile(r"[.,!?;:]")
# BPE-ish subword splitter: words, numbers, punctuation runs — a cheap,
# deterministic proxy for tokenizer-count estimation
_BPE_RE = re.compile(r"\w+|[^\w\s]+")


class TextStats:
    """Actor-pool kernel: token counts + quality signals per document.

    Usage: ds.map_batches(TextStats, batch_format="pandas",
    concurrency=N, batch_size=B)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = _WORD_RE
        self.punct_re = _PUNCT_RE
        self.bpe_re = _BPE_RE
        self.stop_en = _LANG_PROFILES["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_col].fillna("")
        batch["n_chars"] = text.str.len().astype("int64")
        batch["n_tokens"] = text.str.split().str.len().fillna(0).astype("int64")
        batch["n_subword_tokens"] = text.str.count(self.bpe_re).astype("int64")
        batch["n_punct"] = text.str.count(self.punct_re).astype("int64")
        words = text.str.lower().str.findall(self.word_re)
        batch["stopword_ratio"] = words.map(
            lambda ws: sum(w in self.stop_en for w in ws) / len(ws) if ws else 0.0
        )
        batch["mean_word_len"] = words.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0
        )
        # composite quality score in [0, 1]: length sweet spot, moderate
        # punctuation, plausible word lengths
        n = batch["n_chars"].to_numpy(dtype=np.float64)
        punct_ratio = batch["n_punct"].to_numpy() / np.maximum(n, 1)
        mwl = batch["mean_word_len"].to_numpy(dtype=np.float64)
        len_score = np.clip(n / 500.0, 0, 1) * np.clip((20000 - n) / 20000.0, 0, 1)
        punct_score = 1.0 - np.clip(np.abs(punct_ratio - 0.02) * 10, 0, 1)
        word_score = 1.0 - np.clip(np.abs(mwl - 5.0) / 5.0, 0, 1)
        batch["quality_score"] = np.round(
            0.5 * len_score + 0.25 * punct_score + 0.25 * word_score, 6
        )
        return batch


class LangId:
    """Actor-pool kernel: stopword-profile language identification."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = _WORD_RE
        self.profiles = _LANG_PROFILES

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        words = batch[self.text_col].fillna("").str.lower().str.findall(self.word_re)

        def best_lang(ws):
            if not ws:
                return "und"
            scores = {
                lang: sum(w in vocab for w in ws) for lang, vocab in self.profiles.items()
            }
            lang, score = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            return lang if score > 0 else "und"

        batch["lang_pred"] = words.map(best_lang)
        return batch


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def rolling_fingerprint(texts) -> np.ndarray:
    """Polynomial rolling hash over normalized text -> int64 per doc.
    Deterministic, order-sensitive document fingerprint."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = 0
        for ch in " ".join(str(t or "").lower().split()):
            h = (h * _FP_BASE + ord(ch)) % _FP_MOD
        out[i] = h
    return out


def md5_fingerprint(texts) -> list[str]:
    """md5 hex of the raw text — the SQL-oracle-friendly content hash."""
    return [hashlib.md5(str(t or "").encode("utf-8")).hexdigest() for t in texts]


def fingerprint_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    batch["fingerprint"] = rolling_fingerprint(batch[text_col].tolist())
    batch["content_md5"] = md5_fingerprint(batch[text_col].tolist())
    return batch
