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
_WORD_CHAR_RE = re.compile(r"[\w']", re.UNICODE)
_PUNCT_RE = re.compile(r"[.,!?;:]")


def _token_set_re(vocab) -> re.Pattern:
    """Regex whose match count on a lowercased text equals the number of
    maximal-``[\\w']``-run tokens that are members of ``vocab`` — the
    vectorized (``Series.str.count``) equivalent of
    ``sum(w in vocab for w in _WORD_RE.findall(text))``.  Plain ``\\b``
    would differ (it treats ``'`` as a boundary); the lookarounds pin the
    match to a whole ``[\\w']`` run."""
    alts = "|".join(re.escape(w) for w in sorted(vocab, key=len, reverse=True))
    return re.compile(r"(?<![\w'])(?:" + alts + r")(?![\w'])", re.UNICODE)
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
        self.word_char_re = _WORD_CHAR_RE
        self.punct_re = _PUNCT_RE
        self.bpe_re = _BPE_RE
        self.stop_en_re = _token_set_re(_LANG_PROFILES["en"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_col].fillna("")
        batch["n_chars"] = text.str.len().astype("int64")
        batch["n_tokens"] = text.str.split().str.len().fillna(0).astype("int64")
        batch["n_subword_tokens"] = text.str.count(self.bpe_re).astype("int64")
        batch["n_punct"] = text.str.count(self.punct_re).astype("int64")
        # stopword_ratio / mean_word_len without a per-row Python loop:
        # word count, in-word char count and stopword-token count are all
        # single vectorized count-regex passes; the ratios are then exact
        # integer-sum / count divisions (bit-identical to the former
        # findall + np.mean form — word lengths are exact in float64)
        lower = text.str.lower()
        n_words = lower.str.count(self.word_re).to_numpy(dtype=np.int64)
        word_chars = lower.str.count(self.word_char_re).to_numpy(dtype=np.int64)
        n_stop = lower.str.count(self.stop_en_re).to_numpy(dtype=np.int64)
        denom = np.maximum(n_words, 1)
        batch["stopword_ratio"] = np.where(n_words > 0, n_stop / denom, 0.0)
        batch["mean_word_len"] = np.where(n_words > 0, word_chars / denom, 0.0)
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
        # descending lang order + argmax-first => ties resolve to the
        # lexicographically greatest language, matching
        # max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        self.langs = sorted(_LANG_PROFILES, reverse=True)
        self.lang_res = [_token_set_re(_LANG_PROFILES[l]) for l in self.langs]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        lower = batch[self.text_col].fillna("").str.lower()
        scores = np.stack([lower.str.count(r).to_numpy(dtype=np.int64)
                           for r in self.lang_res])  # (L, n)
        best = np.argmax(scores, axis=0)
        pred = np.asarray(self.langs, dtype=object)[best]
        pred[scores.max(axis=0) == 0] = "und"
        batch["lang_pred"] = pred
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


def banded_edit_distance(a_texts, b_texts, k: int) -> np.ndarray:
    """Levenshtein distance for many (a, b) pairs at once, banded at
    width 2k+1 (Ukkonen): cells farther than ``k`` off the diagonal can
    never contribute to a distance <= k, so the DP sweeps len(a) rows x
    (2k+1) band cells, vectorized with numpy ACROSS the pair axis.

    Returns int64 distances; pairs whose true distance exceeds ``k``
    report k+1 (the verify threshold semantics of a similarity join).
    Pure numpy, no per-pair Python loop — the loop is over string
    positions (bounded by max prefix length), not over pairs.
    """
    n = len(a_texts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    enc_a = [str(t or "").encode("utf-8", "surrogatepass") for t in a_texts]
    enc_b = [str(t or "").encode("utf-8", "surrogatepass") for t in b_texts]
    la = np.fromiter((len(t) for t in enc_a), dtype=np.int64, count=n)
    lb = np.fromiter((len(t) for t in enc_b), dtype=np.int64, count=n)
    ml_a, ml_b = int(la.max()), int(lb.max())
    big = np.int64(k + 1)
    out = np.where(np.abs(la - lb) > k, big, -1).astype(np.int64)
    if ml_a == 0 or ml_b == 0:
        pend = out < 0
        out[pend] = np.minimum(np.maximum(la, lb)[pend], big)
        return out
    A = np.zeros((n, ml_a), dtype=np.uint8)
    B = np.zeros((n, ml_b), dtype=np.uint8)
    for i, t in enumerate(enc_a):
        A[i, :len(t)] = np.frombuffer(t, dtype=np.uint8)
    for i, t in enumerate(enc_b):
        B[i, :len(t)] = np.frombuffer(t, dtype=np.uint8)
    W = 2 * k + 1
    INF = np.int64(k + 2)
    # band[:, c] holds D[i, j] with j = i + (c - k); row 0 = D[0, j] = j
    band = np.arange(-k, k + 1, dtype=np.int64)[None, :].repeat(n, axis=0)
    band = np.where((band < 0) | (band > lb[:, None]), INF, band)
    for i in range(1, ml_a + 1):
        j = i + np.arange(-k, k + 1, dtype=np.int64)[None, :]  # (1, W) + i
        valid = (j >= 0) & (j <= lb[:, None]) & (i <= la[:, None])
        # shift: new[c] aligns with old[c] (diag), old[c+1] (up=del from a),
        # new[c-1] (left=insert).  up/diag come from the previous row.
        up = np.concatenate([band[:, 1:], np.full((n, 1), INF)], axis=1)
        diag = band
        jj = np.clip(j - 1, 0, ml_b - 1)
        ach = A[:, i - 1][:, None]
        bch = np.take_along_axis(B, jj, axis=1)
        sub = diag + np.where((j >= 1) & (ach == bch), 0, 1)
        new = np.minimum(sub, up + 1)
        # left neighbours resolve within the row: W is tiny, loop over it
        for c in range(W):
            left = new[:, c - 1] + 1 if c else INF
            new[:, c] = np.minimum(new[:, c], left)
        # pairs whose a is shorter than the batch max finished at i == la:
        # freeze their band so the final read sees row la, not row ml_a
        band = np.where((i <= la)[:, None],
                        np.where(valid, np.minimum(new, INF), INF), band)
    c_idx = np.clip(lb - la + k, 0, W - 1)  # cell for D[la, lb]: j = i + (c-k)
    d = np.take_along_axis(band, c_idx[:, None], axis=1)[:, 0]
    pend = out < 0
    out[pend] = np.minimum(d, big)[pend]
    return out


UNK_TOKEN = "\x00<unk>"  # NUL-prefixed: cannot collide with split() tokens
                         # of any sane corpus; documented cap sentinel


def cap_token_table(counts, keys, cap, token_col="token", weight_col="n",
                    unk: str = UNK_TOKEN, num_buckets: int = 16):
    """Bound a distributed (keys…, token, weight) count table to the
    top-``cap`` tokens by GLOBAL weight, collapsing the tail into one
    ``unk`` bucket per key combination — the piece that makes
    token-model folds (naive bayes, surprisal, source drift) web-scale
    safe: the driver only ever sees ≤ (cap+1) × #key-combos rows instead
    of the full crawl vocabulary.

    Plan (all bounded):
    1. token totals via one combiner-first bucketed reduce;
    2. kept set = q_heavy_hitters' bounded-head core — per-block top-cap
       heads (ties: weight desc, token asc), tiny driver merge of
       ≤ cap × n_blocks rows;
    3. if nothing was dropped, return ``counts`` folded as-is (the cap
       is then a no-op: callers' uncapped semantics are unchanged);
    4. else rewrite dropped tokens to ``unk`` inside map_batches
       (broadcast kept-set via ray.put) and re-reduce to collapse the
       UNK rows before the driver fold.

    Returns (pandas table, n_dropped_distinct_tokens)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..relational import partial_then_global_sum

    totals = partial_then_global_sum(
        counts, keys=[token_col], sums={weight_col: weight_col},
        num_buckets=num_buckets).materialize()
    n_distinct = totals.count()
    if cap is None or n_distinct <= cap:
        return counts.to_pandas(), 0

    def block_head(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(weight_col, "descending"),
                                            (token_col, "ascending")])
        return t.take(idx[:cap])

    heads = totals.map_batches(block_head, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    kept = set(
        heads.sort_values([weight_col, token_col],
                          ascending=[False, True], kind="mergesort")
        .head(cap)[token_col])
    kept_ref = ray.put(kept)

    def to_unk(b: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(kept_ref)
        b = b.copy()
        tok = b[token_col]
        b[token_col] = tok.where(tok.isin(ks), unk)
        return b

    capped = partial_then_global_sum(
        counts.map_batches(to_unk, batch_format="pandas"),
        keys=list(keys) + [token_col], sums={weight_col: weight_col},
        num_buckets=num_buckets).to_pandas()
    return capped, int(n_distinct - cap)
