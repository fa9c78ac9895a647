"""Byte-pair-encoding vocabulary learning + tokenization.

The LLM-tokenizer training shape (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; same factorization as
fastBPE / SentencePiece):

  1. corpus-wide word-frequency reduce — the ONLY data-proportional
     stage.  Per-block `Counter` partials -> one bucketed global sum
     -> per-block partial top-V -> bounded driver merge (<= V rows per
     block reach the driver, never the corpus).
  2. merge-loop over the BOUNDED top-V word table.  Vocabulary size is
     sublinear in corpus size and V caps it outright, so the iterative
     pair-count/merge runs driver-local over a few-thousand-row table —
     at 100 TB the reduce in (1) is the distributed work; (2) stays the
     same size.
  3. tokenize-apply is a pure map (map_batches) with the learned merge
     ranks broadcast once via ray.put; per-worker word->pieces caching
     makes the hot path one dict hit per repeated word.

Determinism: merge ties break by (count DESC, pair ASC); no RNG, no
wall clock.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd

EOW = "</w>"

Pair = Tuple[str, str]


def word_to_symbols(word: str) -> Tuple[str, ...]:
    """chars of ``word`` with the end-of-word marker fused onto the last
    char ('low' -> ('l', 'o', 'w</w>'))."""
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _merge_seq(seq: Tuple[str, ...], a: str, b: str,
               ab: str) -> Tuple[str, ...]:
    out: List[str] = []
    i, n = 0, len(seq)
    while i < n:
        if i < n - 1 and seq[i] == a and seq[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def learn_merges(word_freqs: Sequence[Tuple[str, int]],
                 num_merges: int) -> List[Tuple[int, str, str, str, int]]:
    """Greedy BPE merge learning over a (word, freq) table.

    Returns [(rank, left, right, merged, pair_freq), ...].  Ties on
    pair frequency break lexicographically (smallest pair wins) so the
    vocabulary is independent of dict iteration order."""
    seqs: Dict[Tuple[str, ...], int] = {}
    for w, f in word_freqs:
        s = word_to_symbols(w)
        if s:
            seqs[s] = seqs.get(s, 0) + int(f)

    merges: List[Tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        counts: Dict[Pair, int] = {}
        for seq, f in seqs.items():
            for pair in zip(seq, seq[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        (a, b), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        ab = a + b
        merges.append((rank, a, b, ab, freq))
        seqs = _apply_merge_all(seqs, a, b, ab)
    return merges


def _apply_merge_all(seqs: Dict[Tuple[str, ...], int], a: str, b: str,
                     ab: str) -> Dict[Tuple[str, ...], int]:
    out: Dict[Tuple[str, ...], int] = {}
    for seq, f in seqs.items():
        new = _merge_seq(seq, a, b, ab) if a in seq else seq
        out[new] = out.get(new, 0) + f
    return out


def encode_word(word: str, ranks: Dict[Pair, int]) -> Tuple[str, ...]:
    """Apply learned merges to one word, always the lowest-rank mergeable
    pair first, merging every adjacent occurrence per pass (GPT-2-style
    apply; reproduces the training segmentation for in-vocab words)."""
    syms = list(word_to_symbols(word))
    while len(syms) >= 2:
        best_rank = None
        best_pair: Pair | None = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        syms = list(_merge_seq(tuple(syms), a, b, a + b))
    return tuple(syms)


class WordEncoder:
    """Merge-rank tokenizer with a per-instance word->pieces cache (one
    instance per worker process when captured in a map_batches closure;
    the cache amortizes across the batches that worker sees)."""

    def __init__(self, ranks: Dict[Pair, int]):
        self.ranks = ranks
        self.cache: Dict[str, Tuple[str, ...]] = {}

    def encode(self, word: str) -> Tuple[str, ...]:
        got = self.cache.get(word)
        if got is None:
            got = encode_word(word, self.ranks)
            self.cache[word] = got
        return got

    def doc_stats(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """(n_tokens, n_distinct_token_types) per text."""
        n_tok = np.zeros(len(texts), dtype=np.int64)
        n_typ = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            total = 0
            types = set()
            for w in t.split():
                pieces = self.encode(w)
                total += len(pieces)
                types.update(pieces)
            n_tok[i] = total
            n_typ[i] = len(types)
        return n_tok, n_typ


def block_word_counts(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-block word-frequency partial (the combiner before the global
    sum shuffle)."""
    c: Counter = Counter()
    for t in batch["text"]:
        c.update(t.split())
    return pd.DataFrame({
        "word": list(c.keys()),
        "n": np.fromiter(c.values(), dtype=np.int64, count=len(c))})
