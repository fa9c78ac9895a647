"""LLM-training-corpus curation kernels: passage-level dedup,
repetition scoring, benchmark decontamination, deterministic hash
splits.

These are the web-scale curation steps (CCNet / Gopher-style) expressed
as batch kernels over the ``documents`` table.  Every kernel is
vectorized pandas/numpy over the exploded word arrays — no Python loop
over rows or words — and every operator built on them is replicated by a
DuckDB oracle (the passage construction, bigram counts and md5 bucketing
use only SQL-expressible arithmetic).

Passage framing: the synthetic corpus is single-line word soup (no
``\\n\\n`` paragraph structure), so the deterministic analogue of
CCNet's paragraph-hash dedup is fixed-size WORD-CHUNK passages: doc
text -> words -> consecutive chunks of ``passage_words`` words.  At 100
TB the same shapes hold with real paragraph splits — only the splitter
changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# encode (doc_id, pidx) as one orderable int64: keep-first = min over this
ORD_BITS = 16  # pidx < 65536 (n_chars <= 20k -> ~4k words -> ~512 passages)


def explode_words(batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, pd.Series]:
    """(doc_index_per_word, word_counts_per_doc, split word lists)."""
    words = batch["text"].str.split(" ")
    counts = words.str.len().to_numpy(dtype=np.int64)
    idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    return idx, counts, words


def passage_rows(batch: pd.DataFrame, passage_words: int = 8) -> pd.DataFrame:
    """Explode docs into (doc_id, pidx, passage, n_total) rows —
    consecutive ``passage_words``-word chunks, last chunk ragged.
    Matches the SQL construction
    ``array_to_string(ws[i*k+1 : i*k+k], ' ')`` exactly."""
    idx, counts, words = explode_words(batch)
    flat = np.concatenate([np.asarray(w, dtype=object) for w in words]) \
        if len(batch) else np.array([], dtype=object)
    n_pass = -(-counts // passage_words)  # ceil
    # per word: its passage index within the doc
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    word_pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, counts)
    pidx = word_pos // passage_words
    # join words of each (doc, pidx) group: groups are contiguous runs
    doc_ids = batch["doc_id"].to_numpy(dtype=np.int64)
    key = np.repeat(doc_ids, counts) * (1 << ORD_BITS) + pidx
    s = pd.Series(flat)
    joined = s.groupby(key, sort=True).agg(" ".join)
    out_key = joined.index.to_numpy(dtype=np.int64)
    out_doc = out_key >> ORD_BITS
    out_pidx = out_key & ((1 << ORD_BITS) - 1)
    totals = pd.Series(n_pass, index=doc_ids)
    return pd.DataFrame({
        "doc_id": out_doc,
        "pidx": out_pidx,
        "passage": joined.to_numpy(),
        "n_total": totals.loc[out_doc].to_numpy(dtype=np.int64),
    })


def repetition_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style per-doc repetition signals, shuffle-free: word count,
    distinct-word fraction, top-bigram fraction.  Vectorized over the
    exploded word array (pandas C groupbys, no per-row Python)."""
    idx, counts, words = explode_words(batch)
    flat = np.concatenate([np.asarray(w, dtype=object) for w in words]) \
        if len(batch) else np.array([], dtype=object)
    df = pd.DataFrame({"doc": idx, "w": flat})
    distinct = df.groupby("doc", sort=True)["w"].nunique() \
        .reindex(range(len(batch)), fill_value=0).to_numpy(dtype=np.int64)
    # bigrams: adjacent words within a doc (mask the doc boundaries)
    if len(flat) > 1:
        same_doc = idx[1:] == idx[:-1]
        bg_doc = idx[:-1][same_doc]
        bg = pd.Series(flat[:-1][same_doc]).str.cat(
            pd.Series(flat[1:][same_doc]), sep=" ")
        bc = pd.DataFrame({"doc": bg_doc, "bg": bg}) \
            .groupby(["doc", "bg"], sort=False).size()
        max_bg = bc.groupby(level=0).max() \
            .reindex(range(len(batch)), fill_value=0).to_numpy(dtype=np.int64)
    else:
        max_bg = np.zeros(len(batch), dtype=np.int64)
    n_bigrams = np.maximum(counts - 1, 1)
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
        "n_words": counts,
        "distinct_frac": np.round(distinct / np.maximum(counts, 1), 6),
        "top_bigram_frac": np.round(max_bg / n_bigrams, 6),
    })


def ngram_strings(batch: pd.DataFrame, n: int = 5) -> tuple[np.ndarray, pd.Series]:
    """All contiguous word n-grams per doc: (doc_index_per_gram, grams).
    Matches SQL ``array_to_string(ws[i : i+n-1], ' ')`` over every
    position."""
    idx, counts, words = explode_words(batch)
    flat = np.concatenate([np.asarray(w, dtype=object) for w in words]) \
        if len(batch) else np.array([], dtype=object)
    if len(flat) < n:
        return np.array([], dtype=np.int64), pd.Series([], dtype=object)
    parts = [pd.Series(flat[k:len(flat) - (n - 1) + k]) for k in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = grams.str.cat(p, sep=" ")
    # valid gram start positions: all n words in the same doc
    gram_doc = idx[: len(flat) - (n - 1)]
    valid = idx[n - 1:] == gram_doc
    return gram_doc[valid], grams[valid].reset_index(drop=True)


def quantile_disc_index(n: int, q: float) -> int:
    """DuckDB ``quantile_disc`` element selection: 0-based index
    floor((n-1) * q) computed in float64 — replicated bit-for-bit so the
    oracle matches even on fp boundary cases."""
    return int(np.floor((n - 1) * np.float64(q)))
