"""Distributed edit-distance similarity join (PassJoin partition scheme).

Shape (see q_edit_distance for the catalog entry / oracle):

1. exact-duplicate prefixes collapse to one REPRESENTATIVE per pile
   first (bucketed groupby on the prefix) — duplicate-heavy corpora
   would otherwise square every segment-key collision; pile-internal
   pairs are all distance 0 and expand vectorized, proportional to
   output size (same pile-safe trick as ops/dedup.py's phash pairs).
2. every representative prefix splits into k+1 SEGMENTS; by pigeonhole
   an optimal alignment leaves >= 1 segment edit-free, so any string
   within distance k contains that segment VERBATIM, shifted at most k.
3. one map emits, per rep, both roles into the SAME bucketed shuffle:
   its k+1 (la, seg_i, segment) index keys and its probe substrings
   (la, seg_i, s[p:p+len_i]) for every indexable length la within +-k
   of its own and every position p within +-k of segment i's start
   under la's layout.  Keys are int64 hashes (collisions only ADD
   candidates, which the exact verify removes).
4. per key, candidates = index-role x probe-role ids; the banded 2k+1
   Levenshtein DP (ops/text.py::banded_edit_distance), vectorized
   ACROSS pairs, verifies inline — the full prefix rides on the key
   rows (same order of magnitude as the ids), so no join-back pass.
5. rep pairs expand over pile members via two bucketed hash joins.

Worst-case candidate count is inherent to PassJoin (an adversarial
corpus where many DISTINCT strings share a segment still fans out);
the guarantee is candidates ⊇ true pairs and verify is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ..relational import (bucketed_hash_join, distinct_rows,
                          grouped_map_buckets)
from .graph import grouped_all_pairs
from .text import banded_edit_distance

_PAIR_EMPTY = {"id_a": pd.Series(dtype="int64"),
               "id_b": pd.Series(dtype="int64"),
               "dist": pd.Series(dtype="int64")}


def _seg_layout(la: int, k: int):
    """k+1 segment (start, length) pairs for a string of length la:
    the first la % (k+1) segments get the extra char."""
    base, extra = divmod(la, k + 1)
    starts, lens_, s = [], [], 0
    for i in range(k + 1):
        ln = base + (1 if i < extra else 0)
        starts.append(s)
        lens_.append(ln)
        s += ln
    return starts, lens_


def _key_hash(sub: pd.Series, la: int, seg: int) -> np.ndarray:
    """(la, seg, substring) -> one int64 key."""
    from ..relational import _splitmix64

    h = pd.util.hash_array(sub.to_numpy(dtype=object), hash_key="0" * 16)
    return _splitmix64(h ^ np.uint64(la * 131 + seg)).astype(np.int64)


def collapse_piles(pref: rd.Dataset, num_buckets=None):
    """(doc_id, prefix, plen) -> (reps, members): one representative row
    per distinct prefix (min doc_id), plus the full (rep_id, doc_id)
    pile map.  ONE bucketed shuffle on the prefix."""

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if not len(bucket):
            return pd.DataFrame({"rep_id": pd.Series(dtype="int64"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "prefix": pd.Series(dtype="object"),
                                 "plen": pd.Series(dtype="int64"),
                                 "is_rep": pd.Series(dtype="bool")})
        b = bucket.sort_values(["prefix", "doc_id"], kind="mergesort")
        p = b["prefix"].to_numpy(dtype=object)
        new = np.r_[True, p[1:] != p[:-1]]
        rep = b["doc_id"].to_numpy(dtype=np.int64)[np.flatnonzero(new)][
            np.cumsum(new) - 1]
        return pd.DataFrame({"rep_id": rep,
                             "doc_id": b["doc_id"].to_numpy(np.int64),
                             "prefix": p,
                             "plen": b["plen"].to_numpy(np.int64),
                             "is_rep": new})

    both = grouped_map_buckets(pref, ["prefix"], per_bucket,
                               num_buckets=num_buckets, whole_bucket=True)
    return both


def passjoin_rep_pairs(reps: rd.Dataset, k: int, min_len: int,
                       num_buckets: int = 32) -> rd.Dataset:
    """PassJoin over representative rows (rep_id, prefix, plen):
    returns (id_a, id_b, dist) with dist <= k, ids = rep ids."""

    def emit_keys(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["plen"] >= min_len]
        if not len(b):
            return pd.DataFrame({"key": pd.Series(dtype="int64"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "role": pd.Series(dtype="int64"),
                                 "prefix": pd.Series(dtype="object")})
        ids = b["rep_id"].to_numpy(dtype=np.int64)
        pl = b["plen"].to_numpy(dtype=np.int64)
        txt = b["prefix"]
        keys, docs_, roles, prefs = [], [], [], []

        def _push(key_arr, id_arr, role, pref_arr):
            keys.append(key_arr)
            docs_.append(id_arr)
            roles.append(np.full(len(id_arr), role, dtype=np.int64))
            prefs.append(pref_arr)

        for plen_val in np.unique(pl):
            m = pl == plen_val
            sub_ids, sub_txt = ids[m], txt[m]
            own = sub_txt.to_numpy(dtype=object)
            starts, lens_ = _seg_layout(int(plen_val), k)
            for si, (st, ln) in enumerate(zip(starts, lens_)):
                _push(_key_hash(sub_txt.str.slice(st, st + ln),
                                int(plen_val), si), sub_ids, 0, own)
            for la in range(int(plen_val) - k, int(plen_val) + k + 1):
                if la < min_len:
                    continue
                pstarts, plens = _seg_layout(la, k)
                for si, (st, ln) in enumerate(zip(pstarts, plens)):
                    lo = max(0, st - k)
                    hi = min(int(plen_val) - ln, st + k)
                    for p in range(lo, hi + 1):
                        _push(_key_hash(sub_txt.str.slice(p, p + ln),
                                        la, si), sub_ids, 1, own)
        return pd.DataFrame({"key": np.concatenate(keys),
                             "doc_id": np.concatenate(docs_),
                             "role": np.concatenate(roles),
                             "prefix": np.concatenate(prefs)})

    keys_ds = reps.map_batches(emit_keys, batch_format="pandas")

    def per_key_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        if not len(bucket):
            return pd.DataFrame(_PAIR_EMPTY)
        s = bucket.drop_duplicates(["key", "role", "doc_id"]) \
            .sort_values(["key", "role", "doc_id"], kind="mergesort")
        ky = s["key"].to_numpy(dtype=np.int64)
        rl = s["role"].to_numpy()
        ids = s["doc_id"].to_numpy(dtype=np.int64)
        txt = s["prefix"].to_numpy(dtype=object)
        bounds = np.r_[np.flatnonzero(np.r_[True, ky[1:] != ky[:-1]]),
                       len(s)]
        ii, jj = [], []
        for gs, ge in zip(bounds[:-1], bounds[1:]):
            n0 = int(np.searchsorted(rl[gs:ge], 1))  # 0s sort before 1s
            if n0 == 0 or n0 == ge - gs:
                continue
            a = np.repeat(np.arange(gs, gs + n0), ge - gs - n0)
            b = np.tile(np.arange(gs + n0, ge), n0)
            ne = ids[a] != ids[b]
            ii.append(a[ne])
            jj.append(b[ne])
        if not ii:
            return pd.DataFrame(_PAIR_EMPTY)
        i = np.concatenate(ii)
        j = np.concatenate(jj)
        cand = pd.DataFrame({"id_a": np.minimum(ids[i], ids[j]),
                             "id_b": np.maximum(ids[i], ids[j]),
                             "__i": i, "__j": j}) \
            .drop_duplicates(["id_a", "id_b"])
        d = banded_edit_distance(list(txt[cand["__i"].to_numpy()]),
                                 list(txt[cand["__j"].to_numpy()]), k)
        keep = d <= k
        return pd.DataFrame({"id_a": cand["id_a"].to_numpy()[keep],
                             "id_b": cand["id_b"].to_numpy()[keep],
                             "dist": d[keep]})

    verified = grouped_map_buckets(keys_ds, ["key"], per_key_pairs,
                                   num_buckets=num_buckets,
                                   whole_bucket=True)
    # a pair can match on several segment keys (different buckets):
    # one global DISTINCT collapses the identical (id_a, id_b, dist) rows
    return distinct_rows(verified, ["id_a", "id_b", "dist"])


def expand_pile_pairs(rep_pairs: rd.Dataset, piles: rd.Dataset,
                      num_buckets=None) -> rd.Dataset:
    """rep-level (id_a, id_b, dist) -> member-level pairs: cross-pile
    pairs via two bucketed hash joins on the pile map, plus the
    all-pairs (dist 0) inside every pile of size > 1."""
    pile_a = piles.map_batches(
        lambda b: pd.DataFrame({"id_a": b["rep_id"].astype("int64"),
                                "m_a": b["doc_id"].astype("int64")}),
        batch_format="pandas")
    pile_b = piles.map_batches(
        lambda b: pd.DataFrame({"id_b": b["rep_id"].astype("int64"),
                                "m_b": b["doc_id"].astype("int64")}),
        batch_format="pandas")
    j1 = bucketed_hash_join(rep_pairs, pile_a, on="id_a",
                            right_cols=["id_a", "m_a"],
                            num_buckets=num_buckets,
                            restore_dtypes={"id_b": "int64",
                                            "dist": "int64"})
    j2 = bucketed_hash_join(j1, pile_b, on="id_b",
                            right_cols=["id_b", "m_b"],
                            num_buckets=num_buckets,
                            restore_dtypes={"m_a": "int64",
                                            "dist": "int64"})
    cross = j2.map_batches(
        lambda b: pd.DataFrame({
            "id_a": np.minimum(b["m_a"].to_numpy(np.int64),
                               b["m_b"].to_numpy(np.int64)),
            "id_b": np.maximum(b["m_a"].to_numpy(np.int64),
                               b["m_b"].to_numpy(np.int64)),
            "dist": b["dist"].to_numpy(np.int64)}),
        batch_format="pandas", batch_size=None)

    def internal(bucket: pd.DataFrame) -> pd.DataFrame:
        if not len(bucket):
            return pd.DataFrame(_PAIR_EMPTY)
        s = bucket.sort_values(["rep_id", "doc_id"], kind="mergesort")
        rp = s["rep_id"].to_numpy(dtype=np.int64)
        ids = s["doc_id"].to_numpy(dtype=np.int64)
        sizes = np.diff(np.flatnonzero(np.r_[True, rp[1:] != rp[:-1], True]))
        i, j = grouped_all_pairs(sizes)
        if not len(i):
            return pd.DataFrame(_PAIR_EMPTY)
        return pd.DataFrame({"id_a": ids[i], "id_b": ids[j],
                             "dist": np.zeros(len(i), dtype=np.int64)})

    within = grouped_map_buckets(piles, ["rep_id"], internal,
                                 num_buckets=num_buckets,
                                 whole_bucket=True)
    return cross.union(within)
