"""Driver-facing query catalog: every operator family exposed as a
callable ``(sf_dir) -> Dataset | DataFrame | Table`` plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle string with IDENTICAL
column names (the driver hash-compares values after sorting columns by
name).

Grouped per SURVEY.md §2 plus the training-data additions (dedup /
similarity / text analysis).  Non-SQL-expressible pipelines (CQI golden
scoring, spatial assignment, tiles, MinHash/SimHash) ship without an
oracle entry — the driver then records the weaker rows-only check and the
pytest golden suite carries exactness.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.compute as pc

import ray
import ray.data as rd

from .ops.ann import batch_topk_partials, merge_topk
from .ops.dedup import MinHasher, band_rows, char_shingles, jaccard, simhash64
from .ops.text import LangId, TextStats, fingerprint_batch
from .relational import (broadcast_map_join, bucketed_hash_join, exact_dedup,
                         grouped_map_buckets, partial_then_global_sum)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pq(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


# ---------------------------------------------------------------------------
# relational core (filters / projections / aggregates / joins / topk)
# ---------------------------------------------------------------------------

def q_filter_project(sf_dir: str):
    ds = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(pc.greater(t["l_quantity"], 30),
                                   pc.equal(t["l_returnflag"], "R"))),
        batch_format="pyarrow")
    return ds.select_columns(["l_orderkey", "l_quantity", "l_extendedprice"])


Q_FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'
"""


def q_groupby_agg(sf_dir: str):
    ds = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    out = partial_then_global_sum(
        ds, keys=["l_returnflag", "l_linestatus"],
        sums={"l_quantity": "sum_qty", "l_extendedprice": "sum_price"},
        counts="cnt")

    def _round(batch: pd.DataFrame) -> pd.DataFrame:
        batch["sum_qty"] = batch["sum_qty"].round(2)
        batch["sum_price"] = batch["sum_price"].round(2)
        batch["cnt"] = batch["cnt"].astype("int64")
        return batch

    return out.map_batches(_round, batch_format="pandas")


Q_GROUPBY_AGG_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(*) AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_join_broadcast(sf_dir: str):
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    customer = _pq(sf_dir, "customer",
                   columns=["c_custkey", "c_mktsegment"]).to_pandas()
    customer = customer.rename(columns={"c_custkey": "o_custkey"})
    joined = broadcast_map_join(orders, customer, on="o_custkey", how="inner")
    agg = partial_then_global_sum(joined, keys=["c_mktsegment"],
                                  sums={"o_totalprice": "total"}, counts="n_orders")

    def _round(batch: pd.DataFrame) -> pd.DataFrame:
        batch["total"] = batch["total"].round(2)
        batch["n_orders"] = batch["n_orders"].astype("int64")
        return batch

    return agg.map_batches(_round, batch_format="pandas")


Q_JOIN_BROADCAST_SQL = """
SELECT c_mktsegment, round(sum(o_totalprice), 2) AS total, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_join_bucketed(sf_dir: str):
    lineitem = _pq(sf_dir, "lineitem", columns=["l_orderkey"])
    lineitem = lineitem.map_batches(
        lambda t: t.rename_columns(["o_orderkey"]), batch_format="pyarrow")
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = bucketed_hash_join(lineitem, orders, on="o_orderkey",
                                right_cols=["o_orderkey", "o_orderpriority"],
                                num_buckets=16, how="inner")

    # partial count per block before the tiny global groupby — a global
    # groupby over the joined pandas blocks would re-sort all rows
    def partial_count(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_orderpriority", as_index=False, sort=False) \
                .size().rename(columns={"size": "n_items"})

    from ray.data.aggregate import Sum

    counted = joined.map_batches(partial_count, batch_format="pandas") \
        .groupby("o_orderpriority").aggregate(Sum("n_items", alias_name="n_items"))
    return counted.map_batches(lambda b: b.astype({"n_items": "int64"}),
                               batch_format="pandas")


Q_JOIN_BUCKETED_SQL = """
SELECT o_orderpriority, count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_topk(sf_dir: str):
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return orders.sort(["o_totalprice", "o_orderkey"],
                       descending=[True, False]).limit(10)


Q_TOPK_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_distinct(sf_dir: str):
    events = _pq(sf_dir, "events", columns=["event_type"])
    return events.groupby("event_type").count().select_columns(["event_type"])


Q_DISTINCT_SQL = "SELECT DISTINCT event_type FROM events"


def q_events_agg(sf_dir: str):
    events = _pq(sf_dir, "events", columns=["user_id", "event_type", "value"])
    agg = partial_then_global_sum(events, keys=["user_id", "event_type"],
                                  sums={"value": "total_value"}, counts="n")

    def _round(batch: pd.DataFrame) -> pd.DataFrame:
        batch["total_value"] = batch["total_value"].round(2)
        batch["n"] = batch["n"].astype("int64")
        return batch

    return agg.map_batches(_round, batch_format="pandas")


Q_EVENTS_AGG_SQL = """
SELECT user_id, event_type, round(sum(value), 2) AS total_value, count(*) AS n
FROM events GROUP BY user_id, event_type
"""


def q_window_tumbling(sf_dir: str, window_sec: int = 3600):
    """Tumbling event-time window aggregate: events are a partitioned log
    (key = user_id); window id = floor(epoch/size).  Partial-aggregated
    inside map_batches before the small groupby (no raw-event shuffle)."""
    events = _pq(sf_dir, "events", columns=["user_id", "ts", "value"])

    def add_window(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch["ts"].astype("int64") // 1_000_000  # us -> sec
        batch = batch[["user_id", "value"]].copy()
        batch["window_id"] = (epoch // window_sec).astype("int64")
        return batch

    agg = partial_then_global_sum(
        events.map_batches(add_window, batch_format="pandas"),
        keys=["user_id", "window_id"], sums={"value": "total_value"},
        counts="n")

    def _round(batch: pd.DataFrame) -> pd.DataFrame:
        batch["total_value"] = batch["total_value"].round(2)
        batch["n"] = batch["n"].astype("int64")
        return batch

    return agg.map_batches(_round, batch_format="pandas")


Q_WINDOW_TUMBLING_SQL = """
SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS window_id,
       round(sum(value), 2) AS total_value, count(*) AS n
FROM events GROUP BY user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT)
"""


def q_sessionize(sf_dir: str, gap_sec: int = 1800):
    """Gap-based sessionization: per user, sort by ts and split where the
    inter-event gap exceeds ``gap_sec``.  groupby(user) is the partitioning
    assumption (per-key event-time order inside the group); output is one
    row per session."""
    events = _pq(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def sessions(bucket: pd.DataFrame) -> pd.DataFrame:
        if not len(bucket):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 ("user_id", "session_seq", "n_events",
                                  "duration_sec")})
        out = {"user_id": [], "session_seq": [], "n_events": [],
               "duration_sec": []}
        uid = bucket["user_id"].to_numpy()
        epoch = bucket["ts"].astype("int64").to_numpy() // 1_000_000
        order = np.lexsort((bucket["event_id"].to_numpy(), epoch, uid))
        uid, epoch = uid[order], epoch[order]
        bounds = np.concatenate(
            [[0], np.nonzero(uid[1:] != uid[:-1])[0] + 1, [len(uid)]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            t = epoch[s:e]
            breaks = np.concatenate([[0], np.nonzero(np.diff(t) > gap_sec)[0] + 1,
                                     [len(t)]])
            for seq, (ss, se) in enumerate(zip(breaks[:-1], breaks[1:])):
                out["user_id"].append(int(uid[s]))
                out["session_seq"].append(seq)
                out["n_events"].append(int(se - ss))
                out["duration_sec"].append(int(t[se - 1] - t[ss]))
        return pd.DataFrame(out)

    return grouped_map_buckets(events, ["user_id"], sessions,
                               num_buckets=32, whole_bucket=True)


Q_SESSIONIZE_SQL = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id FROM events),
ordered AS (
  SELECT user_id, t, event_id,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id) > 1800
              THEN 1 ELSE 0 END AS is_break
  FROM ev),
tagged AS (
  SELECT user_id, t,
         sum(is_break) OVER (PARTITION BY user_id ORDER BY t, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM ordered)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       CAST(max(t) - min(t) AS BIGINT) AS duration_sec
FROM tagged GROUP BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup(docs, key="text", order_col="doc_id")


Q_DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
"""


def q_dedup_minhash(sf_dir: str, bands: int = 16, num_perm: int = 64,
                    threshold: float = 0.6):
    """MinHash+LSH near-dup candidate pairs, Jaccard-verified.
    shingle->sign->band (map_batches, actor pool) -> groupby(band) ->
    candidate pairs -> verify (second pass against broadcast texts)."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    text_by_id = ray.put(dict(zip(*[docs.to_pandas()[c] for c in ("doc_id", "text")])))

    class Signer:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sigs = self.mh.signatures_batch(batch["text"].tolist())
            return band_rows(sigs, batch["doc_id"].to_numpy(), bands=bands)

    banded = docs.map_batches(Signer, batch_format="pandas", concurrency=(1, 8))

    def verify_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        """Whole-bucket verify: one broadcast fetch, numpy slicing over the
        pre-sorted (band_id, band_hash) runs, shingle sets cached per doc —
        never one task (or one ray.get) per band bucket."""
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64")})
        if not len(bucket):
            return empty
        texts = ray.get(text_by_id)  # object-store local after first fetch
        band = bucket["band_id"].to_numpy()
        bh = bucket["band_hash"].to_numpy()
        docs_arr = bucket["doc_id"].to_numpy()
        change = (np.diff(band) != 0) | (np.diff(bh) != 0)
        bounds = np.concatenate([[0], np.nonzero(change)[0] + 1, [len(band)]])
        shingle_cache: dict = {}

        def sh(doc):
            if doc not in shingle_cache:
                shingle_cache[doc] = char_shingles(texts[doc])
            return shingle_cache[doc]

        rows = {"a": [], "b": []}
        seen_pairs: set = set()
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            ids = sorted(set(docs_arr[s:e].tolist()))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pair = (ids[i], ids[j])
                    if pair in seen_pairs:
                        continue
                    seen_pairs.add(pair)
                    if jaccard(sh(ids[i]), sh(ids[j])) >= threshold:
                        rows["a"].append(ids[i])
                        rows["b"].append(ids[j])
        return pd.DataFrame(rows) if rows["a"] else empty

    pairs = grouped_map_buckets(banded, ["band_id", "band_hash"],
                                verify_bucket, num_buckets=64,
                                whole_bucket=True)
    # same pair can surface from several bands -> distinct
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])


def q_dedup_simhash(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def _sim(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "simhash": simhash64(batch["text"].tolist())})

    return docs.map_batches(_sim, batch_format="pandas")


def q_dedup_ngram(sf_dir: str, n: int = 3, threshold: float = 0.5):
    """Word-n-gram Jaccard near-dup pairs, bucketed by (lang, length
    decile) so only plausible pairs are compared — the cheap blocking
    stage before pairwise verification."""
    from .ops.dedup import jaccard, word_ngrams

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["bucket"] = batch["lang"].fillna("und") + ":" + (
            batch["text"].str.len() // 100).astype(str)
        return batch

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["doc_id"].to_numpy()
        grams = [word_ngrams(t, n) for t in group["text"]]
        order = np.argsort(ids, kind="stable")
        rows = {"a": [], "b": []}
        for i in range(len(order)):
            for j in range(i + 1, len(order)):
                oi, oj = order[i], order[j]
                if jaccard(grams[oi], grams[oj]) >= threshold:
                    rows["a"].append(int(ids[oi]))
                    rows["b"].append(int(ids[oj]))
        return pd.DataFrame(rows) if rows["a"] else pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})

    return grouped_map_buckets(
        docs.map_batches(bucketize, batch_format="pandas"),
        ["bucket"], verify, num_buckets=32)


def q_dedup_phash(sf_dir: str, max_hamming: int = 10):
    """Perceptual-hash near-dup pairs over the synthetic image table:
    16-bit band LSH -> groupby(band) -> hamming verify -> distinct pairs."""
    from .ops.dedup import phash_band_rows, phash_dup_pairs_in_bucket
    from .pipelines.flagship import build_images

    images = build_images(sf_dir).select_columns(["image_id", "phash"])

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        df = phash_band_rows(batch["phash"].to_numpy(),
                             batch["image_id"].to_numpy())
        df["phash"] = np.tile(batch["phash"].to_numpy(), 4)
        return df

    def verify_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype=object),
                              "b": pd.Series(dtype=object)})
        if not len(bucket):
            return empty
        band = bucket["band_id"].to_numpy()
        bh = bucket["band_hash"].to_numpy()
        ids = bucket["doc_id"].to_numpy()
        hashes = bucket["phash"].to_numpy()
        change = (np.diff(band) != 0) | (np.diff(bh) != 0)
        bounds = np.concatenate([[0], np.nonzero(change)[0] + 1, [len(band)]])
        rows = {"a": [], "b": []}
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            for a, b, _ in phash_dup_pairs_in_bucket(
                    ids[s:e], hashes[s:e], max_hamming=max_hamming):
                rows["a"].append(a)
                rows["b"].append(b)
        return pd.DataFrame(rows) if rows["a"] else empty

    pairs = grouped_map_buckets(
        images.map_batches(to_bands, batch_format="pandas"),
        ["band_id", "band_hash"], verify_bucket, num_buckets=64,
        whole_bucket=True)
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])


def q_dedup_phash_clusters(sf_dir: str, max_hamming: int = 10):
    """Scale-sane perceptual-hash dedup: one row per image with its
    duplicate-cluster representative, instead of the O(group²) pair list.

    exact collapse (groupby phash -> min image_id rep)
      -> band-LSH over DISTINCT hashes only
      -> near-dup pairs among representatives (bounded: distinct hashes)
      -> driver-side union-find over the tiny rep-pair set
      -> broadcast cluster map, per-batch lookup.
    """
    from .ops.dedup import phash_band_rows, phash_dup_pairs_in_bucket
    from .pipelines.flagship import build_images

    images = build_images(sf_dir).select_columns(["image_id", "phash"])

    # exact collapse: representative id per distinct hash
    def partial_min(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("phash", as_index=False, sort=False) \
                    .agg(rep=("image_id", "min"))

    from ray.data.aggregate import Min

    reps = images.map_batches(partial_min, batch_format="pandas") \
        .groupby("phash").aggregate(Min("rep", alias_name="rep")).to_pandas()

    # near-dup pairs among the (small) distinct-hash set, via band LSH
    banded = phash_band_rows(reps["phash"].to_numpy(), reps["rep"].to_numpy())
    banded["phash"] = np.tile(reps["phash"].to_numpy(), 4)
    banded = banded.sort_values(["band_id", "band_hash"], kind="mergesort")
    band = banded["band_id"].to_numpy()
    bh = banded["band_hash"].to_numpy()
    change = (np.diff(band) != 0) | (np.diff(bh) != 0)
    bounds = np.concatenate([[0], np.nonzero(change)[0] + 1, [len(band)]])
    pairs = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s >= 2:
            pairs.extend((a, b) for a, b, _ in phash_dup_pairs_in_bucket(
                banded["doc_id"].to_numpy()[s:e],
                banded["phash"].to_numpy()[s:e], max_hamming=max_hamming))

    # union-find over representative pairs (tiny)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    cluster_of_hash = {
        int(h): find(r) for h, r in zip(reps["phash"], reps["rep"])
    }
    ref = ray.put(cluster_of_hash)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(ref)
        return pd.DataFrame({
            "image_id": batch["image_id"],
            "cluster_rep": [table[int(h)] for h in batch["phash"]],
        })

    return images.map_batches(assign, batch_format="pandas")


def q_audio_features(sf_dir: str):
    """Audio actor-pool stage over a deterministic synthetic clip table
    (codec stubbed; plumbing real — see images/multimodal.py)."""
    import ray.data as rd
    from .images.multimodal import AudioFeatures, synth_audio_table

    clips = rd.from_pandas(synth_audio_table(64))
    out = clips.map_batches(AudioFeatures, batch_format="pandas",
                            batch_size=16, concurrency=(1, 4))

    def _round(batch: pd.DataFrame) -> pd.DataFrame:
        batch["rms"] = batch["rms"].round(6)
        batch["duration_sec"] = batch["duration_sec"].round(6)
        return batch

    return out.map_batches(_round, batch_format="pandas")


def q_video_frames(sf_dir: str):
    """Video frame-sampling fan-out stage (codec stubbed, plumbing real)."""
    import ray.data as rd
    from .images.multimodal import VideoFrameSample, synth_video_table

    vids = rd.from_pandas(synth_video_table(16))
    frames = vids.map_batches(VideoFrameSample, batch_format="pandas",
                              batch_size=4, concurrency=(1, 4),
                              fn_constructor_kwargs={"every_n": 10})
    return frames.map_batches(
        lambda b: b[["video_id", "frame_no", "w", "h", "fmt", "caption"]],
        batch_format="pandas")


def q_dedup_embedding(sf_dir: str, threshold: float = 0.35):
    """All-pairs cosine near-dup over the embedding column: each batch is
    scored against the broadcast normalized corpus (one pass, no shuffle)."""
    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pdf = emb.to_pandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((pdf["vec_id"].to_numpy(), mat))

    class PairFinder:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            bm = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
            sims = bm @ self.mat.T
            bids = batch["vec_id"].to_numpy()
            rows = {"a": [], "b": []}
            for i in range(len(bids)):
                hits = np.where(sims[i] >= threshold)[0]
                for j in hits:
                    if bids[i] < self.ids[j]:
                        rows["a"].append(int(bids[i]))
                        rows["b"].append(int(self.ids[j]))
            return pd.DataFrame(rows) if rows["a"] else pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})

    return emb.map_batches(PairFinder, batch_format="pandas", concurrency=(1, 8))


Q_DEDUP_EMBEDDING_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def q_ann_topk(sf_dir: str, k: int = 5, n_queries: int = 4):
    """Brute-force cosine top-k: broadcast query matrix, per-batch partial
    top-k, tiny driver-side merge."""
    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = emb.filter(lambda r: r["vec_id"] < n_queries).to_pandas()
    qdf = qdf.sort_values("vec_id")
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy()
    ref = ray.put(qmat)

    class Partial:
        def __init__(self):
            self.q = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(batch["embedding"].to_numpy())
            return batch_topk_partials(batch["vec_id"].to_numpy(), mat, self.q, k)

    partials = emb.map_batches(Partial, batch_format="pandas",
                               concurrency=(1, 8)).to_pandas()
    top = merge_topk(partials, k)
    top["query_id"] = qids[top["query_id"].to_numpy()]
    return top[["query_id", "vec_id", "rank"]].astype("int64")


Q_ANN_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 4),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.qe, e.embedding) AS sim
      FROM q CROSS JOIN embeddings e)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM s) WHERE rank <= 5
"""


def q_ann_lsh(sf_dir: str, k: int = 5, n_queries: int = 4,
              n_planes: int = 8, probe_bits: int = 3):
    """LSH-bucketed ANN — the scale path: random-hyperplane signs bucket
    the corpus (one groupby co-partition); queries multi-probe their bucket
    plus ``probe_bits`` single-bit flips, so only ~(1+probes)/2^planes of
    the corpus is scored per query.  Exact top-k within scanned candidates;
    the brute-force q_ann_topk is the recall baseline."""
    from .ops.ann import HyperplaneLSH, batch_topk_partials, merge_topk

    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = emb.filter(lambda r: r["vec_id"] < n_queries).to_pandas()
    qdf = qdf.sort_values("vec_id")
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy()
    dim = qmat.shape[1]
    lsh = HyperplaneLSH(dim=dim, n_planes=n_planes)
    q_buckets = lsh.probe_buckets(lsh.bucket(qmat), n_probe_bits=probe_bits)
    # bucket -> query indexes probing it
    probes: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for b in q_buckets[qi]:
            probes.setdefault(int(b), []).append(qi)
    ref = ray.put((qmat, probes))

    class BucketScore:
        def __init__(self):
            self.lsh = HyperplaneLSH(dim=dim, n_planes=n_planes)
            self.qmat, self.probes = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(batch["embedding"].to_numpy())
            buckets = self.lsh.bucket(mat)
            frames = []
            for b in np.unique(buckets):
                qis = self.probes.get(int(b))
                if not qis:
                    continue
                mask = buckets == b
                part = batch_topk_partials(
                    batch["vec_id"].to_numpy()[mask], mat[mask],
                    self.qmat[qis], k)
                part["query_id"] = np.asarray(qis)[part["query_id"].to_numpy()]
                frames.append(part)
            if not frames:
                return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                     "vec_id": pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float64")})
            return pd.concat(frames, ignore_index=True)

    partials = emb.map_batches(BucketScore, batch_format="pandas",
                               concurrency=(1, 8)).to_pandas()
    top = merge_topk(partials, k)
    top["query_id"] = qids[top["query_id"].to_numpy()]
    return top[["query_id", "vec_id", "rank"]].astype("int64")


def q_ann_ivf(sf_dir: str, k: int = 5, n_queries: int = 4,
              nlist: int = 16, nprobe: int = 4):
    """IVF-Flat ANN — the second scale path: a deterministic spherical
    k-means coarse quantizer (trained on a driver-side sample, broadcast
    once) buckets the corpus; each query scores exactly within its
    ``nprobe`` nearest lists.  With nprobe == nlist this is EXACTLY the
    brute-force top-k (tested)."""
    from .ops.ann import IVFIndex, batch_topk_partials, kmeans_fit, merge_topk

    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # train the coarse quantizer on a bounded sample (deterministic: first
    # rows by vec_id order); at 10^12 rows this is a take() not a to_pandas
    sample = emb.sort("vec_id").limit(2048).to_pandas()
    smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    index = IVFIndex(kmeans_fit(smat, nlist))

    qdf = sample[sample["vec_id"] < n_queries].sort_values("vec_id")
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy()
    probes = index.probe(qmat, nprobe)           # (nq, nprobe)
    lists_to_queries: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for lid in probes[qi]:
            lists_to_queries.setdefault(int(lid), []).append(qi)
    ref = ray.put((index.centroids, qmat, lists_to_queries))

    class ListScore:
        def __init__(self):
            cents, self.qmat, self.l2q = ray.get(ref)
            self.index = IVFIndex(cents)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(batch["embedding"].to_numpy())
            lists = self.index.assign(mat)
            frames = []
            for lid in np.unique(lists):
                qis = self.l2q.get(int(lid))
                if not qis:
                    continue
                mask = lists == lid
                part = batch_topk_partials(
                    batch["vec_id"].to_numpy()[mask], mat[mask],
                    self.qmat[qis], k)
                part["query_id"] = np.asarray(qis)[part["query_id"].to_numpy()]
                frames.append(part)
            if not frames:
                return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                     "vec_id": pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float64")})
            return pd.concat(frames, ignore_index=True)

    partials = emb.map_batches(ListScore, batch_format="pandas",
                               concurrency=(1, 8)).to_pandas()
    top = merge_topk(partials, k)
    top["query_id"] = qids[top["query_id"].to_numpy()]
    return top[["query_id", "vec_id", "rank"]].astype("int64")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_token_count(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(TextStats, batch_format="pandas", concurrency=(1, 8))
    return out.select_columns(["doc_id", "n_tokens"])


Q_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
FROM documents
"""


def q_text_quality(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(TextStats, batch_format="pandas", concurrency=(1, 8))
    return out.select_columns(["doc_id", "n_chars", "n_punct"])


Q_TEXT_QUALITY_SQL = """
SELECT doc_id, length(text) AS n_chars,
       length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
FROM documents
"""


def q_lang_id(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(LangId, batch_format="pandas", concurrency=(1, 8))
    return out.select_columns(["doc_id", "lang_pred"])


def q_fingerprint(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(fingerprint_batch, batch_format="pandas")
    return out.select_columns(["doc_id", "content_md5"])


Q_FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS content_md5 FROM documents"


# ---------------------------------------------------------------------------
# spatial kernels with arithmetic oracles
# ---------------------------------------------------------------------------

_CELL_RES = 17
_CELL_N = 1 << _CELL_RES


def q_cell_encode(sf_dir: str):
    """Row-major grid-cell encoding of deterministic per-event coordinates
    (SQL-friendly form of the Morton encoder's (x, y) stage)."""
    events = _pq(sf_dir, "events", columns=["event_id"])

    def _enc(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["event_id"].to_numpy(dtype=np.int64)
        lon = 13.4 + (ids % 1000) * 0.0002
        lat = 51.0 + ((ids // 1000) % 1000) * 0.0001
        ix = np.floor((lon + 180.0) / 360.0 * _CELL_N).astype(np.int64)
        iy = np.floor((lat + 90.0) / 180.0 * _CELL_N).astype(np.int64)
        return pd.DataFrame({"event_id": ids, "grid_cell": ix * _CELL_N + iy})

    return events.map_batches(_enc, batch_format="pandas")


Q_CELL_ENCODE_SQL = f"""
SELECT event_id,
       CAST(floor((13.4 + (event_id % 1000) * 0.0002 + 180.0) / 360.0 * {_CELL_N}) AS BIGINT) * {_CELL_N}
     + CAST(floor((51.0 + ((event_id // 1000) % 1000) * 0.0001 + 90.0) / 180.0 * {_CELL_N}) AS BIGINT)
       AS grid_cell
FROM events
"""


def q_knn_assign(sf_dir: str):
    """kNN (k=1) assignment of synthetic customer points to synthetic
    nation centers — the SQL-checkable skeleton of the image->way kNN."""
    customer = _pq(sf_dir, "customer", columns=["c_custkey"])
    nation = _pq(sf_dir, "nation", columns=["n_nationkey"]).to_pandas()
    ck = nation["n_nationkey"].to_numpy(dtype=np.int64)
    cx = (ck * 211) % 1000
    cy = (ck * 457) % 1000
    ref = ray.put((ck, cx, cy))

    class Assign:
        def __init__(self):
            self.ck, self.cx, self.cy = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            keys = batch["c_custkey"].to_numpy(dtype=np.int64)
            px = (keys * 37) % 1000
            py = (keys * 91) % 1000
            d2 = (px[:, None] - self.cx[None, :]) ** 2 \
                + (py[:, None] - self.cy[None, :]) ** 2
            # deterministic: min by (d2, center id); centers pre-sorted by id
            order = np.argsort(self.ck, kind="stable")
            d2o = d2[:, order]
            best = order[np.argmin(d2o, axis=1)]
            return pd.DataFrame({"c_custkey": keys,
                                 "nearest_center": self.ck[best].astype("int64")})

    return customer.map_batches(Assign, batch_format="pandas",
                                concurrency=(1, 8))


Q_KNN_ASSIGN_SQL = """
WITH pts AS (SELECT c_custkey, (c_custkey * 37) % 1000 AS px,
                    (c_custkey * 91) % 1000 AS py FROM customer),
ctr AS (SELECT n_nationkey, (n_nationkey * 211) % 1000 AS cx,
               (n_nationkey * 457) % 1000 AS cy FROM nation),
d AS (SELECT c_custkey, n_nationkey,
             (px - cx) * (px - cx) + (py - cy) * (py - cy) AS d2
      FROM pts CROSS JOIN ctr)
SELECT c_custkey, n_nationkey AS nearest_center FROM (
  SELECT c_custkey, n_nationkey,
         row_number() OVER (PARTITION BY c_custkey ORDER BY d2, n_nationkey) AS rn
  FROM d) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# CQI + spatial pipelines (no SQL oracle: golden pytest carries exactness)
# ---------------------------------------------------------------------------

def q_cqi_scores(sf_dir: str):
    """Full CQI scoring of the conformance corpus through the distributed
    pipeline (exactness enforced by tests/test_golden.py)."""
    from .io.geojson import read_ways_geojson
    from .pipelines.cqi import dataset_from_rows, score_ways_dataset

    rows = read_ways_geojson(os.path.join(_REPO, "tests", "data", "test_ways.geojson"))
    scored = score_ways_dataset(dataset_from_rows(rows))
    return scored.drop_columns(["geometry_m"])


def q_images_assign(sf_dir: str):
    from .pipelines.flagship import run_flagship

    out = run_flagship(sf_dir)
    return out.map_batches(
        lambda b: b[["image_id", "way_id", "method", "dist_m", "caption"]],
        batch_format="pandas")


def q_tiles(sf_dir: str):
    from .pipelines.flagship import build_scored_ways
    from .pipelines.tiles import render_tiles

    tiles = render_tiles(build_scored_ways(64), zooms=(14, 15))
    return tiles.map_batches(lambda b: b[["z", "x", "y", "n_ways"]],
                             batch_format="pandas")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "filter_project": q_filter_project,
    "groupby_agg": q_groupby_agg,
    "join_broadcast": q_join_broadcast,
    "join_bucketed": q_join_bucketed,
    "topk": q_topk,
    "distinct": q_distinct,
    "events_agg": q_events_agg,
    "window_tumbling": q_window_tumbling,
    "sessionize": q_sessionize,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram": q_dedup_ngram,
    "dedup_phash": q_dedup_phash,
    "dedup_phash_clusters": q_dedup_phash_clusters,
    "dedup_embedding": q_dedup_embedding,
    "audio_features": q_audio_features,
    "video_frames": q_video_frames,
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "token_count": q_token_count,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "cell_encode": q_cell_encode,
    "knn_assign": q_knn_assign,
    "cqi_scores": q_cqi_scores,
    "images_assign": q_images_assign,
    "tiles": q_tiles,
}

ORACLES = {
    "filter_project": Q_FILTER_PROJECT_SQL,
    "groupby_agg": Q_GROUPBY_AGG_SQL,
    "join_broadcast": Q_JOIN_BROADCAST_SQL,
    "join_bucketed": Q_JOIN_BUCKETED_SQL,
    "topk": Q_TOPK_SQL,
    "distinct": Q_DISTINCT_SQL,
    "events_agg": Q_EVENTS_AGG_SQL,
    "window_tumbling": Q_WINDOW_TUMBLING_SQL,
    "sessionize": Q_SESSIONIZE_SQL,
    "dedup_exact": Q_DEDUP_EXACT_SQL,
    "dedup_embedding": Q_DEDUP_EMBEDDING_SQL,
    "ann_topk": Q_ANN_TOPK_SQL,
    "token_count": Q_TOKEN_COUNT_SQL,
    "text_quality": Q_TEXT_QUALITY_SQL,
    "fingerprint": Q_FINGERPRINT_SQL,
    "cell_encode": Q_CELL_ENCODE_SQL,
    "knn_assign": Q_KNN_ASSIGN_SQL,
}
