"""Distributed graph primitives.

``connected_components``: min-label propagation (hash-to-min) over an
edge Dataset — the scale-safe replacement for driver-side union-find
when the vertex/edge set no longer fits one machine.  Each iteration is
two co-partitioned bucket shuffles (labels->edges message join, then a
per-vertex min-reduce); convergence is detected distributedly (count of
changed labels) and the loop stops early.  Iterations needed = graph
diameter (near-dup clusters are tiny, so 2-4 in practice); ``max_iters``
caps pathological chains.

Deterministic: labels are vertex ids, min-reduction has no ties to
break, bucket hashing is splitmix64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ..relational import _splitmix64 as _graph_mix
from ..relational import grouped_map_buckets


def _cc_min_combine(dst: np.ndarray, val: np.ndarray):
    """(dst, val) message arrays -> one (dst, min val) row per dst."""
    if not len(dst):
        return dst, val
    uniq, inv = np.unique(dst, return_inverse=True)
    out = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(out, inv, val)
    return uniq, out


def connected_components(edges: rd.Dataset, src: str = "a", dst: str = "b",
                         max_iters: int = 25,
                         num_buckets: int = 32) -> rd.Dataset:
    """(vertex, component) for every vertex appearing in ``edges``;
    component = min vertex id reachable (transitive closure of the
    undirected edge set).

    Raw-task WAVES over pinned hash-bucketed edge blocks — the kcore
    treatment applied to label propagation.  The Dataset-round form
    re-shuffled the full symmetrized edge set TWICE per pointer-doubling
    round plus paid ~3 streaming-executor floors, so a depth-14 graph
    (chain length 10k) cost ~4 s/round regardless of how little was
    still changing (measured 57.5 s at 2M edges,
    scripts/graph_scale_experiment.py).  Here:

    * prep: ONE scatter wave hash-partitions the symmetrized edges into
      ``num_buckets`` pinned (u-sorted) blocks — hash(u) co-locates a
      vertex's out-edges with its label for the whole run; static edges
      never move again;
    * each round is two task waves. Messages: bucket i sends
      (v <- lbl[u]) along out-edges of FRONTIER vertices only (a label
      change fires each edge exactly once — a non-frontier u's value was
      already min-folded by every neighbor the round after u last
      changed) plus doubling replies (x <- lbl[l]) for every parent
      request, min-combined per destination bucket before they ship.
      Reduce: bucket j min-folds incoming messages into its labels,
      flags the new frontier, and emits next-round parent requests
      (l, x) for every non-root x, partitioned by hash(l).
    * per-round traffic is O(frontier edges + vertices) narrow int64
      pairs instead of O(E) re-shuffles; rounds are pure ray.remote
      waves with no Dataset-executor floor.

    Stop when no label changed.  At the fixpoint every parent is a root
    (reply min-folding) and every edge is label-consistent (the frontier
    invariant above), so labels are exactly the per-component minimum —
    the same fixpoint the Dataset-round form proved against the DuckDB
    oracles; determinism is inherent (min-reduction, no ties).
    """
    import ray

    from ..runtime import materialized_block_refs

    B = max(2, num_buckets)  # num_returns=B task plumbing needs B >= 2
    edges = edges.materialize()

    @ray.remote
    def _scatter(block):
        """One input block -> B (u, v) piece pairs, bucketed by hash(u)
        after symmetrizing (num_returns=B splits them into refs)."""
        b = block.to_pandas() if not isinstance(block, pd.DataFrame) else block
        if not len(b) or src not in b.columns:  # empty/schema-less blocks
            z = np.zeros(0, np.int64)
            return [(z, z)] * B
        a = b[src].to_numpy(np.int64)
        c = b[dst].to_numpy(np.int64)
        u, v = np.r_[a, c], np.r_[c, a]
        h = (_graph_mix(u.astype(np.uint64)) % np.uint64(B)).astype(np.int64)
        order = np.argsort(h, kind="stable")
        u, v, h = u[order], v[order], h[order]
        cuts = np.searchsorted(h, np.arange(B + 1))
        return [(u[cuts[i]:cuts[i + 1]], v[cuts[i]:cuts[i + 1]])
                for i in range(B)]

    @ray.remote(num_returns=2)
    def _build(*pieces):
        u = np.concatenate([p[0] for p in pieces]) if pieces \
            else np.zeros(0, np.int64)
        v = np.concatenate([p[1] for p in pieces]) if pieces \
            else np.zeros(0, np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        verts = np.unique(u)
        # labels start as self; everything starts on the frontier
        return (u, v), (verts, verts.copy(), np.ones(len(verts), bool))

    @ray.remote
    def _messages(ed, lab, *reqs):
        """One message wave for one bucket: frontier edge messages +
        doubling replies, min-combined per destination bucket.  Returns
        a B-list of (dst_vertex, label) pairs."""
        u, v = ed
        verts, lbl, frontier = lab
        dsts, vals = [], []
        if len(u):
            on = frontier[np.searchsorted(verts, u)]
            if on.any():
                dsts.append(v[on])
                vals.append(lbl[np.searchsorted(verts, u[on])])
        for r in reqs:
            l, x = r
            if len(l):
                dsts.append(x)
                vals.append(lbl[np.searchsorted(verts, l)])
        if dsts:
            d = np.concatenate(dsts)
            w = np.concatenate(vals)
        else:
            d = w = np.zeros(0, np.int64)
        h = (_graph_mix(d.astype(np.uint64)) % np.uint64(B)).astype(np.int64)
        out = []
        for j in range(B):
            m = h == j
            out.append(_cc_min_combine(d[m], w[m]))
        return out

    @ray.remote
    def _reduce(lab, *msgs):
        """Min-fold one bucket's incoming messages; returns (with
        num_returns=2+B) the new label state, the changed count, and
        next-round parent requests (l, x) per destination bucket."""
        verts, lbl, _ = lab
        new = lbl.copy()
        for d, w in msgs:
            if len(d):
                np.minimum.at(new, np.searchsorted(verts, d), w)
        frontier = new < lbl
        ask = new < verts  # non-roots keep polling their parent
        l, x = new[ask], verts[ask]
        h = (_graph_mix(l.astype(np.uint64)) % np.uint64(B)).astype(np.int64)
        return ((verts, new, frontier), int(frontier.sum()),
                *[(l[h == j], x[h == j]) for j in range(B)])

    @ray.remote
    def _to_frame(lab):
        verts, lbl, _ = lab
        return pd.DataFrame({"vertex": verts, "component": lbl})

    scat = [_scatter.options(num_returns=B).remote(r)
            for r in materialized_block_refs(edges)]

    edge_refs, lab_refs = [], []
    for i in range(B):
        e, l = _build.remote(*[pieces[i] for pieces in scat])
        edge_refs.append(e)
        lab_refs.append(l)

    req_refs: list[list] = [[] for _ in range(B)]  # round 1: no requests
    for _ in range(max_iters):
        msg_refs = [_messages.options(num_returns=B)
                    .remote(edge_refs[i], lab_refs[i], *req_refs[i])
                    for i in range(B)]
        new_labs, counts, all_reqs = [], [], []
        for j in range(B):
            outs = _reduce.options(num_returns=2 + B).remote(
                lab_refs[j], *[msg_refs[i][j] for i in range(B)])
            new_labs.append(outs[0])
            counts.append(outs[1])
            all_reqs.append(outs[2:])
        lab_refs = new_labs
        # requests destined to bucket i, one piece from every reducer j
        req_refs = [[all_reqs[j][i] for j in range(B)] for i in range(B)]
        if sum(ray.get(counts)) == 0:
            break

    import ray.data

    return ray.data.from_pandas_refs([_to_frame.remote(l) for l in lab_refs])


def grouped_all_pairs(sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized within-group all-pairs index generation: given
    contiguous group sizes ``c_0..c_{g-1}`` over a flat array of
    ``sum(c)`` elements, return (i, j) index arrays covering every
    unordered pair (i < j) WITHIN each group — sum(c*(c-1)/2) pairs,
    no Python loop over groups.  The fan-out primitive behind
    co-occurrence pair mining and wedge generation."""
    sizes = np.asarray(sizes, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    total = int(sizes.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    idx = np.arange(total, dtype=np.int64)
    pos = idx - np.repeat(starts, sizes)            # position within group
    fan = np.repeat(sizes, sizes) - 1 - pos          # pairs led by each i
    i = np.repeat(idx, fan)
    if not len(i):
        return i, i.copy()
    run_start = np.concatenate(([0], np.cumsum(fan)[:-1]))
    j = np.arange(len(i), dtype=np.int64) - np.repeat(run_start, fan) + i + 1
    return i, j


def triangle_count(edges: rd.Dataset, a: str = "a", b: str = "b",
                   num_buckets: int = 32,
                   broadcast_below: int = 20_000_000) -> int:
    """Exact triangle count of an undirected simple graph (edges given
    once as a<b pairs, no self-loops).  Degree-oriented wedge counting
    — the communication-optimal distributed plan:

    1. one partial-sum pass computes every vertex's degree (bounded:
       O(vertices), broadcast back as a rank LUT ordered by (deg, id));
    2. each edge is oriented low-rank -> high-rank, capping every
       vertex's out-degree at O(sqrt(m)) so no wedge task explodes on
       hub vertices (the skew guard);
    3. wedges (pairs of out-neighbors, rank-ordered) are generated per
       source with the vectorized ``grouped_all_pairs`` fan-out after
       ONE bucketed shuffle on the source vertex;
    4. wedge closure against the edge set — two plans, chosen by edge
       count (the same broadcast-vs-shuffle decision as PageRank):
       * m <= ``broadcast_below``: the sorted packed edge-key array
         (8 B/edge, e.g. 6 MB at 800k edges) is broadcast via ray.put
         and wedges close INSIDE their generation task with one
         searchsorted — the O(sum deg²) wedge set never leaves its
         task, no second shuffle (measured 35 s -> ~5 s at sf0.1's
         15M wedges / 800k edges);
       * larger graphs: wedges ⋈ edges bucketed semi-join count on the
         packed key; nothing driver-resident scales with the graph.

    Vertex ids must fit 32 bits (keys are packed lo<<32|hi)."""
    from ..relational import partial_then_global_sum

    def degree_partial(bt: pd.DataFrame) -> pd.DataFrame:
        both = np.concatenate([bt[a].to_numpy(np.int64),
                               bt[b].to_numpy(np.int64)])
        u, c = np.unique(both, return_counts=True)
        return pd.DataFrame({"v": u, "deg": c})

    deg = partial_then_global_sum(
        edges.map_batches(degree_partial, batch_format="pandas"),
        keys=["v"], sums={"deg": "deg"}).to_pandas()
    order = deg.sort_values(["deg", "v"], kind="mergesort")
    rank = pd.Series(np.arange(len(order), dtype=np.int64),
                     index=order["v"].to_numpy())
    import ray
    rank_ref = ray.put(rank)

    def orient(bt: pd.DataFrame, _ref=rank_ref) -> pd.DataFrame:
        r = ray.get(_ref) if not isinstance(_ref, pd.Series) else _ref
        ra = r.reindex(bt[a].to_numpy(np.int64)).to_numpy()
        rb = r.reindex(bt[b].to_numpy(np.int64)).to_numpy()
        av, bv = bt[a].to_numpy(np.int64), bt[b].to_numpy(np.int64)
        lo = np.where(ra <= rb, av, bv)       # rank orientation
        hi = np.where(ra <= rb, bv, av)
        rlo = np.minimum(ra, rb)
        rhi = np.maximum(ra, rb)
        return pd.DataFrame({"src": lo, "nbr": hi,
                             "rs": rlo.astype(np.int64),
                             "rn": rhi.astype(np.int64)})

    oriented = edges.map_batches(orient, batch_format="pandas") \
        .materialize()  # consumed by wedge gen AND edge-key extraction
    m_edges = oriented.count()

    def _wedge_arrays(bucket: pd.DataFrame):
        s = bucket.sort_values(["src", "rn"], kind="mergesort")
        srcs = s["src"].to_numpy()
        sizes = np.diff(np.flatnonzero(
            np.r_[True, srcs[1:] != srcs[:-1], True]))
        i, j = grouped_all_pairs(sizes)
        # neighbors sorted by rank within src, so (i, j) is already
        # rank-ordered — matching the lo->hi edge orientation
        nb = s["nbr"].to_numpy(np.int64)
        return (nb[i].astype(np.uint64) << np.uint64(32)) \
            | nb[j].astype(np.uint64)

    if m_edges <= broadcast_below:
        # broadcast plan: relabel edges into RANK space — orientation is
        # by rank, so the sorted (rank_lo<<32|rank_hi) key array IS a CSR
        # adjacency (grouped by source rank, neighbors ascending, which
        # is rank order).  Wedge counting then needs NO shuffle at all:
        # one wave of raw tasks over wedge-balanced source ranges reads
        # the broadcast CSR zero-copy, generates its wedges with
        # grouped_all_pairs and closes them with one searchsorted.
        # (Replaces a bucketed src shuffle + skewed bucket kernels:
        # 8.7 s -> ~1.5 s for the 41M-wedge close at sf0.1.)
        def rank_keys(bt: pd.DataFrame) -> pd.DataFrame:
            key = (bt["rs"].to_numpy(np.uint64) << np.uint64(32)) \
                | bt["rn"].to_numpy(np.uint64)
            return pd.DataFrame({"key": key})

        ekeys = np.sort(oriented.map_batches(
            rank_keys, batch_format="pandas").to_pandas()["key"]
            .to_numpy(np.uint64))
        if not len(ekeys):
            return 0
        srcs = (ekeys >> np.uint64(32)).astype(np.int64)
        bounds = np.flatnonzero(np.r_[True, srcs[1:] != srcs[:-1], True])
        sizes = np.diff(bounds)
        wedge_mass = (sizes * (sizes - 1) // 2).astype(np.int64)
        total_w = int(wedge_mass.sum())
        if total_w == 0:
            return 0
        n_tasks = min(max(1, num_buckets * 4), len(sizes))
        cum = np.cumsum(wedge_mass)
        cuts = np.unique(np.searchsorted(
            cum, np.linspace(0, total_w, n_tasks + 1)[1:-1]))
        group_ranges = np.concatenate(([0], cuts + 1, [len(sizes)]))
        group_ranges = np.unique(group_ranges)
        ekeys_ref = ray.put(ekeys)
        bounds_ref = ray.put(bounds)

        @ray.remote(num_cpus=1)
        def count_range(ek, bd, glo: int, ghi: int) -> int:
            # ObjectRef args auto-deref: ek/bd arrive as zero-copy arrays
            lo, hi = int(bd[glo]), int(bd[ghi])
            gsizes = np.diff(bd[glo:ghi + 1])
            i, j = grouped_all_pairs(gsizes)
            if not len(i):
                return 0
            nbr = ek[lo:hi] & np.uint64(0xFFFFFFFF)
            wk = (nbr[i] << np.uint64(32)) | nbr[j]
            pos = np.searchsorted(ek, wk)
            pos[pos >= len(ek)] = len(ek) - 1
            return int((ek[pos] == wk).sum())

        futs = [count_range.remote(ekeys_ref, bounds_ref,
                                   int(g0), int(g1))
                for g0, g1 in zip(group_ranges[:-1], group_ranges[1:])]
        return int(sum(ray.get(futs)))

    def wedges(bucket: pd.DataFrame) -> pd.DataFrame:
        if not len(bucket):
            return pd.DataFrame({"key": pd.Series(dtype="uint64"),
                                 "w": pd.Series(dtype="int64")})
        key = _wedge_arrays(bucket)
        return pd.DataFrame({"key": key,
                             "w": np.ones(len(key), dtype=np.int64)})

    wedge_keys = grouped_map_buckets(oriented, ["src"], wedges,
                                     num_buckets=num_buckets,
                                     whole_bucket=True)

    def edge_keys(bt: pd.DataFrame) -> pd.DataFrame:
        # oriented rows are already rank lo->hi, so src<<32|nbr IS the key
        key = (bt["src"].to_numpy(np.uint64) << np.uint64(32)) \
            | bt["nbr"].to_numpy(np.uint64)
        return pd.DataFrame({"key": key,
                             "w": np.zeros(len(bt), dtype=np.int64)})

    ek = oriented.map_batches(edge_keys, batch_format="pandas")

    def close_count(bucket: pd.DataFrame) -> pd.DataFrame:
        have = bucket.loc[bucket["w"] == 0, "key"].to_numpy()
        wk = bucket.loc[bucket["w"] == 1, "key"].to_numpy()
        n = int(np.isin(wk, have).sum()) if len(wk) and len(have) else 0
        return pd.DataFrame({"n": [n]})

    parts = grouped_map_buckets(wedge_keys.union(ek), ["key"], close_count,
                                num_buckets=num_buckets, whole_bucket=True)
    return int(parts.to_pandas()["n"].sum())


def clustering_coefficients(edges: rd.Dataset, a: str = "a", b: str = "b",
                            num_buckets: int = 32,
                            broadcast_below: int = 20_000_000) -> pd.DataFrame:
    """Per-node triangle counts + local clustering coefficient
    (2·tri / deg·(deg−1)) of an undirected simple graph (edges given once
    as a<b pairs).  Same distributed prep and broadcast-vs-bucketed plan
    switch as ``triangle_count`` — the edge table NEVER materializes on
    the driver; only O(vertices) state does (the degree/rank LUT and the
    per-node result, the same documented bound triangle_count carries):

    * degrees via one combiner-first bucketed reduce;
    * edges oriented low-(deg,id)-rank -> high so out-degree is O(√m)
      (hub-skew guard; every triangle closes at exactly one apex);
    * m ≤ ``broadcast_below``: the sorted rank-space packed key array
      broadcasts once (8 B/edge) and wedge-balanced raw tasks close
      wedges with one searchsorted, returning SPARSE (rank, count)
      partials — a closed wedge credits apex and both endpoints;
    * larger graphs: wedges ⋈ edges bucketed semi-join on the packed
      key, closed wedges fan out 3 (node, 1) increments, folded by the
      same combiner-first reduce.  Nothing driver-resident scales with
      the edge count.

    Vertex ids must fit 32 bits (keys are packed lo<<32|hi)."""
    import ray

    from ..relational import partial_then_global_sum

    def degree_partial(bt: pd.DataFrame) -> pd.DataFrame:
        both = np.concatenate([bt[a].to_numpy(np.int64),
                               bt[b].to_numpy(np.int64)])
        u, c = np.unique(both, return_counts=True)
        return pd.DataFrame({"v": u, "deg": c})

    deg = partial_then_global_sum(
        edges.map_batches(degree_partial, batch_format="pandas"),
        keys=["v"], sums={"deg": "deg"}).to_pandas()
    if not len(deg):
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "triangles": pd.Series(dtype="int64"),
                             "deg": pd.Series(dtype="int64"),
                             "coeff": pd.Series(dtype="float64")})
    order = deg.sort_values(["deg", "v"], kind="mergesort")
    node_by_rank = order["v"].to_numpy(np.int64)
    deg_by_rank = order["deg"].to_numpy(np.int64)
    n = len(node_by_rank)
    rank = pd.Series(np.arange(n, dtype=np.int64), index=node_by_rank)
    rank_ref = ray.put(rank)

    def orient(bt: pd.DataFrame, _ref=rank_ref) -> pd.DataFrame:
        r = ray.get(_ref) if not isinstance(_ref, pd.Series) else _ref
        ra = r.reindex(bt[a].to_numpy(np.int64)).to_numpy(np.int64)
        rb = r.reindex(bt[b].to_numpy(np.int64)).to_numpy(np.int64)
        return pd.DataFrame({"rs": np.minimum(ra, rb),
                             "rn": np.maximum(ra, rb)})

    oriented = edges.map_batches(orient, batch_format="pandas").materialize()
    m_edges = oriented.count()

    tri_by_rank = np.zeros(n, dtype=np.int64)
    if m_edges <= broadcast_below:
        def rank_keys(bt: pd.DataFrame) -> pd.DataFrame:
            key = (bt["rs"].to_numpy(np.uint64) << np.uint64(32)) \
                | bt["rn"].to_numpy(np.uint64)
            return pd.DataFrame({"key": key})

        ekeys = np.sort(oriented.map_batches(
            rank_keys, batch_format="pandas").to_pandas()["key"]
            .to_numpy(np.uint64))
        srcs = (ekeys >> np.uint64(32)).astype(np.int64)
        bounds = np.flatnonzero(np.r_[True, srcs[1:] != srcs[:-1], True])
        sizes = np.diff(bounds)
        wedge_mass = (sizes * (sizes - 1) // 2).astype(np.int64)
        total_w = int(wedge_mass.sum())
        if total_w:
            n_tasks = min(max(1, num_buckets * 2), len(sizes))
            cum = np.cumsum(wedge_mass)
            cuts = np.unique(np.searchsorted(
                cum, np.linspace(0, total_w, n_tasks + 1)[1:-1]))
            group_ranges = np.unique(
                np.concatenate(([0], cuts + 1, [len(sizes)])))
            ekeys_ref = ray.put(ekeys)
            bounds_ref = ray.put(bounds)

            @ray.remote(num_cpus=1)
            def close_range(ek, bd, glo: int, ghi: int):
                lo, hi = int(bd[glo]), int(bd[ghi])
                gsizes = np.diff(bd[glo:ghi + 1])
                i, j = grouped_all_pairs(gsizes)
                empty = (np.empty(0, np.int64), np.empty(0, np.int64))
                if not len(i):
                    return empty
                seg = ek[lo:hi]
                apex = (seg >> np.uint64(32)).astype(np.int64)
                nbr = seg & np.uint64(0xFFFFFFFF)
                wk = (nbr[i] << np.uint64(32)) | nbr[j]
                pos = np.searchsorted(ek, wk)
                pos[pos >= len(ek)] = len(ek) - 1
                closed = ek[pos] == wk
                if not closed.any():
                    return empty
                touched = np.concatenate([
                    apex[i][closed],              # apex rank of the wedge
                    nbr[i][closed].astype(np.int64),
                    nbr[j][closed].astype(np.int64)])
                ranks, counts = np.unique(touched, return_counts=True)
                return ranks, counts

            futs = [close_range.remote(ekeys_ref, bounds_ref,
                                       int(g0), int(g1))
                    for g0, g1 in zip(group_ranges[:-1], group_ranges[1:])
                    if g1 > g0]
            for ranks, counts in ray.get(futs):
                np.add.at(tri_by_rank, ranks, counts)
    else:
        def wedge_rows(bucket: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"key": pd.Series(dtype="uint64"),
                                  "apex": pd.Series(dtype="int64")})
            if not len(bucket):
                return empty
            s = bucket.sort_values(["rs", "rn"], kind="mergesort")
            srcs = s["rs"].to_numpy()
            sizes = np.diff(np.flatnonzero(
                np.r_[True, srcs[1:] != srcs[:-1], True]))
            i, j = grouped_all_pairs(sizes)
            if not len(i):
                return empty
            nb = s["rn"].to_numpy(np.uint64)
            key = (nb[i] << np.uint64(32)) | nb[j]
            return pd.DataFrame({"key": key,
                                 "apex": srcs[i].astype(np.int64)})

        wedges = grouped_map_buckets(oriented, ["rs"], wedge_rows,
                                     num_buckets=num_buckets,
                                     whole_bucket=True)

        def edge_rows(bt: pd.DataFrame) -> pd.DataFrame:
            key = (bt["rs"].to_numpy(np.uint64) << np.uint64(32)) \
                | bt["rn"].to_numpy(np.uint64)
            return pd.DataFrame({"key": key,
                                 "apex": np.full(len(bt), -1, np.int64)})

        ek = oriented.map_batches(edge_rows, batch_format="pandas")

        def close_nodes(bucket: pd.DataFrame) -> pd.DataFrame:
            have = bucket.loc[bucket["apex"] < 0, "key"].to_numpy()
            w = bucket.loc[bucket["apex"] >= 0]
            empty = pd.DataFrame({"node": pd.Series(dtype="int64"),
                                  "tri": pd.Series(dtype="int64")})
            if not len(w) or not len(have):
                return empty
            wk = w["key"].to_numpy(np.uint64)
            closed = np.isin(wk, have)
            if not closed.any():
                return empty
            keys = wk[closed]
            touched = np.concatenate([
                w["apex"].to_numpy(np.int64)[closed],
                (keys >> np.uint64(32)).astype(np.int64),
                (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)])
            ranks, counts = np.unique(touched, return_counts=True)
            return pd.DataFrame({"node": ranks, "tri": counts})

        parts = grouped_map_buckets(wedges.union(ek), ["key"], close_nodes,
                                    num_buckets=num_buckets,
                                    whole_bucket=True)
        folded = partial_then_global_sum(parts, keys=["node"],
                                         sums={"tri": "tri"}).to_pandas()
        if len(folded):
            np.add.at(tri_by_rank,
                      folded["node"].to_numpy(np.int64),
                      folded["tri"].to_numpy(np.int64))

    coeff = np.where(
        deg_by_rank < 2, 0.0,
        2.0 * tri_by_rank / (deg_by_rank.astype(np.float64)
                             * np.maximum(deg_by_rank - 1, 1)))
    out = pd.DataFrame({"node": node_by_rank, "triangles": tri_by_rank,
                        "deg": deg_by_rank, "coeff": coeff})
    return out.sort_values("node", kind="mergesort", ignore_index=True)


def components_label_map(a, b, distributed_above: int = 5_000_000,
                         num_buckets: int = 16) -> dict:
    """Edge endpoint arrays -> {node: min reachable node} — the adaptive
    component-labeling step behind q_dedup_phash_clusters and q_dbscan.
    Below ``distributed_above`` edges the driver union-find (min-root,
    path-compressed) wins on task overhead; above it the pointer-doubling
    dataset ``connected_components`` takes over so the edge list never
    has to fit one process.  Both plans produce the identical min-label
    map (pytest forces the distributed plan and asserts equality).  The
    returned dict is O(nodes) — the broadcast contract both callers
    already carry for their assign step."""
    import ray.data as rd

    from .ccl import _find, _union_min

    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    if len(a) <= distributed_above:
        parent: dict = {}
        for x, y in zip(a.tolist(), b.tolist()):
            parent.setdefault(x, x)
            parent.setdefault(y, y)
            _union_min(parent, x, y)
        return {x: _find(parent, x) for x in parent}
    edges = rd.from_pandas(pd.DataFrame({"a": a, "b": b})) \
        .repartition(num_buckets)
    cc = connected_components(edges, num_buckets=num_buckets).to_pandas()
    return {int(v): int(c) for v, c in zip(cc["vertex"], cc["component"])}


def components_label_map_ds(edges: rd.Dataset, src: str = "a",
                            dst: str = "b",
                            distributed_above: int = 5_000_000,
                            num_buckets: int = 16) -> dict:
    """Dataset-native form of ``components_label_map``: the plan choice
    happens BEFORE any driver materialization — edge count comes from
    block metadata, and only the below-threshold branch ever pulls the
    edge list into one process.  Above it, the pointer-doubling CC runs
    on the Dataset directly and just the O(nodes) label map returns."""
    edges = edges.materialize()
    m = edges.count()
    if m <= distributed_above:
        ep = edges.to_pandas()
        return components_label_map(ep[src].to_numpy(np.int64),
                                    ep[dst].to_numpy(np.int64),
                                    distributed_above=m)
    cc = connected_components(edges, src=src, dst=dst,
                              num_buckets=num_buckets).to_pandas()
    return {int(v): int(c) for v, c in zip(cc["vertex"], cc["component"])}


def connected_components_adaptive(edges: rd.Dataset, src: str = "a",
                                  dst: str = "b",
                                  distributed_above: int = 5_000_000,
                                  num_buckets: int = 16) -> rd.Dataset:
    """Dataset->Dataset adaptive connected components: the plan twin of
    ``components_label_map_ds`` for callers that keep the labels IN the
    pipeline (no driver dict).  Edge count comes from block metadata
    after one materialize; below ``distributed_above`` the min-root
    union-find runs in one process and the O(nodes) label table
    re-enters the object store as a single block — at bench scale this
    replaces the pointer-doubling rounds' multiple shuffles with one
    task.  Above the threshold the label table never touches the
    driver: the pointer-doubling ``connected_components`` runs
    unchanged.  Output schema identical either way
    ((vertex, component), component = min reachable vertex); the
    plan-invariance pytest forces both plans on the same edges and
    asserts equality."""
    edges = edges.materialize()
    m = edges.count()
    if m > distributed_above:
        return connected_components(edges, src=src, dst=dst,
                                    num_buckets=num_buckets)
    ep = edges.to_pandas()
    lm = components_label_map(ep[src].to_numpy(np.int64),
                              ep[dst].to_numpy(np.int64),
                              distributed_above=1 << 62)
    df = pd.DataFrame(
        {"vertex": np.fromiter(lm.keys(), np.int64, len(lm)),
         "component": np.fromiter(lm.values(), np.int64, len(lm))}) \
        if lm else pd.DataFrame({"vertex": pd.Series(dtype="int64"),
                                 "component": pd.Series(dtype="int64")})
    return rd.from_pandas(df)


def kcore_decompose(edges: rd.Dataset, k: int, max_rounds: int = 8,
                    src: str = "a", dst: str = "b") -> pd.DataFrame:
    """k-core peeling as raw-task WAVES over pinned blocks — no Dataset
    execution per round.  The Dataset-pipeline form paid two streaming-
    executor floors (~0.4-1 s each) per peeling round: one for the
    degree reduce, one for the prune + materialize; at 8 rounds that
    floor dominated the actual kernel work (q_kcore measured 6.3 s in
    suite context).  Here the symmetrized per-block edge arrays are
    extracted once by a prep wave and STAY in the (spillable) object
    store; each round is one wave of tasks that prune against the
    broadcast keep-set and return (pruned-edges ref, bounded degree
    partial) via num_returns=2 — the driver folds only O(nodes)
    partials and never touches an edge.

    Semantics are pinned to the unrolled-CTE oracle (Q_KCORE_SQL):
    round i drops nodes whose degree in e_{i-1} is < k, the loop
    early-stops at the fixpoint (further rounds are no-ops), and the
    result is the degree table of the final edge set — nodes with zero
    remaining edges vanish, exactly as SQL's GROUP BY does.  Returns a
    bounded (node, deg_in_core) pandas table."""
    import ray

    from ..runtime import materialized_block_refs

    edges = edges.materialize()

    @ray.remote(num_returns=2)
    def _prep(block):
        b = block.to_pandas() if not isinstance(block, pd.DataFrame) \
            else block
        if not len(b):
            z = np.zeros(0, dtype=np.int64)
            return (z, z), (z, z)
        a = b[src].to_numpy(dtype=np.int64)
        c = b[dst].to_numpy(dtype=np.int64)
        u, v = np.r_[a, c], np.r_[c, a]
        nodes, cnt = np.unique(u, return_counts=True)
        return (u, v), (nodes, cnt.astype(np.int64))

    @ray.remote(num_returns=2)
    def _round(ed, keep):
        u, v = ed
        iu = np.searchsorted(keep, u)
        iv = np.searchsorted(keep, v)
        m = (iu < len(keep)) & (iv < len(keep))
        m[m] &= (keep[iu[m]] == u[m]) & (keep[iv[m]] == v[m])
        u2, v2 = u[m], v[m]
        nodes, cnt = np.unique(u2, return_counts=True)
        return (u2, v2), (nodes, cnt.astype(np.int64))

    def fold(parts):
        parts = [p for p in parts if len(p[0])]
        if not parts:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        nodes = np.concatenate([p[0] for p in parts])
        cnts = np.concatenate([p[1] for p in parts])
        uniq, inv = np.unique(nodes, return_inverse=True)
        deg = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(deg, inv, cnts)
        return uniq, deg

    edge_refs, part_refs = [], []
    for r in materialized_block_refs(edges):
        e_ref, p_ref = _prep.remote(r)
        edge_refs.append(e_ref)
        part_refs.append(p_ref)
    uniq, deg = fold(ray.get(part_refs))

    for _ in range(max_rounds):
        keep = uniq[deg >= k]
        if len(keep) == len(uniq):
            break
        kref = ray.put(keep)
        nxt_edges, part_refs = [], []
        for er in edge_refs:
            e2, p2 = _round.remote(er, kref)
            nxt_edges.append(e2)
            part_refs.append(p2)
        edge_refs = nxt_edges
        uniq, deg = fold(ray.get(part_refs))

    return pd.DataFrame({"node": uniq, "deg_in_core": deg})
