"""CI pins for the scale-experiment claims (scripts/*_scale_experiment.py).

The experiments run at 200k-1M rows; these tests rerun the identical
planted-duplicate constructions at 5k rows through the PRODUCTION
pipelines and assert the same invariants the experiments report:
planted-pair recall 1.0 and zero false pairs.  The generators are
defined as closures (cloudpickle by-value) so Ray workers need no
import path to this module.
"""

import numpy as np
import pandas as pd

PLANT_MOD, PLANT_AT = 10, 8


def _make_mix():
    """splitmix64, constructed per-closure so the synth functions carry no
    module-global reference (this test module is not importable on Ray
    workers; closures ship by value)."""
    def mix(x: np.ndarray) -> np.ndarray:
        x = (x + np.uint64(0x9E3779B97F4A7C15)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = x
        z ^= z >> np.uint64(30)
        z = (z * np.uint64(0xBF58476D1CE4E5B9)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        z ^= z >> np.uint64(27)
        z = (z * np.uint64(0x94D049BB133111EB)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        return z ^ (z >> np.uint64(31))
    return mix


def test_minhash_planted_recall_production_path(ray_session):
    """5k-doc version of scripts/text_scale_experiment.py: every planted
    near-dup pair (one token substituted out of 60) is found; the random
    token soup yields zero false pairs."""
    import ray.data as rd

    from cqi_ray.queries import minhash_near_dup_pairs

    n, vocab, tok = 5000, 50_000, 60
    mix = _make_mix()

    def synth(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy(dtype=np.uint64)
        is_dup = (ids % PLANT_MOD) == (PLANT_AT + 1)
        base = np.where(is_dup, ids - 1, ids)
        pos = np.arange(tok, dtype=np.uint64)[None, :]
        grid = mix(base[:, None] * np.uint64(tok + 1) + pos) % vocab
        if is_dup.any():
            grid[is_dup, 7] = (grid[is_dup, 7] + 1) % vocab
        texts = ["t" + " t".join(map(str, row)) for row in grid]
        return pd.DataFrame({"doc_id": ids.astype(np.int64), "text": texts})

    docs = rd.range(n, override_num_blocks=8) \
        .map_batches(synth, batch_format="pandas")
    pairs = minhash_near_dup_pairs(docs).to_pandas()

    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    hit = ((a % PLANT_MOD) == PLANT_AT) & (b == a + 1)
    assert int(hit.sum()) == n // PLANT_MOD, "planted recall must be 1.0"
    assert int((~hit).sum()) == 0, "token soup must yield no false pairs"


def test_embedding_lsh_planted_recall_production_path(ray_session):
    """5k-vector version of scripts/embedding_scale_experiment.py: every
    planted near-dup (cosine ~0.995) survives the sign-sketch hamming
    prune and the exact verify; no false pairs."""
    import ray.data as rd

    from cqi_ray.ops.dedup import embedding_lsh_pairs

    n, dim = 5000, 64
    mix = _make_mix()

    def synth(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy(dtype=np.uint64)
        is_dup = (ids % PLANT_MOD) == (PLANT_AT + 1)
        base = np.where(is_dup, ids - 1, ids)
        pos = np.arange(dim, dtype=np.uint64)[None, :]
        grid = mix(base[:, None] * np.uint64(dim + 1) + pos)
        vec = (grid.astype(np.float64) / 2.0**63) - 1.0
        vec[is_dup, 0] += 0.1
        vec /= np.linalg.norm(vec, axis=1, keepdims=True)
        return pd.DataFrame({"vec_id": ids.astype(np.int64),
                             "embedding": list(vec.astype(np.float32))})

    vecs = rd.range(n, override_num_blocks=8) \
        .map_batches(synth, batch_format="pandas")
    pairs = embedding_lsh_pairs(vecs, threshold=0.99).to_pandas()

    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    hit = ((a % PLANT_MOD) == PLANT_AT) & (b == a + 1)
    assert int(hit.sum()) == n // PLANT_MOD, "planted recall must be 1.0"
    assert int((~hit).sum()) == 0, "uniform vectors must yield no false pairs"


def test_minhash_star_cap_cluster_equivalence(ray_session):
    """Boilerplate-pile guard (scripts/hot_bucket_experiment.py at CI
    scale): with star_cap below the pile size, oversized LSH runs emit
    min-id stars instead of all pairs — far fewer pairs, identical
    connected components (the consumer of pile dedup)."""
    import ray.data as rd

    from cqi_ray.queries import minhash_near_dup_pairs

    n_base, n_pile, tok, vocab = 2000, 200, 60, 50_000
    mix = _make_mix()

    def synth(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy(dtype=np.uint64)
        in_pile = ids >= n_base
        base = np.where(in_pile, np.uint64(n_base), ids)
        pos = np.arange(tok, dtype=np.uint64)[None, :]
        grid = mix(base[:, None] * np.uint64(tok + 1) + pos) % vocab
        member = (ids - np.uint64(n_base)) % np.uint64(tok)
        rows = np.nonzero(in_pile)[0]
        grid[rows, member[rows].astype(np.int64)] = \
            (mix(ids[rows]) % vocab).astype(grid.dtype)
        texts = ["t" + " t".join(map(str, row)) for row in grid]
        return pd.DataFrame({"doc_id": ids.astype(np.int64), "text": texts})

    corpus = rd.range(n_base + n_pile, override_num_blocks=8) \
        .map_batches(synth, batch_format="pandas")

    def comps(pairs: pd.DataFrame):
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pairs["a"], pairs["b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        groups: dict = {}
        for x in parent:
            groups.setdefault(find(x), set()).add(x)
        return sorted(map(frozenset, groups.values()), key=min)

    exact = minhash_near_dup_pairs(corpus).to_pandas()
    starred = minhash_near_dup_pairs(corpus, star_cap=100).to_pandas()
    assert len(starred) < len(exact)
    assert comps(exact) == comps(starred)


def test_graph_family_analytic_exactness(ray_session):
    """1.3k-edge version of scripts/graph_scale_experiment.py: disjoint
    cliques + chains + stars with closed-form truth pushed through the
    PRODUCTION graph ops — both triangle plans, the wave-based
    connected_components at real pointer-doubling depth (chain length
    40 ~ 6 rounds), per-node clustering coefficients by structure
    class, and k-core survival of exactly the clique nodes."""
    import ray.data as rd

    from cqi_ray.ops.graph import (clustering_coefficients,
                                   connected_components, kcore_decompose,
                                   triangle_count)

    s, n_clq, l_chn, n_chn, f, n_str = 12, 3, 40, 2, 9, 2
    rows = []
    for k in range(n_clq):
        base = k * s
        rows += [(base + i, base + j)
                 for i in range(s) for j in range(i + 1, s)]
    chn0 = n_clq * s
    for k in range(n_chn):
        base = chn0 + k * l_chn
        rows += [(base + p, base + p + 1) for p in range(l_chn - 1)]
    str0 = chn0 + n_chn * l_chn
    for k in range(n_str):
        hub = str0 + k * (f + 1)
        rows += [(hub, hub + 1 + j) for j in range(f)]
    edges = rd.from_pandas(pd.DataFrame(rows, columns=["a", "b"])) \
        .repartition(6)

    tri_truth = n_clq * s * (s - 1) * (s - 2) // 6
    assert triangle_count(edges) == tri_truth                    # broadcast
    assert triangle_count(edges, broadcast_below=0) == tri_truth  # bucketed

    lab = connected_components(edges, num_buckets=4).to_pandas()
    sizes = lab.groupby("component").size()
    assert len(sizes) == n_clq + n_chn + n_str
    assert sorted(sizes.tolist()) == sorted(
        [s] * n_clq + [l_chn] * n_chn + [f + 1] * n_str)
    # component label = min vertex id of its structure
    assert set(sizes.index) == (
        {k * s for k in range(n_clq)}
        | {chn0 + k * l_chn for k in range(n_chn)}
        | {str0 + k * (f + 1) for k in range(n_str)})

    cdf = clustering_coefficients(edges)
    clq = cdf["node"] < chn0
    assert (cdf.loc[clq, "coeff"] == 1.0).all()
    assert (cdf.loc[clq, "triangles"] == (s - 1) * (s - 2) // 2).all()
    assert (cdf.loc[~clq, "triangles"] == 0).all()
    assert int(cdf["triangles"].sum()) == 3 * tri_truth

    core = kcore_decompose(edges, k=s - 1)
    assert len(core) == n_clq * s
    assert (core["deg_in_core"] == s - 1).all()
    assert (core["node"].to_numpy() < chn0).all()


def test_relational_family_closed_form_exactness(ray_session):
    """40k-row version of scripts/relational_scale_experiment.py: the
    fact⨝dim workload with closed-form integer truth pushed through the
    PRODUCTION relational ops — groupby partial sums, BOTH hash-join
    plans, distinct, anti-join, exact dedup, global row numbers over a
    permutation column, and exact discrete quantiles."""
    import ray.data as rd

    from cqi_ray.relational import (bucketed_anti_join, bucketed_hash_join,
                                    distinct_rows, exact_dedup,
                                    global_exact_quantiles,
                                    global_row_number,
                                    partial_then_global_sum)

    n, g, perm = 40_000, 200, 982_451_653
    cnt = n // g
    i = np.arange(n, dtype=np.int64)
    fact_df = pd.DataFrame({"id": i, "k": i % g, "v": i,
                            "p": (i * perm) % n})
    assert len(np.unique(fact_df["p"])) == n  # permutation sanity
    dim_df = pd.DataFrame({"k": np.arange(g, dtype=np.int64),
                           "w": 3 * np.arange(g, dtype=np.int64) + 1})
    fact = rd.from_pandas(fact_df).repartition(8).materialize()
    dim = rd.from_pandas(dim_df).repartition(2).materialize()

    agg = partial_then_global_sum(fact, ["k"], {"v": "sum_v"},
                                  counts="cnt", num_buckets=8).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    gg = np.arange(g, dtype=np.int64)
    assert (agg["sum_v"].to_numpy() == cnt * gg
            + g * (cnt * (cnt - 1) // 2)).all()
    assert (agg["cnt"] == cnt).all()

    truth_w = cnt * int(3 * (g - 1) * g // 2 + g)
    for plan in ("dataset", "tasks"):
        j = bucketed_hash_join(fact, dim, on="k", right_cols=["k", "w"],
                               num_buckets=8, plan=plan,
                               restore_dtypes={"w": "int64"}).to_pandas()
        assert len(j) == n and int(j["w"].sum()) == truth_w

    d = distinct_rows(fact, ["k"], num_buckets=8).to_pandas()
    assert len(d) == g and int(d["k"].sum()) == g * (g - 1) // 2

    half = rd.from_pandas(dim_df.head(g // 2)).repartition(2)
    aj = bucketed_anti_join(fact, half, on="k", num_buckets=8).to_pandas()
    hi = np.arange(g // 2, g, dtype=np.int64)
    assert len(aj) == n // 2
    assert int(aj["v"].sum()) == int(cnt * hi.sum()
                                     + (g // 2) * g * (cnt * (cnt - 1) // 2))

    dd = exact_dedup(fact, key="k", order_col="v").to_pandas()
    assert len(dd) == g and (dd["v"].to_numpy() == dd["k"].to_numpy()).all()

    ranked, total = global_row_number(fact, value_col="p", id_col="id",
                                      parts=8)
    rdf = ranked.to_pandas()
    assert total == n and len(rdf) == n
    assert (rdf["rn"].to_numpy() == rdf["p"].to_numpy() + 1).all()

    qs = [0.01, 0.25, 0.5, 0.99]
    qdf = global_exact_quantiles(fact, "p", qs)
    got = {float(r["q"]): int(r["val"]) for _, r in qdf.iterrows()}
    assert got == {q: int(np.ceil(q * n)) - 1 for q in qs}


def test_image_hash_family_closed_form_exactness(ray_session):
    """6.4k-row pin of scripts/image_scale_experiment.py: exact-dup piles
    of 16 with planted near-dup pile pairs (1-7 flipped bits) pushed
    through the PRODUCTION phash ops — pair counts and per-row cluster
    labels verified against an algorithm-independent O(K^2) brute force
    plus python union-find."""
    import ray.data as rd

    import scripts.image_scale_experiment as ix
    from cqi_ray.queries import phash_cluster_labels, phash_pairs_ds

    m, k = ix.M, 400
    n = m * k
    g = np.arange(k, dtype=np.uint64)
    bases = ix.base_hashes(g)

    # independent truth: brute-force base matrix + union-find
    d = ix.popcount64(bases[:, None] ^ bases[None, :])
    ii, jj = np.nonzero(d <= ix.H)
    keep = ii < jj
    edges = np.stack([ii[keep], jj[keep]], axis=1).astype(np.int64)
    planted = {(int(x - 1), int(x)) for x in range(1, k)
               if x % ix.PLANT_MOD == 1}
    assert planted <= set(map(tuple, edges.tolist()))

    ids = np.arange(n, dtype=np.int64)
    hashed = rd.from_pandas(pd.DataFrame({
        "doc_id": ids,
        "phash": bases[(ids // m)].astype(np.int64)})).repartition(6)

    pairs = phash_pairs_ds(hashed, max_hamming=ix.H,
                           num_buckets=16, distinct_buckets=8).to_pandas()
    want_pairs = k * (m * (m - 1) // 2) + len(edges) * m * m
    assert len(pairs) == want_pairs
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    cross = (a // m) != (b // m)
    got_edges = set(zip((a[cross] // m).tolist(), (b[cross] // m).tolist()))
    assert got_edges == set(map(tuple, edges.tolist()))

    # cluster labels == union-find truth for every row
    parent = np.arange(k, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ea, eb in edges.tolist():
        ra, rb = find(ea), find(eb)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    comp_min = np.array([find(x) for x in range(k)], dtype=np.int64)

    lbl = phash_cluster_labels(hashed, max_hamming=ix.H).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert len(lbl) == n
    expect = comp_min[lbl["doc_id"].to_numpy() // m] * m
    assert (lbl["cluster_rep"].to_numpy() == expect).all()
