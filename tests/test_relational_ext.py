"""Unit tests for the round-2 relational extensions: distributed set
ops (bucketed_set_op) and exact histogram-refinement quantiles
(global_exact_quantiles) — each checked against a local numpy/pandas
reference on deterministic synthetic frames."""

import os
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from cqi_ray.relational import bucketed_set_op, global_exact_quantiles


def _ds(df: pd.DataFrame, blocks: int = 4) -> rd.Dataset:
    return rd.from_pandas(df).repartition(blocks)


@pytest.fixture(scope="module")
def keyed(ray_session):
    rng = np.random.RandomState(7)
    left = pd.DataFrame({"k": rng.randint(0, 200, 1000)})
    right = pd.DataFrame({"k": rng.randint(100, 300, 1000)})
    return left, right


class TestBucketedSetOp:
    def test_intersect_matches_numpy(self, keyed):
        left, right = keyed
        got = np.sort(bucketed_set_op(_ds(left), _ds(right), "k",
                                      "intersect").to_pandas()["k"].to_numpy())
        want = np.intersect1d(left["k"].unique(), right["k"].unique())
        assert np.array_equal(got, np.sort(want))

    def test_except_matches_numpy(self, keyed):
        left, right = keyed
        got = np.sort(bucketed_set_op(_ds(left), _ds(right), "k",
                                      "except").to_pandas()["k"].to_numpy())
        want = np.setdiff1d(left["k"].unique(), right["k"].unique())
        assert np.array_equal(got, np.sort(want))

    def test_string_keys(self, ray_session):
        left = pd.DataFrame({"k": ["a", "b", "c", "c", "d"]})
        right = pd.DataFrame({"k": ["c", "d", "e"]})
        inter = sorted(bucketed_set_op(_ds(left, 2), _ds(right, 2), "k",
                                       "intersect").to_pandas()["k"])
        assert inter == ["c", "d"]

    def test_bad_op_raises(self, ray_session):
        with pytest.raises(ValueError):
            bucketed_set_op(_ds(pd.DataFrame({"k": [1]})),
                            _ds(pd.DataFrame({"k": [1]})), "k", "union")


class TestGlobalExactQuantiles:
    def _reference(self, vals: np.ndarray, q: float) -> float:
        # DuckDB quantile_disc convention: rank = clamp(ceil(q*n), 1, n)
        s = np.sort(vals)
        r = min(max(int(np.ceil(q * len(s))), 1), len(s))
        return float(s[r - 1])

    def test_matches_disc_convention(self, ray_session):
        rng = np.random.RandomState(11)
        vals = rng.lognormal(4.0, 1.0, 20000)
        df = pd.DataFrame({"x": vals})
        qs = [0.01, 0.25, 0.5, 0.9, 0.999]
        out = global_exact_quantiles(_ds(df, 8), "x", qs, num_bins=512)
        assert list(out["q"]) == sorted(qs)
        for q, v in zip(out["q"], out["val"]):
            assert v == self._reference(vals, q)

    def test_tiny_and_constant_inputs(self, ray_session):
        out = global_exact_quantiles(
            _ds(pd.DataFrame({"x": [5.0, 5.0, 5.0]}), 2), "x", [0.5, 1.0],
            num_bins=16)
        assert list(out["val"]) == [5.0, 5.0]

    def test_empty_input(self, ray_session):
        out = global_exact_quantiles(
            _ds(pd.DataFrame({"x": pd.Series(dtype="float64")}), 1),
            "x", [0.5], num_bins=8)
        assert np.isnan(out["val"]).all()


class TestConnectedComponents:
    def _reference(self, edges: pd.DataFrame) -> dict:
        parent = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in zip(edges["a"], edges["b"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
        members = {}
        for v in set(edges["a"]) | set(edges["b"]):
            members.setdefault(find(v), []).append(v)
        return {v: min(mem) for mem in members.values() for v in mem}

    def test_random_graph_matches_union_find(self, ray_session):
        from cqi_ray.ops.graph import connected_components

        rng = np.random.RandomState(23)
        edges = pd.DataFrame({"a": rng.randint(0, 500, 300),
                              "b": rng.randint(0, 500, 300)})
        edges = edges[edges["a"] != edges["b"]]
        got = connected_components(
            rd.from_pandas(edges).repartition(4)).to_pandas()
        want = self._reference(edges)
        gotmap = dict(zip(got["vertex"], got["component"]))
        assert gotmap == want

    def test_long_chains_converge_logarithmically(self, ray_session):
        from cqi_ray.ops.graph import connected_components

        rows = [(base + i, base + i + 1)
                for base in (0, 1000) for i in range(60)]
        edges = pd.DataFrame(rows, columns=["a", "b"])
        # pointer doubling: diameter-60 chains must converge well inside
        # 12 iterations (plain propagation would need 60)
        got = connected_components(rd.from_pandas(edges).repartition(3),
                                   max_iters=12).to_pandas()
        m = dict(zip(got["vertex"], got["component"]))
        assert all(m[base + i] == base for base in (0, 1000)
                   for i in range(61))

    def test_cc_clusters_query_equals_union_find_query(self, ray_session):
        from cqi_ray.queries import q_dedup_phash_cc, q_dedup_phash_clusters

        sf = "/root/testdata/sf0.001"
        a = q_dedup_phash_cc(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = q_dedup_phash_clusters(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


class TestPageRankPlans:
    def test_broadcast_and_shuffled_plans_agree(self, ray_session):
        """The broadcast-ranks fast path and the fully-shuffled scale
        path must produce identical ranks."""
        from cqi_ray.queries import q_pagerank

        sf = "/root/testdata/sf0.001"
        fast = q_pagerank(sf)  # broadcast path (160 nodes)
        slow = q_pagerank(sf, broadcast_below=0)  # force shuffled path
        import ray.data as rd
        if isinstance(slow, rd.Dataset):
            slow = slow.to_pandas()
        if isinstance(fast, rd.Dataset):
            fast = fast.to_pandas()
        a = fast.sort_values("node").reset_index(drop=True)
        b = slow.sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestSaltedHashJoin:
    """salted_hash_join must equal a plain pandas merge — salt choice
    affects placement only, never the output — including on skewed keys
    and one-to-many right sides."""

    def _check(self, left, right, how="inner", salts=8):
        from cqi_ray.relational import salted_hash_join

        got = salted_hash_join(_ds(left), _ds(right, blocks=2), on="k",
                               right_cols=list(right.columns),
                               num_buckets=8, salts=salts, how=how) \
            .to_pandas()
        want = left.merge(right, on="k", how=how)
        key = sorted(got.columns)
        got = got[key].sort_values(key, kind="mergesort").reset_index(drop=True)
        want = want[key].sort_values(key, kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"k": "int64"}), want.astype({"k": "int64"}),
            check_dtype=False)

    def test_skewed_inner(self, ray_session):
        rng = np.random.RandomState(3)
        # 90% of left rows share key 7 — the straggler-bucket case
        k = np.where(rng.rand(2000) < 0.9, 7, rng.randint(0, 50, 2000))
        left = pd.DataFrame({"k": k, "v": np.arange(2000)})
        right = pd.DataFrame({"k": np.arange(50), "dim": [f"d{i}" for i in range(50)]})
        self._check(left, right)

    def test_one_to_many_right(self, ray_session):
        left = pd.DataFrame({"k": [1, 1, 2, 3, 7, 7, 7], "v": range(7)})
        right = pd.DataFrame({"k": [1, 1, 2, 2, 7],
                              "dim": ["a", "b", "c", "d", "e"]})
        self._check(left, right, salts=4)

    def test_left_outer(self, ray_session):
        left = pd.DataFrame({"k": [1, 2, 99], "v": [10, 20, 30]})
        right = pd.DataFrame({"k": [1, 2], "dim": ["a", "b"]})
        self._check(left, right, how="left", salts=3)

    def test_salts_invariance(self, ray_session):
        """Output must be identical for any salts setting (placement
        only): salts=1 degenerates to the plain bucketed join."""
        rng = np.random.RandomState(5)
        left = pd.DataFrame({"k": rng.randint(0, 30, 500), "v": range(500)})
        right = pd.DataFrame({"k": np.arange(30), "dim": np.arange(30) * 10})
        from cqi_ray.relational import salted_hash_join

        outs = []
        for salts in (1, 4, 16):
            got = salted_hash_join(_ds(left), _ds(right, blocks=2), on="k",
                                   right_cols=["k", "dim"], num_buckets=8,
                                   salts=salts).to_pandas()
            key = sorted(got.columns)
            outs.append(got[key].sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1], check_dtype=False)
        pd.testing.assert_frame_equal(outs[0], outs[2], check_dtype=False)

    def test_string_keys(self, ray_session):
        left = pd.DataFrame({"k": ["x", "y", "x", "z"] * 5,
                             "v": range(20)})
        right = pd.DataFrame({"k": ["x", "y", "w"],
                              "dim": ["a", "b", "c"]})
        from cqi_ray.relational import salted_hash_join

        got = salted_hash_join(_ds(left), _ds(right, blocks=2), on="k",
                               right_cols=["k", "dim"], num_buckets=4,
                               salts=3).to_pandas()
        want = left.merge(right, on="k", how="inner")
        key = sorted(got.columns)
        got = got[key].sort_values(key).reset_index(drop=True)
        want = want[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestTriangleCount:
    """triangle_count must equal the brute-force count on random simple
    graphs, and grouped_all_pairs must enumerate exactly the within-
    group index pairs."""

    def test_grouped_all_pairs_random_sizes(self):
        from cqi_ray.ops.graph import grouped_all_pairs

        rng = np.random.RandomState(11)
        sizes = rng.randint(0, 7, 40)
        i, j = grouped_all_pairs(sizes)
        want, off = [], 0
        for c in sizes:
            for x in range(c):
                for y in range(x + 1, c):
                    want.append((off + x, off + y))
            off += c
        assert list(zip(i.tolist(), j.tolist())) == want

    def test_random_graph_matches_brute_force(self, ray_session):
        from cqi_ray.ops.graph import triangle_count

        rng = np.random.RandomState(7)
        a = rng.randint(0, 60, 400)
        b = rng.randint(0, 60, 400)
        m = a != b
        lo, hi = np.minimum(a[m], b[m]), np.maximum(a[m], b[m])
        edges = pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()
        adj = np.zeros((60, 60), dtype=bool)
        adj[edges["a"], edges["b"]] = True
        adj |= adj.T
        ai = adj.astype(np.int64)
        want = int(np.einsum("ij,jk,ki->", ai, ai, ai)) // 6
        # both plans must agree: broadcast edge-key close and the
        # bucketed wedge⋈edge semi-join (broadcast_below=0 forces it)
        got = triangle_count(_ds(edges, blocks=3), num_buckets=8)
        assert got == want
        got_shuffle = triangle_count(_ds(edges, blocks=3), num_buckets=8,
                                     broadcast_below=0)
        assert got_shuffle == want

    def test_star_graph_has_no_triangles(self, ray_session):
        from cqi_ray.ops.graph import triangle_count

        edges = pd.DataFrame({"a": np.zeros(30, dtype=np.int64),
                              "b": np.arange(1, 31, dtype=np.int64)})
        assert triangle_count(_ds(edges, blocks=2), num_buckets=4) == 0


class TestAdaptiveJoin:
    def _sides(self):
        rng = np.random.RandomState(11)
        left = pd.DataFrame({"k": rng.randint(0, 50, 2000),
                             "v": rng.randint(0, 1000, 2000)})
        right = pd.DataFrame({"k": np.arange(50),
                              "seg": [f"s{i % 5}" for i in range(50)]})
        return left, right

    def _run(self, threshold):
        from cqi_ray.relational import adaptive_join
        left, right = self._sides()
        out = adaptive_join(_ds(left), _ds(right, 2), on="k",
                            right_cols=["k", "seg"],
                            broadcast_threshold_bytes=threshold,
                            how="inner",
                            restore_dtypes={"v": "int64"}).to_pandas()
        plan = adaptive_join.last_plan
        want = left.merge(right, on="k", how="inner")
        return out, plan, want

    def test_broadcast_plan_under_threshold(self, ray_session):
        out, plan, want = self._run(64 << 20)
        assert plan == "broadcast"
        cols = ["k", "v", "seg"]
        got = out[cols].sort_values(cols).reset_index(drop=True)
        exp = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)

    def test_bucketed_plan_over_threshold(self, ray_session):
        out, plan, want = self._run(0)
        assert plan == "bucketed"
        cols = ["k", "v", "seg"]
        got = out[cols].sort_values(cols).reset_index(drop=True)
        exp = want[cols].sort_values(cols).reset_index(drop=True)
        got["v"] = got["v"].astype("int64")
        pd.testing.assert_frame_equal(got, exp)


class TestClusteringCoefficients:
    def _graph(self):
        rng = np.random.RandomState(13)
        a = rng.randint(0, 50, 300)
        b = rng.randint(0, 50, 300)
        m = a != b
        lo, hi = np.minimum(a[m], b[m]), np.maximum(a[m], b[m])
        return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()

    def _brute(self, edges: pd.DataFrame) -> pd.DataFrame:
        n = 50
        adj = np.zeros((n, n), dtype=bool)
        adj[edges["a"], edges["b"]] = True
        adj |= adj.T
        ai = adj.astype(np.int64)
        tri = np.einsum("ij,jk,ki->i", ai, ai, ai) // 2
        deg = ai.sum(1)
        nodes = np.flatnonzero(deg > 0)
        d = deg[nodes].astype(np.float64)
        coeff = np.where(deg[nodes] < 2, 0.0,
                         2.0 * tri[nodes] / (d * np.maximum(d - 1, 1)))
        return pd.DataFrame({"node": nodes, "triangles": tri[nodes],
                             "deg": deg[nodes], "coeff": coeff})

    def test_both_plans_match_brute_force(self, ray_session):
        from cqi_ray.ops.graph import clustering_coefficients

        edges = self._graph()
        want = self._brute(edges)
        for forced in (20_000_000, 0):  # broadcast plan, then bucketed
            got = clustering_coefficients(_ds(edges, blocks=3),
                                          num_buckets=8,
                                          broadcast_below=forced)
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True).astype(
                    {"node": "int64", "triangles": "int64", "deg": "int64"}),
                want.astype({"node": "int64", "triangles": "int64",
                             "deg": "int64"}),
                check_exact=False, rtol=1e-12)

    def test_star_graph_all_zero(self, ray_session):
        from cqi_ray.ops.graph import clustering_coefficients

        edges = pd.DataFrame({"a": np.zeros(20, dtype=np.int64),
                              "b": np.arange(1, 21, dtype=np.int64)})
        got = clustering_coefficients(_ds(edges, blocks=2), num_buckets=4)
        assert (got["triangles"] == 0).all()
        assert (got["coeff"] == 0.0).all()


class TestAdaptiveComponentLabeling:
    """components_label_map: driver union-find vs the forced distributed
    pointer-doubling CC must produce the identical min-label map — and
    the two catalog consumers (phash clusters, dbscan) must be
    plan-invariant end to end."""

    def test_label_map_plans_agree(self, ray_session):
        from cqi_ray.ops.graph import components_label_map

        rng = np.random.RandomState(3)
        a = rng.randint(0, 400, 900).astype(np.int64)
        b = rng.randint(0, 400, 900).astype(np.int64)
        m = a != b
        fast = components_label_map(a[m], b[m])                # driver UF
        slow = components_label_map(a[m], b[m],
                                    distributed_above=0)      # forced CC
        assert fast == slow

    def test_phash_clusters_plan_invariant(self, ray_session):
        from cqi_ray.queries import q_dedup_phash_clusters

        sf = "/root/testdata/sf0.001"
        fast = q_dedup_phash_clusters(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        slow = q_dedup_phash_clusters(sf, cc_distributed_above=0) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(fast, slow)

    def test_dbscan_plan_invariant(self, ray_session):
        from cqi_ray.queries import q_dbscan

        sf = "/root/testdata/sf0.001"
        fast = q_dbscan(sf).to_pandas() \
            .sort_values("point_id").reset_index(drop=True)
        slow = q_dbscan(sf, cc_distributed_above=0).to_pandas() \
            .sort_values("point_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(fast, slow)


class TestAdaptiveCCDataset:
    """connected_components_adaptive: the Dataset->Dataset plan twin —
    driver union-find and pointer doubling must label identically."""

    def test_plans_equal(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from cqi_ray.ops.graph import connected_components_adaptive

        rng = np.random.default_rng(4)
        a = rng.integers(0, 300, 500)
        b = rng.integers(0, 300, 500)
        edges = rd.from_pandas(pd.DataFrame({"a": a, "b": b}))
        uf = connected_components_adaptive(edges).to_pandas() \
            .sort_values("vertex").reset_index(drop=True)
        dist = connected_components_adaptive(
            edges, distributed_above=0).to_pandas() \
            .sort_values("vertex").reset_index(drop=True)
        assert uf.equals(dist)
        g = uf.groupby("component")["vertex"].min()
        # component label IS the min vertex of its component
        assert (g.index.to_numpy() == g.to_numpy()).all()


class TestTaskJoinPlans:
    """bucketed_hash_join's three plans (dataset / tasks / adaptive) must
    produce identical relations — the q_join_adaptive both-plans-equal
    pattern applied to the raw-task shuffle added in round 3."""

    def _all_plans(self, left, right, on="k", right_cols=("k", "dim"),
                   how="inner", restore=None, lblocks=4, rblocks=2):
        from cqi_ray.relational import bucketed_hash_join

        outs = {}
        for plan in ("dataset", "tasks", "adaptive"):
            got = bucketed_hash_join(
                _ds(left, blocks=lblocks), _ds(right, blocks=rblocks),
                on=on, right_cols=list(right_cols), num_buckets=4,
                how=how, restore_dtypes=restore, plan=plan).to_pandas()
            key = sorted(got.columns)
            outs[plan] = got[key].sort_values(key, kind="mergesort") \
                .reset_index(drop=True)
        return outs

    def _assert_equal(self, outs, want):
        key = sorted(want.columns)
        want = want[key].sort_values(key, kind="mergesort") \
            .reset_index(drop=True)
        for plan, got in outs.items():
            pd.testing.assert_frame_equal(got, want, check_dtype=False), plan

    def test_inner_int_keys(self, ray_session):
        rng = np.random.RandomState(11)
        left = pd.DataFrame({"k": rng.randint(0, 40, 500), "v": range(500)})
        right = pd.DataFrame({"k": np.arange(40), "dim": np.arange(40) * 3})
        self._assert_equal(self._all_plans(left, right),
                           left.merge(right, on="k", how="inner"))

    def test_left_join_string_keys(self, ray_session):
        left = pd.DataFrame({"k": ["a", "b", "zz", "a", "q"] * 4,
                             "v": range(20)})
        right = pd.DataFrame({"k": ["a", "b", "c"], "dim": [1.5, 2.5, 3.5]})
        self._assert_equal(self._all_plans(left, right, how="left"),
                           left.merge(right, on="k", how="left"))

    def test_shared_nonkey_column_right_wins(self, ray_session):
        # both sides carry 'dim': the union path resolves to the RIGHT
        # copy (left_cols excludes right_only) — task plan must match
        left = pd.DataFrame({"k": [1, 2, 3], "dim": [-1, -2, -3],
                             "v": [10, 20, 30]})
        right = pd.DataFrame({"k": [1, 2, 3], "dim": [100, 200, 300]})
        outs = self._all_plans(left, right)
        want = left.drop(columns="dim").merge(right, on="k", how="inner")
        self._assert_equal(outs, want)

    def test_empty_right(self, ray_session):
        left = pd.DataFrame({"k": [1, 2], "v": [1, 2]})
        right = pd.DataFrame({"k": pd.Series(dtype="int64"),
                              "dim": pd.Series(dtype="int64")})
        for plan in ("dataset", "tasks"):
            from cqi_ray.relational import bucketed_hash_join
            got = bucketed_hash_join(_ds(left, blocks=2), _ds(right, blocks=1),
                                     on="k", right_cols=["k", "dim"],
                                     num_buckets=2, how="inner",
                                     plan=plan).to_pandas()
            assert len(got) == 0

    def test_restore_dtypes_on_task_plan(self, ray_session):
        left = pd.DataFrame({"k": [1, 2, 2], "v": [1, 2, 3]})
        right = pd.DataFrame({"k": [1, 2], "w": [10, 20]})
        from cqi_ray.relational import bucketed_hash_join
        got = bucketed_hash_join(_ds(left, blocks=2), _ds(right, blocks=1),
                                 on="k", right_cols=["k", "w"],
                                 restore_dtypes={"w": "int64"},
                                 plan="tasks").to_pandas()
        assert str(got["w"].dtype) == "int64"
        assert sorted(got["w"]) == [10, 20, 20]


class TestShuffleMidpointResume:
    """grouped_map_buckets(checkpoint_dir=...): the task-plan shuffle
    resumes mid-shuffle — completed buckets are never recomputed."""

    @staticmethod
    def _fn(marker_dir: str):
        def fn(g):
            import tempfile
            tempfile.mkstemp(dir=marker_dir)  # one marker per apply task
            return g.groupby("k", as_index=False)["v"].sum()
        return fn

    @staticmethod
    def _run(df, ck, marker_dir, key="v1", num_buckets=8):
        import ray.data as rd

        from cqi_ray.relational import grouped_map_buckets

        os.makedirs(marker_dir, exist_ok=True)
        out = grouped_map_buckets(
            rd.from_pandas(df).repartition(4), ["k"],
            TestShuffleMidpointResume._fn(marker_dir),
            num_buckets=num_buckets, whole_bucket=True, presort=False,
            checkpoint_dir=ck, checkpoint_key=key).to_pandas()
        return out.sort_values("k", ignore_index=True)

    def test_resume_recomputes_only_missing_buckets(self, ray_session,
                                                    tmp_path):
        n = 10_000
        df = pd.DataFrame({"k": np.arange(n) % 257,
                           "v": np.arange(n, dtype=np.int64)})
        ref = df.groupby("k", as_index=False)["v"].sum() \
            .sort_values("k", ignore_index=True)
        ck = str(tmp_path / "shuf")

        got1 = self._run(df, ck, str(tmp_path / "m1"))
        pd.testing.assert_frame_equal(got1, ref)
        n_apply1 = len(os.listdir(tmp_path / "m1"))
        sidecars = sorted(f for f in os.listdir(ck) if f.endswith(".json"))
        assert len(sidecars) == 8 and n_apply1 >= 1

        # simulate a crash that lost two buckets (sidecar + payload)
        import json as _json
        lost = 0
        for name in sidecars:
            with open(os.path.join(ck, name)) as fh:
                meta = _json.load(fh)
            if meta["rows"] > 0 and lost < 2:
                os.remove(os.path.join(ck, name))
                os.remove(os.path.join(ck, meta["file"]))
                lost += 1
        assert lost == 2

        got2 = self._run(df, ck, str(tmp_path / "m2"))
        pd.testing.assert_frame_equal(got2, ref)
        assert len(os.listdir(tmp_path / "m2")) == 2  # only the lost two

        # fully-complete directory: zero recomputation, same result
        got3 = self._run(df, ck, str(tmp_path / "m3"))
        pd.testing.assert_frame_equal(got3, ref)
        assert len(os.listdir(tmp_path / "m3")) == 0

        # stale key: every sidecar ignored, full recompute
        got4 = self._run(df, ck, str(tmp_path / "m4"), key="v2")
        pd.testing.assert_frame_equal(got4, ref)
        assert len(os.listdir(tmp_path / "m4")) == n_apply1

    def test_empty_buckets_checkpoint_and_skip(self, ray_session, tmp_path):
        df = pd.DataFrame({"k": np.array([0, 1] * 500),
                           "v": np.arange(1000, dtype=np.int64)})
        ref = df.groupby("k", as_index=False)["v"].sum() \
            .sort_values("k", ignore_index=True)
        ck = str(tmp_path / "shuf")
        got1 = self._run(df, ck, str(tmp_path / "m1"))
        pd.testing.assert_frame_equal(got1, ref)
        n_apply = len(os.listdir(tmp_path / "m1"))
        assert 1 <= n_apply <= 2  # two keys -> at most two non-empty buckets
        # empty buckets got rows=0 sidecars, so the rerun skips outright
        got2 = self._run(df, ck, str(tmp_path / "m2"))
        pd.testing.assert_frame_equal(got2, ref)
        assert len(os.listdir(tmp_path / "m2")) == 0

    def test_sigkill_mid_shuffle_then_resume(self, tmp_path):
        """A real crash: the shuffle's driver process is SIGKILLed while
        apply tasks are mid-flight; a fresh process resumes and recomputes
        exactly the buckets whose sidecars never landed."""
        import signal
        import subprocess
        import sys
        import time

        ck = str(tmp_path / "shuf")
        marker = str(tmp_path / "marks")
        os.makedirs(marker)
        child = r'''
import os, sys, time
import numpy as np, pandas as pd, ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd
from cqi_ray.relational import grouped_map_buckets

ck, marker, slow = sys.argv[1], sys.argv[2], sys.argv[3] == "1"

def fn(g):
    import tempfile, time as _t
    if slow:
        _t.sleep(0.6)
    tempfile.mkstemp(dir=marker)
    return g.groupby("k", as_index=False)["v"].sum()

n = 10_000
df = pd.DataFrame({"k": np.arange(n) % 257, "v": np.arange(n, dtype=np.int64)})
out = grouped_map_buckets(rd.from_pandas(df).repartition(4), ["k"], fn,
                          num_buckets=8, whole_bucket=True, presort=False,
                          checkpoint_dir=ck, checkpoint_key="v1").to_pandas()
agg = out.sort_values("k", ignore_index=True)
print("RESULT", len(agg), int(agg["v"].sum()), flush=True)
ray.shutdown(); os._exit(0)
'''
        env = dict(os.environ, PYTHONPATH="/root/repo")
        p = subprocess.Popen([sys.executable, "-c", child, ck, marker, "1"],
                             env=env, cwd="/root/repo",
                             start_new_session=True,
                             stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL)
        # kill the ENTIRE session (driver + raylet + workers) as soon as
        # SOME buckets committed — killing only the driver lets already-
        # queued apply tasks drain and commit (durability, but no window)
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            n_side = len([f for f in (os.listdir(ck) if os.path.isdir(ck)
                                      else []) if f.endswith(".json")])
            if 1 <= n_side <= 6:
                try:
                    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    p.kill()
                break
            if p.poll() is not None:  # finished before we could kill it
                break
            time.sleep(0.05)
        p.wait()
        # SIGKILLing the driver doesn't instantly stop its raylet's
        # workers: in-flight apply tasks may still commit their sidecars
        # (exactly the durability the design wants) — wait for the
        # directory to go quiet before counting what survived
        def _count():
            return len([f for f in os.listdir(ck) if f.endswith(".json")])

        completed = _count()
        settle = time.monotonic() + 30
        quiet_since = time.monotonic()
        while time.monotonic() < settle:
            time.sleep(0.25)
            now = _count()
            if now != completed:
                completed, quiet_since = now, time.monotonic()
            elif time.monotonic() - quiet_since > 3.0:
                break
        assert 1 <= completed < 8, f"kill window missed: {completed}/8"

        marker2 = str(tmp_path / "marks2")
        os.makedirs(marker2)
        out = subprocess.run([sys.executable, "-c", child, ck, marker2, "0"],
                             env=env, cwd="/root/repo", capture_output=True,
                             text=True, check=True)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT")][0].split()
        n = 10_000
        df = pd.DataFrame({"k": np.arange(n) % 257,
                           "v": np.arange(n, dtype=np.int64)})
        ref = df.groupby("k", as_index=False)["v"].sum()
        assert int(line[1]) == len(ref) and int(line[2]) == int(ref["v"].sum())
        assert len(os.listdir(marker2)) == 8 - completed


def test_flagship_stage_and_shuffle_resume_compose(ray_session, tmp_path,
                                                   monkeypatch):
    """run_flagship_checkpointed: the assignment stage's cell-match
    shuffle checkpoints per bucket UNDER the stage checkpoint — losing
    the stage output (crash after the shuffle, before the stage commit)
    rebuilds the stage from the completed shuffle buckets without
    recomputing a single one; and once the stage DOES commit, the
    shuffle checkpoint dir is garbage-collected (round-4 ADVICE: no
    disk growth / stale payloads across reruns)."""
    import shutil

    from cqi_ray.pipelines.flagship import run_flagship_checkpointed

    out_dir = str(tmp_path / "ck")
    monkeypatch.setenv("CQI_KEEP_SHUFFLE_CKPT", "1")
    _, a1, _ = run_flagship_checkpointed("/root/testdata/sf0.001", out_dir,
                                         n_ways=32)
    a1 = a1.to_pandas()
    a1 = a1.sort_values(list(a1.columns), ignore_index=True)

    shuf = os.path.join(out_dir, "assignments_shuffle")
    sides = {f: os.path.getmtime(os.path.join(shuf, f))
             for f in os.listdir(shuf)}
    assert any(f.endswith(".json") for f in sides)

    shutil.rmtree(os.path.join(out_dir, "assignments"))
    _, a2, _ = run_flagship_checkpointed("/root/testdata/sf0.001", out_dir,
                                         n_ways=32)
    a2 = a2.to_pandas()
    a2 = a2.sort_values(list(a2.columns), ignore_index=True)

    pd.testing.assert_frame_equal(a1, a2)
    after = {f: os.path.getmtime(os.path.join(shuf, f))
             for f in os.listdir(shuf)}
    assert after == sides  # every shuffle bucket reused, none recomputed

    # default behavior: the committed stage GCs the shuffle scratch dir
    monkeypatch.delenv("CQI_KEEP_SHUFFLE_CKPT")
    _, a3, _ = run_flagship_checkpointed("/root/testdata/sf0.001", out_dir,
                                         n_ways=32)
    a3 = a3.to_pandas().sort_values(list(a1.columns), ignore_index=True)
    pd.testing.assert_frame_equal(a1, a3)
    assert not os.path.exists(shuf)
