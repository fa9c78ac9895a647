"""Training-data ops: dedup family, ANN, text analysis — verified against
brute-force / polars / duckdb oracles at small scale."""

import numpy as np
import pandas as pd
import pytest

from cqi_ray.ops import ann, dedup, text


@pytest.fixture(scope="module")
def docs():
    import pyarrow.parquet as pq

    return pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def embeddings():
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    return t


class TestMinHash:
    def test_signature_approximates_jaccard(self, docs):
        mh = dedup.MinHasher(num_perm=256)
        texts = docs["text"].head(30).tolist()
        # a doc vs a mutated copy: known-high jaccard
        base = texts[0]
        near = base + " extra token"
        s1, s2 = mh.signatures_batch([base, near])
        est = float((s1 == s2).mean())
        true = dedup.jaccard(dedup.char_shingles(base), dedup.char_shingles(near))
        assert abs(est - true) < 0.15

    def test_lsh_recall_on_planted_dups(self):
        rng = np.random.default_rng(0)
        words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
        base_docs = [" ".join(rng.choice(words, 40)) for _ in range(20)]
        dups = [d + " tail" for d in base_docs[:5]]
        all_docs = base_docs + dups
        mh = dedup.MinHasher(num_perm=64)
        sigs = mh.signatures_batch(all_docs)
        banded = dedup.band_rows(sigs, np.arange(len(all_docs)), bands=16)
        cands = set()
        for _, grp in banded.groupby(["band_id", "band_hash"]):
            cands.update(dedup.candidate_pairs_from_bucket(grp["doc_id"]))
        for i in range(5):
            assert (i, 20 + i) in cands  # every planted dup pair surfaces

    def test_simhash_similar_docs_close(self):
        a = "the quick brown fox jumps over the lazy dog again and again"
        b = a + " tail"
        c = "completely different words entirely unrelated content here"
        ha, hb, hc = dedup.simhash64([a, b, c])
        from cqi_ray.images.codec import hamming64

        assert hamming64([ha], [hb])[0] < hamming64([ha], [hc])[0]


class TestEmbeddingOps:
    def test_cosine_pairs_match_bruteforce(self, embeddings):
        mat = np.stack(embeddings["embedding"].head(100).to_numpy())
        ids = embeddings["vec_id"].head(100).to_numpy()
        pairs = dedup.cosine_dup_pairs(mat, ids, threshold=0.3)
        x = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = x @ x.T
        expected = {(int(ids[i]), int(ids[j]))
                    for i in range(100) for j in range(i + 1, 100)
                    if sims[i, j] >= 0.3}
        assert {(a, b) for a, b, _ in pairs} == expected

    def test_embedding_lsh_pairs_recall(self, ray_session):
        """LSH-blocked near-dup pairs (the sub-quadratic scale path) find
        nearly every planted near-duplicate that brute force finds."""
        import pandas as pd
        import ray.data as rd

        rng = np.random.default_rng(3)
        n, dim = 600, 32
        base = rng.standard_normal((n, dim))
        # plant 60 near-dup partners: tiny perturbations of the first 60
        planted = base[:60] + rng.standard_normal((60, dim)) * 0.05
        mat = np.concatenate([base, planted])
        ids = np.arange(len(mat))
        df = pd.DataFrame({"vec_id": ids, "embedding": list(mat.astype(np.float32))})

        out = dedup.embedding_lsh_pairs(
            rd.from_pandas(df), threshold=0.9, n_tables=8,
            n_planes=6).to_pandas()
        got = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}

        x = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = x @ x.T
        iu = np.triu_indices(len(mat), 1)
        want = {(int(iu[0][k]), int(iu[1][k]))
                for k in np.nonzero(sims[iu] >= 0.9)[0]}
        assert len(want) >= 60
        assert got <= want, "no false positives (exact verify inside buckets)"
        recall = len(got & want) / len(want)
        assert recall >= 0.9, recall

    def test_topk_merge_equals_global(self, embeddings):
        mat = np.stack(embeddings["embedding"].to_numpy()).astype(np.float64)
        ids = embeddings["vec_id"].to_numpy()
        q = mat[:3]
        # partials over two arbitrary shards must merge to the global answer
        p1 = ann.batch_topk_partials(ids[:200], mat[:200], q, k=4)
        p2 = ann.batch_topk_partials(ids[200:], mat[200:], q, k=4)
        merged = ann.merge_topk(pd.concat([p1, p2]), 4)
        full = ann.merge_topk(ann.batch_topk_partials(ids, mat, q, k=4), 4)
        assert merged[["query_id", "vec_id", "rank"]].to_dict("records") == \
            full[["query_id", "vec_id", "rank"]].to_dict("records")

    def test_lsh_buckets_deterministic(self, embeddings):
        mat = np.stack(embeddings["embedding"].head(50).to_numpy())
        lsh = ann.HyperplaneLSH(dim=mat.shape[1], n_planes=10)
        b1 = lsh.bucket(mat)
        b2 = ann.HyperplaneLSH(dim=mat.shape[1], n_planes=10).bucket(mat)
        assert np.array_equal(b1, b2)
        probes = lsh.probe_buckets(b1, n_probe_bits=2)
        assert probes.shape == (50, 3)
        assert (probes[:, 0] == b1).all()


class TestTextOps:
    def test_token_count_matches_duckdb(self, docs):
        import duckdb

        stats = text.TextStats()(docs.copy())
        con = duckdb.connect()
        con.register("docs", docs)
        oracle = con.execute(
            "SELECT doc_id, CASE WHEN trim(text)='' THEN 0 ELSE "
            "len(string_split_regex(trim(text), '\\s+')) END AS n FROM docs"
        ).df()
        assert stats["n_tokens"].tolist() == oracle["n"].tolist()

    def test_quality_scores_bounded(self, docs):
        stats = text.TextStats()(docs.copy())
        assert ((stats["quality_score"] >= 0) & (stats["quality_score"] <= 1)).all()
        assert (stats["n_subword_tokens"] >= stats["n_tokens"]).all()

    def test_langid(self):
        frame = pd.DataFrame({"text": [
            "the cat sat on the mat and it was a good day for the dog",
            "der Hund und die Katze sind nicht auf dem Tisch",
            "le chat est dans la maison avec le chien et il est content",
            "xyzzy plugh",
        ]})
        out = text.LangId()(frame)
        assert out["lang_pred"].tolist() == ["en", "de", "fr", "und"]

    def test_fingerprints(self, docs):
        out = text.fingerprint_batch(docs.head(10).copy())
        again = text.fingerprint_batch(docs.head(10).copy())
        assert out["fingerprint"].tolist() == again["fingerprint"].tolist()
        import hashlib

        assert out["content_md5"].iloc[0] == hashlib.md5(
            docs["text"].iloc[0].encode()).hexdigest()


class TestLSHANN:
    def test_lsh_ann_properties(self, ray_session):
        """LSH ANN: deterministic, self-hit at rank 1, and every result is
        a true member of the query's probed candidate set ranked by exact
        cosine (brute-force agreement on scanned candidates)."""
        from cqi_ray.queries import q_ann_lsh, q_ann_topk

        a = q_ann_lsh("/root/testdata/sf0.001", probe_bits=3)
        b = q_ann_lsh("/root/testdata/sf0.001", probe_bits=3)
        assert a.to_dict("records") == b.to_dict("records")
        for qid, grp in a.groupby("query_id"):
            top1 = grp[grp["rank"] == 1]["vec_id"].iloc[0]
            assert top1 == qid  # the query's own vector is in its own bucket
        # recall vs brute force is data-dependent; sanity: some overlap
        bf = q_ann_topk("/root/testdata/sf0.001")
        overlap = len(set(map(tuple, a[["query_id", "vec_id"]].to_numpy()))
                      & set(map(tuple, bf[["query_id", "vec_id"]].to_numpy())))
        assert overlap >= len(a["query_id"].unique())  # at least the self-hits

    def test_lsh_full_probe_equals_bruteforce(self, ray_session):
        """probe_bits=None (the registered default) probes every bucket ->
        must equal the exact top-k, independent of the hyperplanes."""
        from cqi_ray.queries import q_ann_lsh, q_ann_topk

        lsh = q_ann_lsh("/root/testdata/sf0.001")
        bf = q_ann_topk("/root/testdata/sf0.001")
        assert lsh.to_dict("records") == bf.to_dict("records")


class TestIVF:
    def test_ivf_full_probe_equals_bruteforce(self, ray_session):
        """nprobe == nlist scans every list -> must equal the exact top-k."""
        from cqi_ray.queries import q_ann_ivf, q_ann_topk

        ivf = q_ann_ivf("/root/testdata/sf0.001", nlist=8, nprobe=8)
        bf = q_ann_topk("/root/testdata/sf0.001")
        assert ivf.to_dict("records") == bf.to_dict("records")

    def test_ivf_partial_probe_properties(self, ray_session):
        from cqi_ray.queries import q_ann_ivf

        a = q_ann_ivf("/root/testdata/sf0.001", nlist=16, nprobe=4)
        b = q_ann_ivf("/root/testdata/sf0.001", nlist=16, nprobe=4)
        assert a.to_dict("records") == b.to_dict("records")
        for qid, grp in a.groupby("query_id"):
            assert grp[grp["rank"] == 1]["vec_id"].iloc[0] == qid

    def test_kmeans_deterministic(self, embeddings):
        mat = np.stack(embeddings["embedding"].head(200).to_numpy())
        c1 = ann.kmeans_fit(mat, 8)
        c2 = ann.kmeans_fit(mat, 8)
        assert np.array_equal(c1, c2)
        idx = ann.IVFIndex(c1)
        assign = idx.assign(mat)
        assert assign.min() >= 0 and assign.max() < 8


class TestHyperLogLog:
    def test_estimate_accuracy(self):
        from cqi_ray.ops.sketch import hll_estimate, hll_partial

        for n in (100, 5_000, 100_000):
            regs = hll_partial(np.arange(n, dtype=np.int64), p=12)
            est = hll_estimate(regs)
            assert abs(est - n) / n < 0.05, (n, est)

    def test_merge_equals_single_pass(self):
        from cqi_ray.ops.sketch import hll_merge, hll_partial

        vals = np.arange(20_000, dtype=np.int64)
        whole = hll_partial(vals, p=10)
        parts = [hll_partial(c, p=10) for c in np.array_split(vals, 13)]
        assert np.array_equal(hll_merge(parts), whole)

    def test_distributed_vs_exact(self, ray_session):
        from cqi_ray.queries import q_approx_count_distinct, q_count_distinct

        sf = "/root/testdata/sf0.001"
        approx = q_approx_count_distinct(sf).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        exact = q_count_distinct(sf).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        assert list(approx["event_type"]) == list(exact["event_type"])
        for a, e in zip(approx["n_approx"], exact["n_users"]):
            assert abs(a - e) / max(e, 1) < 0.05, (a, e)
        # deterministic: rerun produces identical estimates
        again = q_approx_count_distinct(sf).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        assert again.equals(approx)


class TestBloomFilter:
    def test_no_false_negatives_and_low_fpp(self):
        from cqi_ray.ops.sketch import BloomFilter

        keys = np.arange(30_000, dtype=np.int64)
        bf = BloomFilter(BloomFilter.size_for(len(keys)))
        bf.add(keys)
        assert bf.contains(keys).all()  # Bloom filters never false-negative
        probe = np.arange(30_000, 1_030_000, dtype=np.int64)
        assert bf.contains(probe).mean() < 0.02

    def test_merge_equals_single_build(self):
        from cqi_ray.ops.sketch import BloomFilter

        keys = np.arange(30_000, dtype=np.int64)
        b1, b2, whole = BloomFilter(19), BloomFilter(19), BloomFilter(19)
        b1.add(keys[:15_000])
        b2.add(keys[15_000:])
        whole.add(keys)
        assert np.array_equal(b1.merge(b2).words, whole.words)


class TestCountMinSketch:
    def test_overestimates_and_bounded(self):
        from cqi_ray.ops.sketch import CountMinSketch

        rng = np.random.RandomState(5)
        vals = (rng.zipf(1.4, 40000) % 500).astype(np.int64)
        cms = CountMinSketch(depth=4, width=4096).add(vals)
        true = pd.Series(vals).value_counts()
        keys = true.index.to_numpy()
        est = cms.query(keys)
        tv = true.to_numpy()
        assert (est >= tv).all()
        # eps = e/width -> overestimate bound eps*N (loose check at 3x)
        assert (est - tv).max() <= 3 * np.e / 4096 * len(vals) + 1

    def test_merge_equals_single_pass(self):
        from cqi_ray.ops.sketch import CountMinSketch

        vals = np.arange(10000) % 97
        a = CountMinSketch().add(vals[:4000])
        b = CountMinSketch().add(vals[4000:])
        one = CountMinSketch().add(vals)
        assert (a.merge(b).table == one.table).all()

    def test_weighted_add(self):
        from cqi_ray.ops.sketch import CountMinSketch

        cms = CountMinSketch().add(np.array([7, 8]), counts=[5, 2])
        assert list(cms.query(np.array([7, 8]))) == [5, 2]

    def test_approx_matches_exact_heavy_hitters(self, ray_session):
        from cqi_ray.queries import q_approx_heavy_hitters, q_heavy_hitters

        sf = "/root/testdata/sf0.001"
        approx = q_approx_heavy_hitters(sf)
        exact = q_heavy_hitters(sf)
        # candidates ARE the exact top-k, estimates are upper bounds
        assert list(approx["l_partkey"]) == list(exact["l_partkey"])
        assert list(approx["cnt"]) == list(exact["cnt"])
        assert (approx["est_cnt"] >= approx["cnt"]).all()
        # eps*N overestimate bound (loose 3x): eps = e/width
        import pyarrow.parquet as pq

        n = pq.read_metadata(f"{sf}/lineitem.parquet").num_rows
        assert (approx["est_cnt"] - approx["cnt"]).max() \
            <= 3 * np.e / 4096 * n + 1


class TestTDigest:
    def test_rank_error_bounded(self):
        from cqi_ray.ops.sketch import TDigest

        rng = np.random.RandomState(11)
        vals = rng.lognormal(3.0, 1.2, 50_000)
        d = TDigest(delta=200)
        for chunk in np.array_split(vals, 7):
            d.add(chunk)
        sv = np.sort(vals)
        for q in (0.01, 0.25, 0.5, 0.9, 0.99):
            est = d.quantile(q)
            # rank of the estimate in the true data vs requested rank
            rank = np.searchsorted(sv, est) / len(sv)
            assert abs(rank - q) < 0.01, (q, rank)

    def test_merge_matches_single_digest_quantiles(self):
        from cqi_ray.ops.sketch import TDigest

        rng = np.random.RandomState(3)
        vals = rng.normal(0, 1, 20_000)
        a = TDigest().add(vals[:8_000])
        b = TDigest().add(vals[8_000:])
        merged = a.merge(b)
        one = TDigest().add(vals)
        for q in (0.1, 0.5, 0.9):
            assert abs(merged.quantile(q) - one.quantile(q)) < 0.05

    def test_row_roundtrip(self):
        from cqi_ray.ops.sketch import TDigest

        d = TDigest().add(np.arange(1000, dtype=np.float64))
        d2 = TDigest.from_row(d.to_row())
        assert np.array_equal(d.means, d2.means)
        assert np.array_equal(d.weights, d2.weights)

    def test_query_tracks_exact_quantiles(self, ray_session):
        from cqi_ray.queries import q_approx_quantiles

        sf = "/root/testdata/sf0.001"
        res = q_approx_quantiles(sf)
        li = pd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_extendedprice"])
        v = np.sort(li["l_extendedprice"].to_numpy())
        for q, est in zip(res["q"], res["val"]):
            rank = np.searchsorted(v, est) / len(v)
            assert abs(rank - q) < 0.02, (q, rank)


class TestDistributedKMeans:
    def _local_reference(self, ids, mat, k, iters):
        """Single-process run of the identical algorithm (seed = k
        smallest ids, spherical mean update, argmax assignment)."""
        order = np.argsort(ids)
        x = ann.normalize_rows(mat)
        cents = x[order[:k]].copy()
        for _ in range(iters):
            assign = np.argmax(x @ cents.T, axis=1)
            for c in range(k):
                m = x[assign == c]
                if len(m):
                    s = m.sum(axis=0)
                    n = np.linalg.norm(s)
                    if n > 0:
                        cents[c] = s / n
        return cents, np.argmax(x @ cents.T, axis=1)

    def test_matches_local_reference(self, ray_session, embeddings):
        import ray.data as rd

        ids = embeddings["vec_id"].to_numpy()
        mat = np.stack(embeddings["embedding"].to_numpy())
        ds = rd.from_pandas(embeddings[["vec_id", "embedding"]]).repartition(4)
        cents, assign_ds = ann.kmeans_distributed(ds, k=6, iters=4)
        got = assign_ds.to_pandas().set_index("vec_id")["cluster"]
        ref_cents, ref_assign = self._local_reference(ids, mat, 6, 4)
        np.testing.assert_allclose(cents, ref_cents, atol=1e-9)
        assert (got.loc[ids].to_numpy() == ref_assign).all()

    def test_deterministic_across_partitionings(self, ray_session, embeddings):
        import ray.data as rd

        df = embeddings[["vec_id", "embedding"]]
        a = ann.kmeans_distributed(rd.from_pandas(df).repartition(2),
                                   k=4, iters=3)[0]
        b = ann.kmeans_distributed(rd.from_pandas(df).repartition(7),
                                   k=4, iters=3)[0]
        # partial sums re-associate across partitionings: bitwise equality
        # is not guaranteed, agreement to float-noise level is
        np.testing.assert_allclose(a, b, atol=1e-9)


class TestIVFPQ:
    def test_pq_encode_decode_shapes_and_determinism(self):
        from cqi_ray.ops.ann import PQCodebook

        rng = np.random.default_rng(3)
        x = rng.standard_normal((400, 64))
        pq1 = PQCodebook.fit(x, M=8, ksub=16)
        pq2 = PQCodebook.fit(x, M=8, ksub=16)
        assert (pq1.codebooks == pq2.codebooks).all()
        c1, c2 = pq1.encode(x), pq2.encode(x)
        assert c1.shape == (400, 8) and c1.dtype == np.uint8
        assert (c1 == c2).all()

    def test_pq_adc_orders_near_over_far(self):
        from cqi_ray.ops.ann import PQCodebook, normalize_rows

        rng = np.random.default_rng(4)
        centers = rng.standard_normal((4, 64)) * 3
        x = np.concatenate([c + rng.standard_normal((50, 64)) * 0.1
                            for c in centers])
        pq = PQCodebook.fit(x, M=8, ksub=16)
        codes = pq.encode(x)
        q = centers[0:1] + 0.01
        table = pq.adc_table(q)[0]
        scores = pq.adc_scores(codes, table)
        # members of cluster 0 must dominate the ADC top-50
        top = np.argsort(-scores)[:50]
        assert (top < 50).mean() >= 0.9

    def test_ivfpq_query_recall_and_determinism(self, ray_session):
        from cqi_ray.queries import q_ann_ivfpq, q_ann_topk

        sf = "/root/testdata/sf0.001"
        exact = q_ann_topk(sf, k=5)
        approx = q_ann_ivfpq(sf, k=5, nprobe=16)  # all lists probed
        e = {(r.query_id, r.vec_id) for r in exact.itertuples(index=False)}
        a = {(r.query_id, r.vec_id) for r in approx.itertuples(index=False)}
        recall = len(e & a) / len(e)
        assert recall >= 0.8, recall  # PQ-lossy shortlist + exact re-rank
        again = q_ann_ivfpq(sf, k=5, nprobe=16)
        pd.testing.assert_frame_equal(
            approx.reset_index(drop=True), again.reset_index(drop=True))

    def test_ivfpq_pruned_still_overlaps(self, ray_session):
        from cqi_ray.queries import q_ann_ivfpq, q_ann_topk

        sf = "/root/testdata/sf0.001"
        exact = q_ann_topk(sf, k=5)
        approx = q_ann_ivfpq(sf, k=5, nprobe=4)
        e = {(r.query_id, r.vec_id) for r in exact.itertuples(index=False)}
        a = {(r.query_id, r.vec_id) for r in approx.itertuples(index=False)}
        assert len(e & a) / len(e) >= 0.5


class TestDistributedPCA:
    """q_pca's distributed covariance (long-format XᵀX partials -> one
    bucketed sum) must reproduce single-machine numpy PCA exactly (up
    to the documented sign convention)."""

    def test_matches_numpy(self, ray_session):
        import pyarrow.parquet as pq

        from cqi_ray.queries import q_pca

        got = q_pca("/root/testdata/sf0.001", k=2).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"]).to_pandas() \
            .sort_values("vec_id")
        mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        mu = mat.mean(axis=0)
        cov = np.cov(mat, rowvar=False, bias=True)
        w, v = np.linalg.eigh(cov)
        comp = v[:, np.argsort(w)[::-1][:2]]
        comp = comp * np.sign(comp[np.abs(comp).argmax(axis=0),
                                   np.arange(2)])
        want = (mat - mu) @ comp
        assert np.allclose(got[["pc1", "pc2"]].to_numpy(), want, atol=2e-6)
        # variance must actually concentrate: pc1 var >= pc2 var
        assert got["pc1"].var() >= got["pc2"].var()


class TestBandedEditDistance:
    """ops/text.py::banded_edit_distance vs a scalar reference DP —
    the verify kernel behind q_edit_distance."""

    @staticmethod
    def _ref(a: str, b: str) -> int:
        la, lb = len(a), len(b)
        D = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, D[0] = D[0], i
            for j in range(1, lb + 1):
                prev, D[j] = D[j], min(D[j] + 1, D[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return D[lb]

    def test_differential(self):
        import random

        from cqi_ray.ops.text import banded_edit_distance

        rng = random.Random(7)
        alpha = "abc "
        pairs = []
        for _ in range(400):
            a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
            b = list(a)
            for _ in range(rng.randint(0, 5)):
                op = rng.choice("sid")
                if op == "s" and b:
                    b[rng.randrange(len(b))] = rng.choice(alpha)
                elif op == "i":
                    b.insert(rng.randrange(len(b) + 1), rng.choice(alpha))
                elif op == "d" and b:
                    b.pop(rng.randrange(len(b)))
            pairs.append((a, "".join(b)))
        for _ in range(200):
            pairs.append(
                ("".join(rng.choice(alpha) for _ in range(rng.randint(0, 10))),
                 "".join(rng.choice(alpha) for _ in range(rng.randint(0, 10)))))
        for k in (1, 2, 3):
            got = banded_edit_distance([p[0] for p in pairs],
                                       [p[1] for p in pairs], k)
            exp = np.array([min(self._ref(a, b), k + 1) for a, b in pairs])
            assert (got == exp).all()

    def test_empty_and_exact(self):
        from cqi_ray.ops.text import banded_edit_distance

        assert banded_edit_distance([], [], 2).tolist() == []
        assert banded_edit_distance(["", "x", "same"],
                                    ["", "", "same"], 2).tolist() == [0, 1, 0]


class TestVocabCap:
    """ops.text.cap_token_table: the bounded-head vocab cap + UNK bucket
    that makes the token-model folds (naive bayes / surprisal /
    source drift) web-scale safe."""

    def _counts_ds(self):
        import ray.data as rd

        # global totals: aa=10, bb=7, cc=3, dd=1  (top-2 = {aa, bb})
        df = pd.DataFrame({
            "src": ["s1", "s1", "s1", "s2", "s2", "s2"],
            "token": ["aa", "bb", "cc", "aa", "cc", "dd"],
            "n": [6, 7, 1, 4, 2, 1]})
        return rd.from_pandas(df).repartition(3)

    def test_cap_binds_and_conserves_mass(self, ray_session):
        from cqi_ray.ops.text import UNK_TOKEN, cap_token_table

        got, dropped = cap_token_table(self._counts_ds(), keys=["src"],
                                       cap=2, num_buckets=4)
        assert dropped == 2  # cc, dd
        kept = set(got["token"])
        assert kept == {"aa", "bb", UNK_TOKEN}
        # tail mass collapses into UNK per key; totals conserved
        by = got.set_index(["src", "token"])["n"]
        assert by[("s1", UNK_TOKEN)] == 1          # cc
        assert by[("s2", UNK_TOKEN)] == 3          # cc + dd
        assert got["n"].sum() == 21

    def test_cap_above_vocab_is_noop(self, ray_session):
        from cqi_ray.ops.text import UNK_TOKEN, cap_token_table

        got, dropped = cap_token_table(self._counts_ds(), keys=["src"],
                                       cap=10, num_buckets=4)
        assert dropped == 0
        assert UNK_TOKEN not in set(got["token"])
        assert got["n"].sum() == 21

    def test_surprisal_capped_routes_oov_to_unk(self, ray_session):
        from cqi_ray.queries import q_surprisal

        sf = "/root/testdata/sf0.001"
        full = q_surprisal(sf).to_pandas().sort_values("doc_id")
        capped = q_surprisal(sf, vocab_cap=3).to_pandas() \
            .sort_values("doc_id")
        assert len(capped) == len(full)
        assert np.isfinite(capped["surprisal"]).all()
        # same token counts; scores differ because the tail collapsed
        assert (capped["n_tokens"].to_numpy()
                == full["n_tokens"].to_numpy()).all()
        assert not np.allclose(capped["surprisal"], full["surprisal"])

    def test_naive_bayes_capped_still_classifies(self, ray_session):
        from cqi_ray.queries import q_naive_bayes

        sf = "/root/testdata/sf0.001"
        capped = q_naive_bayes(sf, vocab_cap=5).to_pandas()
        full = q_naive_bayes(sf).to_pandas()
        assert len(capped) == len(full)
        assert set(capped["pred_lang"]) <= set(full["pred_lang"])
        assert np.isfinite(capped["score"]).all()

    def test_source_drift_capped_bounded_table(self, ray_session):
        from cqi_ray.queries import q_source_drift

        sf = "/root/testdata/sf0.001"
        capped = q_source_drift(sf, vocab_cap=4)
        full = q_source_drift(sf)
        # same source-pair grid, finite KL everywhere
        assert len(capped) == len(full)
        assert np.isfinite(capped["kl"]).all()


class TestSqlHashReplay:
    """ops/sqlhash.py: DuckDB replays the engine's splitmix64 chain
    element-for-element — the primitive behind the HLL and CMS exact
    oracles."""

    def test_splitmix64_select_matches_numpy(self):
        import duckdb

        from cqi_ray.ops.sqlhash import splitmix64_select
        from cqi_ray.relational import _splitmix64

        rng = np.random.default_rng(7)
        vals = np.concatenate([
            rng.integers(0, 2 ** 63, 5000, dtype=np.int64),
            np.arange(64), [2 ** 63 - 1, 0, 1]])
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"i": np.arange(len(vals)),
                                        "v": vals}))
        sql = splitmix64_select("SELECT i, v FROM t", "v", "hh", rounds=2)
        got = con.sql(f"SELECT hh FROM ({sql}) ORDER BY i") \
            .fetchnumpy()["hh"].astype(np.uint64)
        assert np.array_equal(got, _splitmix64(_splitmix64(vals)))

    def test_hll_estimate_integer_sum_is_exact(self):
        from cqi_ray.ops.sketch import hll_estimate, hll_partial

        vals = np.arange(100_000, dtype=np.int64)
        regs = hll_partial(vals, p=12)
        est = hll_estimate(regs)
        assert abs(est - 100_000) / 100_000 < 0.05
        # pure function of the registers (no float-order dependence)
        assert hll_estimate(regs.copy()) == est


class TestKcoreDecompose:
    """ops.graph.kcore_decompose — the raw-task-wave peel (q_kcore's
    engine).  Semantics pinned independently of the DuckDB oracle:
    hand-checked graph, fixpoint early-stop, max_rounds cap."""

    def _edges(self, pairs):
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]}))

    def test_clique_survives_pendant_peels(self, ray_session):
        from cqi_ray.ops.graph import kcore_decompose

        # 4-clique {0,1,2,3} + pendant chain 3-10-11
        clique = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        chain = [(3, 10), (10, 11)]
        out = kcore_decompose(self._edges(clique + chain), k=3) \
            .sort_values("node").reset_index(drop=True)
        assert out["node"].tolist() == [0, 1, 2, 3]
        assert out["deg_in_core"].tolist() == [3, 3, 3, 3]

    def test_max_rounds_zero_returns_raw_degrees(self, ray_session):
        from cqi_ray.ops.graph import kcore_decompose

        out = kcore_decompose(self._edges([(0, 1), (1, 2)]), k=99,
                              max_rounds=0).sort_values("node") \
            .reset_index(drop=True)
        assert out["node"].tolist() == [0, 1, 2]
        assert out["deg_in_core"].tolist() == [1, 2, 1]

    def test_max_rounds_caps_peeling_like_the_unrolled_oracle(
            self, ray_session):
        from cqi_ray.ops.graph import kcore_decompose

        # path 0-1-2-3-4: k=2 peels one endpoint layer per round
        path = [(0, 1), (1, 2), (2, 3), (3, 4)]
        one = kcore_decompose(self._edges(path), k=2, max_rounds=1) \
            .sort_values("node").reset_index(drop=True)
        # round 1 drops {0, 4}; degrees of the remaining path 1-2-3
        assert one["node"].tolist() == [1, 2, 3]
        assert one["deg_in_core"].tolist() == [1, 2, 1]
        # full peel empties the graph (a path has no 2-core)
        full = kcore_decompose(self._edges(path), k=2, max_rounds=8)
        assert len(full) == 0

    def test_everything_kept_is_a_fixpoint(self, ray_session):
        from cqi_ray.ops.graph import kcore_decompose

        tri = [(0, 1), (1, 2), (0, 2)]
        out = kcore_decompose(self._edges(tri), k=2) \
            .sort_values("node").reset_index(drop=True)
        assert out["deg_in_core"].tolist() == [2, 2, 2]
