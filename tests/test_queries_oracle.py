"""In-process DuckDB-oracle conformance for the full query catalog at
sf0.001 — the same comparison the driver performs, embedded in pytest so
``python -m pytest -x -q`` alone proves the relational operators.

Every queries() entry must at least produce a frame; entries with an
oracle must match it exactly (row count + order-insensitive values after
sorting columns by name)."""

import os

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# the heavyweight rows-only pipelines covered by dedicated test modules
SKIP_ROWS_ONLY = {"cqi_scores", "images_assign", "images_assign_rtree",
                  "dedup_phash_images"}


def _to_pandas(result):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return pd.DataFrame(result)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _oracle_cases():
    from cqi_ray.queries import ORACLES, QUERIES

    return sorted(set(QUERIES) & set(ORACLES))


def _rows_only_cases():
    from cqi_ray.queries import ORACLES, QUERIES

    return sorted(set(QUERIES) - set(ORACLES) - SKIP_ROWS_ONLY)


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_duckdb(name, ray_session, duck):
    from cqi_ray.queries import ORACLES, QUERIES

    mine = _normalize(_to_pandas(QUERIES[name](SF_DIR)))
    oracle = _normalize(duck.execute(ORACLES[name]).df())
    assert list(mine.columns) == list(oracle.columns), name
    assert len(mine) == len(oracle), name
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


@pytest.mark.parametrize("name", _rows_only_cases())
def test_query_runs(name, ray_session):
    from cqi_ray.queries import QUERIES

    out = _to_pandas(QUERIES[name](SF_DIR))
    assert len(out) >= 0
    assert len(out.columns) > 0


# a shuffle-shape cross-section of the catalog: groupby reduce, bucketed
# join chain, LSH band shuffle, anti-join, distinct, set op, salted join
_TINY_TARGET_SAMPLE = ["groupby_agg", "join3_topk", "dedup_minhash",
                       "dedup_normalized", "distinct", "window_tumbling"]


@pytest.mark.parametrize("name", _TINY_TARGET_SAMPLE)
def test_forced_tiny_bucket_target_output_identical(name, ray_session,
                                                    duck, monkeypatch):
    """Round-5 ADVICE: the oversized-bucket secondary split must be
    output-invariant at EVERY call site.  Forcing a 4 KiB byte target
    sends every bucket of these representative catalog queries through
    the auto-sizing + guard-resplit path; the DuckDB oracle must still
    match exactly.  (The full-catalog version of this check is the
    CQI_TARGET_BUCKET_BYTES=4096 sweep recorded in BASELINE.md.)"""
    from cqi_ray import relational
    from cqi_ray.queries import ORACLES, QUERIES

    monkeypatch.setattr(relational, "TARGET_BUCKET_BYTES", 4096)
    mine = _normalize(_to_pandas(QUERIES[name](SF_DIR)))
    oracle = _normalize(duck.execute(ORACLES[name]).df())
    assert len(mine) == len(oracle), name
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
