"""Diff harness: run the CQI scoring pipeline on the conformance corpus and
compare every retained field against the golden output, row by row.

Usage: python scripts/golden_diff.py [--verbose] [--only ID]
"""

from __future__ import annotations

import json
import sys

from cqi_ray.io.geojson import read_ways_geojson
from cqi_ray.params import OUTPUT_COLUMNS
from cqi_ray.pipeline import score_ways, select_output

GOLDEN = "tests/data/golden_scores.geojson"
RAW = "tests/data/test_ways.geojson"

SKIP_FIELDS = set()


def load_golden():
    with open(GOLDEN) as fh:
        doc = json.load(fh)
    out = {}
    for f in doc["features"]:
        p = f["properties"]
        out[(p["id"], p.get("side"))] = p
    return out


def norm(v):
    if isinstance(v, float) and v == int(v):
        return v
    return v


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return abs(float(a) - float(b)) < 1e-9
    return a == b


def main():
    verbose = "--verbose" in sys.argv
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]

    golden = load_golden()
    rows = read_ways_geojson(RAW)
    scored = select_output(score_ways(rows))
    mine = {(r["id"], r.get("side")): r for r in scored}

    missing = sorted(set(golden) - set(mine))
    extra = sorted(set(mine) - set(golden))
    print(f"golden rows: {len(golden)}  mine: {len(mine)}")
    if missing:
        print(f"MISSING ({len(missing)}):", missing[:20])
    if extra:
        print(f"EXTRA ({len(extra)}):", extra[:20])

    n_bad_rows = 0
    field_fail = {}
    for key in sorted(set(golden) & set(mine), key=lambda k: (k[0], str(k[1]))):
        g, m = golden[key], mine[key]
        if only and key[0] != only:
            continue
        diffs = []
        for col in OUTPUT_COLUMNS:
            if col in SKIP_FIELDS:
                continue
            gv, mv = g.get(col), m.get(col)
            if not values_equal(gv, mv):
                diffs.append((col, gv, mv))
                field_fail[col] = field_fail.get(col, 0) + 1
        if diffs:
            n_bad_rows += 1
            if verbose or only:
                print(f"--- {key}")
                for col, gv, mv in diffs:
                    print(f"    {col:28s} golden={gv!r}  mine={mv!r}")
    print(f"rows with diffs: {n_bad_rows} / {len(set(golden) & set(mine))}")
    if field_fail:
        print("per-field failures:",
              dict(sorted(field_fail.items(), key=lambda kv: -kv[1])))
    return 1 if (n_bad_rows or missing or extra) else 0


if __name__ == "__main__":
    sys.exit(main())
