"""Golden-output conformance: the engine must reproduce the reference's
processed corpus (tests/data/golden_scores.geojson, 164 rows) exactly —
every retained field, every row.  This is the primary correctness oracle
(SURVEY.md §5)."""

import math

import pytest

from cqi_ray.params import OUTPUT_COLUMNS
from cqi_ray.pipeline import score_ways, select_output


def _eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), abs_tol=1e-9)
    return a == b


@pytest.fixture(scope="module")
def scored(corpus_rows):
    rows = [dict(r) for r in corpus_rows]
    return {(r["id"], r.get("side")): r for r in select_output(score_ways(rows))}


def test_row_set_matches(scored, golden_rows):
    assert set(scored) == set(golden_rows)


def test_all_fields_match(scored, golden_rows):
    bad = []
    for key, g in golden_rows.items():
        m = scored[key]
        for col in OUTPUT_COLUMNS:
            if not _eq(g.get(col), m.get(col)):
                bad.append((key, col, g.get(col), m.get(col)))
    assert not bad, f"{len(bad)} field mismatches, first 10: {bad[:10]}"


def test_way_type_distribution(scored):
    from collections import Counter

    counts = Counter(r["way_type"] for r in scored.values())
    assert counts["shared road"] == 51
    assert counts["cycle lane (advisory)"] == 15
    assert counts["cycle path"] == 11


def test_stress_level_distribution(scored):
    from collections import Counter

    counts = Counter(r["stress_level"] for r in scored.values())
    assert counts == {1: 63, 2: 54, 3: 15, 4: 32}


def test_side_fanout(scored):
    from collections import Counter

    counts = Counter(r["side"] for r in scored.values())
    assert counts[None] == 131 and counts["left"] == 17 and counts["right"] == 16
