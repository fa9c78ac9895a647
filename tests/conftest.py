import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (never per test)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from cqi_ray.runtime import tune_data_context

    tune_data_context(quiet=True)
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_rows():
    from cqi_ray.io.geojson import read_ways_geojson

    return read_ways_geojson(os.path.join(os.path.dirname(__file__), "data", "test_ways.geojson"))


@pytest.fixture(scope="session")
def golden_rows():
    import json

    path = os.path.join(os.path.dirname(__file__), "data", "golden_scores.geojson")
    with open(path) as fh:
        doc = json.load(fh)
    return {(f["properties"]["id"], f["properties"].get("side")): f["properties"]
            for f in doc["features"]}
