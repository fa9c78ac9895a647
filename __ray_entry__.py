"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
``entry()`` / ``queries()`` / ``oracle_sql()`` must never initialise or
shut down Ray.  See cqi_ray.queries for the catalog.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from os.path import dirname, abspath
from typing import Any

_REPO = dirname(abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship pipeline on sf0.001: documents -> synthetic street imagery
    -> decode/validate -> cell encode -> CQI-scored synthetic ways ->
    PIP/kNN assignment.  Returns the assignments Dataset."""
    from cqi_ray.pipelines.flagship import run_flagship

    return run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from cqi_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cqi_ray.queries import ORACLES

    return dict(ORACLES)
