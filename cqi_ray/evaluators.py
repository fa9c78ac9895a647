"""Batch evaluator plugin API — the Ray-Data-first form of the
reference's skeletal refactor surface (`FeatureEvaluator.add_evaluator`,
/root/reference/src/CyclingQualityIndex/FeatureEvaluator/FeatureEvaluator.py:14-25,
and the `TagEvaluator.calculate_part_index` base,
src/CyclingQualityIndex/TagEvaluator/TagEvaluator.py:4-12).

Where the reference registers per-feature evaluators and loops rows, this
engine registers BATCH evaluators: each one maps a pyarrow batch to one
value per row, and the chain appends `proc_{name}` columns inside a
single ``map_batches`` stage (SURVEY.md §2.10: "batch-level evaluator
protocol evaluate(batch) -> column, chained inside map_batches").  A
stateful evaluator (loaded model, compiled config) is simply a class
whose __init__ runs once per actor when the chain is applied with
``concurrency=`` (actor pool).

The reference's Surface/Smoothness/Width evaluators are stubs returning
0 (SurfaceEvaluator.py:12-13 et al.); the built-ins here are functional,
backed by the engine's vectorized kernels, and reproduce the rule
semantics of the monolith.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa

from .params import CQIParams, DEFAULT_PARAMS

ColumnLike = Union[pa.Array, np.ndarray, Sequence]


class BatchEvaluator:
    """Base: subclass and implement ``evaluate(batch) -> one value/row``.

    ``name`` determines the output column ``proc_{name}``."""

    name: str = "part_index"

    def __init__(self, params: CQIParams = DEFAULT_PARAMS):
        self.params = params

    def evaluate(self, batch: pa.Table) -> ColumnLike:  # pragma: no cover
        raise NotImplementedError


class FnEvaluator(BatchEvaluator):
    """Wrap a plain ``fn(batch: pa.Table) -> column`` as an evaluator."""

    def __init__(self, name: str, fn: Callable[[pa.Table], ColumnLike],
                 params: CQIParams = DEFAULT_PARAMS):
        super().__init__(params)
        self.name = name
        self.fn = fn

    def evaluate(self, batch: pa.Table) -> ColumnLike:
        return self.fn(batch)


class EvaluatorChain:
    """Ordered evaluator registry; one ``map_batches`` applies them all.

    >>> chain = EvaluatorChain().add_evaluator(SurfaceEvaluator())
    >>> scored = chain.transform(ways_ds)           # task pool
    >>> scored = chain.transform(ways_ds, concurrency=4)  # actor pool
    """

    def __init__(self, evaluators: Sequence[BatchEvaluator] = ()):
        self.evaluators: list[BatchEvaluator] = list(evaluators)

    def add_evaluator(self, evaluator: BatchEvaluator) -> "EvaluatorChain":
        self.evaluators.append(evaluator)
        return self

    def apply(self, batch: pa.Table) -> pa.Table:
        for ev in self.evaluators:
            col = ev.evaluate(batch)
            if not isinstance(col, (pa.Array, pa.ChunkedArray)):
                col = pa.array(np.asarray(col))
            field = f"proc_{ev.name}"
            if field in batch.schema.names:
                batch = batch.set_column(
                    batch.schema.get_field_index(field), field, col)
            else:
                batch = batch.append_column(field, col)
        return batch

    def transform(self, ds, **map_batches_kwargs):
        """Apply the whole chain as ONE Ray Data stage (zero-copy Arrow
        in/out).  Pass ``concurrency=`` to run it as an actor pool when
        any evaluator holds expensive state."""
        chain = self

        if "concurrency" in map_batches_kwargs:
            class _ChainActor:
                def __init__(self):
                    self.chain = chain

                def __call__(self, batch: pa.Table) -> pa.Table:
                    return self.chain.apply(batch)

            return ds.map_batches(_ChainActor, batch_format="pyarrow",
                                  **map_batches_kwargs)
        return ds.map_batches(chain.apply, batch_format="pyarrow",
                              **map_batches_kwargs)


def _col_obj(batch: pa.Table, name: str) -> np.ndarray:
    if name in batch.schema.names:
        arr = batch[name].to_numpy(zero_copy_only=False).astype(object)
        arr[pd.isna(arr)] = None
        return arr
    return np.full(batch.num_rows, None, dtype=object)


class SurfaceEvaluator(BatchEvaluator):
    """Functional form of the reference's stub SurfaceEvaluator: the
    surface quality factor of each row's (way_type-aware) derived
    surface, NaN when underivable."""

    name = "surface_factor"

    def evaluate(self, batch: pa.Table) -> np.ndarray:
        from .vector import classify_way_type_batch, derive_surface_smoothness_batch
        from .vector_score import _lutf  # noqa: F401  (reuse pattern)

        df = batch.select([c for c in batch.schema.names
                           if batch[c].type != pa.binary()]).to_pandas()
        wts = classify_way_type_batch(df, self.params)
        surf, _, _, _ = derive_surface_smoothness_batch(df, wts, self.params)
        return np.array([np.nan if self.params.surface_factor.get(s) is None
                         else self.params.surface_factor[s] for s in surf],
                        dtype=np.float64)


class SmoothnessEvaluator(BatchEvaluator):
    name = "smoothness_factor"

    def evaluate(self, batch: pa.Table) -> np.ndarray:
        from .vector import classify_way_type_batch, derive_surface_smoothness_batch

        df = batch.select([c for c in batch.schema.names
                           if batch[c].type != pa.binary()]).to_pandas()
        wts = classify_way_type_batch(df, self.params)
        _, _, smooth, _ = derive_surface_smoothness_batch(df, wts, self.params)
        return np.array(
            [np.nan if self.params.smoothness_factor.get(s) is None
             else self.params.smoothness_factor[s] for s in smooth],
            dtype=np.float64)


class WidthEvaluator(BatchEvaluator):
    """Derived width in metres per row (the reference's WidthEvaluator is
    an empty-config stub; this one runs the full precedence chain)."""

    name = "width_m"

    def evaluate(self, batch: pa.Table) -> np.ndarray:
        from .vector import classify_way_type_batch, derive_oneway_batch
        from .vector_score import derive_width_batch

        df = batch.select([c for c in batch.schema.names
                           if batch[c].type != pa.binary()]).to_pandas()
        wts = classify_way_type_batch(df, self.params)
        ows = derive_oneway_batch(df, wts, self.params)
        width, *_ = derive_width_batch(df, wts, ows, self.params)
        return width
