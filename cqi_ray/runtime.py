"""Ray Data execution tuning shared by every session owner (bench, CLI,
tests).  Library pipelines never call ray.init; session owners call
``tune_data_context()`` once after init."""

from __future__ import annotations


def tune_data_context(quiet: bool = True):
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
    # The streaming executor's per-operator resource reservation (50 % split
    # across all operators) starves the one heavy stage of a deep pipeline:
    # measured 80 s -> 20 s for the 8-CPU headline job when disabled.  Our
    # pipelines are backpressure-safe (bounded block sizes), so let
    # operators compete for slots.
    if hasattr(ctx, "op_resource_reservation_enabled"):
        ctx.op_resource_reservation_enabled = False
    return ctx


def materialized_block_refs(ds):
    """Object refs of a materialized Dataset's blocks (pyarrow.Table or
    pandas.DataFrame each).  The escape hatch for iterative algorithms
    (k-means, PageRank): pin the blocks once, then drive each iteration
    as one wave of raw Ray tasks over the refs — a Dataset execution per
    iteration pays a ~0.4-1 s streaming-executor floor that dwarfs the
    per-iteration compute.  Blocks stay distributed in the (spillable)
    object store; the driver holds only the refs."""
    return [r for bundle in ds.iter_internal_ref_bundles()
            for r in bundle.block_refs]
