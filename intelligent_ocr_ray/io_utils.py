"""Shared read-sizing helper: block counts follow DATA, not CPUs.

Ray's default parquet block count tracks CPU parallelism (e.g. 64
blocks at 32 CPUs) regardless of input size. Every all-to-all
downstream then pays per block PAIR, so a modest table read at CPU
granularity hands the shuffle dozens of near-empty blocks — measured
2-4× of whole-query wall across the dedup/events/relational pipelines —
while at the other end a FIXED block count makes tasks superlinearly
chunky as the corpus grows (BENCH/BASELINE.md round 3). The rule both
ways: ~constant rows per block, computed from parquet metadata.

Per-table row targets stay with the callers (documents ≈ 64k text rows,
facts ≈ 256k narrow rows, …); this module owns only the mechanism.
"""

from __future__ import annotations

import math


def sized_read_parquet(
    path: str,
    columns: list[str] | None = None,
    *,
    rows_per_block: int,
    min_blocks: int = 8,
):
    """read_parquet with override_num_blocks = max(min_blocks,
    ceil(rows / rows_per_block)) from file metadata."""
    import pyarrow.parquet as pq
    import ray.data as rd

    n_rows = pq.read_metadata(path).num_rows
    blocks = max(min_blocks, math.ceil(n_rows / rows_per_block))
    return rd.read_parquet(path, columns=columns, override_num_blocks=blocks)


def drop_empty_blocks(ds, empty: "object"):
    """Strip zero-row blocks from a (small, already-aggregated) dataset.

    Ray's hash-aggregate finalize emits ZERO-COLUMN empty blocks for
    hash partitions that received no rows; pyarrow acero then rejects
    the whole join partition ("No match ... for key field reference")
    when such a block lands on the far side of a later equi-join. This
    guard materializes the dataset (a barrier — callers are groupby
    outputs that are small by construction), drops empty blocks by
    METADATA only (no block is pulled to the driver), and re-wraps the
    survivors zero-copy. ``empty`` is a pyarrow.Table carrying the
    correct zero-row schema, returned when every block was empty so the
    downstream join still sees the right columns."""
    import ray.data as rd

    refs = [
        ref
        for bundle in ds.materialize().iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]
    if not refs:
        return rd.from_arrow(empty)
    return rd.from_arrow_refs(refs)


def null_safe_kpart(t, key_cols: list[str], num_parts: int, col: str = "kpart"):
    """Append an int32 coarse-partition id over possibly-NULL key
    columns — the shuffle-safety discipline for grouped aggregates on
    user data: Ray's sort-based groupby compares raw key values across
    block boundaries and dies on clustered nulls (None < str TypeError
    for strings, numpy datetime conversion for timestamps), so
    NO raw user-data key ever rides a Ray groupby. Instead the keys
    are stringified (nulls -> a sentinel), md5-hashed (vectorized,
    process-independent) and bucketed; the per-partition finish runs
    pyarrow's C++ group_by on the REAL nullable keys, which is
    null-safe. Hash collisions (or the sentinel colliding with a
    literal key) only CO-LOCATE groups in a partition — never merge
    them — so correctness is layout-free."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.dedup import _md5_hash_strings

    parts = [
        pc.coalesce(pc.cast(t.column(c), pa.string()), "\x00N") for c in key_cols
    ]
    joined = (
        parts[0]
        if len(parts) == 1
        else pc.binary_join_element_wise(*parts, "\x1f")
    )
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    if len(joined) == 0:
        kp = np.empty(0, dtype=np.int32)
    else:
        kp = (_md5_hash_strings(joined) % np.uint64(num_parts)).astype(np.int32)
    return t.append_column(col, pa.array(kp, pa.int32()))


def null_safe_grouped_sum(
    partials,
    key_cols: list[str],
    sums: list[tuple[str, str]],
    num_parts: int = 16,
):
    """The standard finish for a partial-aggregate rollup on user-data
    keys: bucket by :func:`null_safe_kpart`, then per partition run
    pyarrow's null-safe C++ ``group_by`` over the REAL keys and sum
    each ``(partial_col, out_name)`` in ``sums`` (int64-cast — an
    all-null sum otherwise yields a null-typed column that pandas
    renders as object(None)). One definition so the next null-key or
    aggregate-naming fix lands everywhere at once."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def finish(g: "pa.Table") -> "pa.Table":
        # int64-cast is for the all-null→null-typed edge ONLY — a float
        # partial would be silently truncated, so reject it loudly
        # (ADVICE r4): money partials must already be integer cents.
        for c, _ in sums:
            if not pa.types.is_integer(g.schema.field(c).type) and not pa.types.is_null(
                g.schema.field(c).type
            ):
                raise TypeError(
                    f"null_safe_grouped_sum: partial column {c!r} is "
                    f"{g.schema.field(c).type}, expected an integer type "
                    "(fixed-point money/counts) — float partials would be "
                    "truncated by the int64 cast"
                )
        m = (
            g.drop_columns(["kpart"])
            .group_by(key_cols)
            .aggregate([(c, "sum") for c, _ in sums])
        )
        cols = {k: m.column(k) for k in key_cols}
        for c, name in sums:
            cols[name] = pc.cast(m.column(f"{c}_sum"), pa.int64())
        return pa.table(cols)

    parted = partials.map_batches(
        lambda t: null_safe_kpart(t, key_cols, num_parts),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return parted.groupby("kpart").map_groups(finish, batch_format="pyarrow")


def money_units(col, scale: float = 100.0):
    """Per-value fixed-point money: round half-even to integer units
    (cents at scale=100, micros at 1e6) and cast int64. THE parity
    discipline for every money aggregate: a float sum rounded at the
    end is summation-order-sensitive across engines (and a 4-decimal
    product sum sits exactly on a half-cent boundary with ~0.1
    probability per group); integer sums are exact and order-free.
    Oracle mirror: sum(CAST(round_even(col * scale, 0) AS BIGINT))."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.cast(pc.round(pc.multiply(col, scale), ndigits=0), pa.int64())
