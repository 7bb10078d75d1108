"""Run metrics + lineage: the engine analog of ProcessResult counters
(core/pdf_processor.py:37-102, increments at 530/535/1374/1417/1501/
1509/1527) and the daily JSONL roll-up (get_today_stats,
core/pdf_processor.py:160-189) — re-expressed as Dataset aggregates.

Shuffle discipline: profile-style aggregates pre-reduce inside
map_batches (pyarrow group_by per block → one partial row per key per
block) so the global groupby only shuffles O(blocks × keys) rows, never
O(rows) — the combiner pattern the 100-TB budget requires.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _partial_counts(batch: pa.Table, keys: list[str]) -> pa.Table:
    """Per-block partial: one (keys..., n) row per distinct key combo."""
    return batch.group_by(keys).aggregate([([], "count_all")]).rename_columns(
        keys + ["n"]
    )


def status_profile(ds, keys: list[str] = ["status", "route"]):
    """Counts per (status, route) over an extracted dataset — the run
    summary counters (processed/skipped/fallback, A1) as one tiny
    aggregate: per-block partials → groupby-sum over ≤ |keys| rows/block."""
    import functools

    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        functools.partial(_partial_counts, keys=keys),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partials.groupby(keys).aggregate(Sum("n", alias_name="n"))


def conv_stats(ds):
    """Per-conversation counters (per-document ProcessResult analog):
    turn count, max turn index, total chars. One hash groupby on
    conv_id; per-turn columns are computed vectorized beforehand."""
    from ray.data.aggregate import Count, Max, Sum

    def add_len(t: pa.Table) -> pa.Table:
        return t.append_column(
            "turn_chars", pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        )

    with_len = ds.map_batches(add_len, batch_format="pyarrow", zero_copy_batch=True)
    return with_len.groupby("conv_id").aggregate(
        Count(alias_name="n_turns"),
        Max("turn_idx", alias_name="max_turn_idx"),
        Sum("turn_chars", alias_name="sum_chars"),
    )


def completeness_by_conv(ds_in, ds_out):
    """A5 invariant as a Dataset op: per-conversation input vs output
    turn counts must match (the page-count assertion,
    core/pdf_processor.py:1585-1603). Returns conversations that FAIL."""
    from ray.data.aggregate import Sum

    def tag(label):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "conv_id": t.column("conv_id"),
                    label: pa.array([1] * n, pa.int64()),
                }
            )

        return f

    a = ds_in.map_batches(tag("n_in"), batch_format="pyarrow", zero_copy_batch=True)
    b = ds_out.map_batches(tag("n_out"), batch_format="pyarrow", zero_copy_batch=True)
    counts_in = a.groupby("conv_id").aggregate(Sum("n_in", alias_name="n_in"))
    counts_out = b.groupby("conv_id").aggregate(Sum("n_out", alias_name="n_out"))
    joined = counts_in.join(
        counts_out, join_type="left_outer", num_partitions=16, on=("conv_id",)
    )

    def mismatched(t: pa.Table) -> pa.Table:
        n_out = t.column("n_out").fill_null(0)
        return t.set_column(
            t.schema.get_field_index("n_out"), "n_out", n_out
        ).filter(pc.not_equal(t.column("n_in"), n_out))

    return joined.map_batches(mismatched, batch_format="pyarrow", zero_copy_batch=True)


def write_run_metrics(profile_ds, out_path: str, run_meta: dict) -> None:
    """Persist the run's metrics rows (S8 JSONL-log analog → parquet).
    Tiny table → single file; run metadata rides as constant columns."""
    t = pa.Table.from_pandas(profile_ds.to_pandas(), preserve_index=False)
    for k, v in run_meta.items():
        t = t.append_column(k, pa.array([v] * t.num_rows))
    import os

    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pq.write_table(t, out_path)


def rollup_metrics(metrics_glob_dir: str):
    """A2 analog: scan all runs' metrics parquet, filter ok-status rows,
    sum counters per run."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(metrics_glob_dir)
    ok = ds.filter(expr="status == 'ok'")
    return ok.groupby("run_id").aggregate(Sum("n", alias_name="rows_ok"))
