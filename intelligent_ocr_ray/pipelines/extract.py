"""Flagship pipeline: transcripts → unified extractor → stable order.

Engine analog of the reference's `process_file_pipelined`
(core/pdf_processor.py:1018-1646), re-expressed as a lazy Ray Data
pipeline: read (pruned) → actor-pool extract → order restore → write.
The streaming executor gives the render∥OCR overlap (reference's bounded
queue, core/pdf_processor.py:1156-1161) and backpressure for free.
"""

from __future__ import annotations

import os

import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, ExtractorConfig
from ..stages.extractor import ExtractTurns
from .ordering import sort_stable

INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool"]
# columns validate_transcripts requires; the rest (tool) are optional
# provenance that rides along when present
REQUIRED_COLUMNS = ("conv_id", "turn_idx", "role", "text")


def auto_concurrency(reserve: int = 2) -> int:
    """Actor-pool size: total CPUs minus headroom for read/write stages
    (a pool that reserves every CPU starves the other stages and the
    pipeline serializes)."""
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    else:
        cpus = 8
    return max(2, cpus - reserve)


def read_transcripts(path: str, num_blocks: int | None = None) -> rd.Dataset:
    """Column-pruned read: only the columns the extractor needs leave
    storage (`ts` always stays behind; `tool` rides along only when the
    input HAS it — an input that passes validate_transcripts' 4-column
    contract must not crash the read because optional provenance is
    absent)."""
    import pyarrow.parquet as pq

    from ..state.manifest import list_parquet_files

    files = list_parquet_files(path)
    if not files:
        raise ValueError(f"no parquet files under {path}")
    # intersect across ALL files (footer reads only): a mixed input
    # where some shards carry `tool` and some don't must neither crash
    # mid-read nor depend on directory listing order
    avail = set(pq.read_schema(files[0]).names)
    for f in files[1:]:
        avail &= set(pq.read_schema(f).names)
    cols = [c for c in INPUT_COLUMNS if c in avail or c in REQUIRED_COLUMNS]
    return rd.read_parquet(path, columns=cols, override_num_blocks=num_blocks)


def _sort_block_count(path: str) -> int:
    """Block count for the order-restore shuffle: ~64 MB of input per
    block, clamped to [8, 4096]. Shuffle cost scales with block-PAIR
    count (n_map × n_reduce object exchanges): sf0.1 sort-only wall
    measured 16.7 s at the 225 default blocks, 4.9 s at 32, 2.1-3.0 s at
    16 — so the sort runs COARSE and the post-sort map stage re-splits
    (shuffle-free repartition) to regain task parallelism."""
    total = 0
    if os.path.isdir(path):
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(path, f))
    elif os.path.isfile(path):
        total = os.path.getsize(path)
    return max(8, min(4096, total // (64 << 20)))


def extract_dataset(
    ds: rd.Dataset,
    config: ExtractorConfig = DEFAULT_CONFIG,
    *,
    batch_size: int = 4096,
    concurrency: int | tuple[int, int] | None = None,
    use_actors: bool = False,
    use_ladder: bool = False,
) -> rd.Dataset:
    """Attach the unified extractor to a transcripts Dataset.

    ``use_ladder=True`` enables the per-row R3 degradation ladder:
    rows whose extraction fails retry under progressively more lenient
    profiles inside the same pass (functions.extract.degraded_ladder).

    Two physical forms, same semantics:
    * stateless tasks (default) with a once-per-worker-process extractor
      cache — the reference's module-global engine pattern
      (core/parallel_ocr.py:149-173); elastic, no pool dispatch cost.
      Right while per-worker state is cheap (variant dict + regexes).
    * actor pool (``use_actors=True``) — the ST1 pattern for genuinely
      heavy state (real model weights pinned per actor,
      core/ocr_engine.py:193-310): state built once in ``__init__``.
    """
    if use_actors:
        if concurrency is None:
            concurrency = auto_concurrency()
        return ds.map_batches(
            ExtractTurns,
            fn_constructor_kwargs={"config": config, "use_ladder": use_ladder},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    from ..stages.extractor import extract_batch

    return ds.map_batches(
        extract_batch,
        fn_kwargs={"config": config, "use_ladder": use_ladder},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def flagship(
    input_path: str,
    config: ExtractorConfig = DEFAULT_CONFIG,
    *,
    ordered: bool = True,
    batch_size: int = 4096,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """read → stable order → extract. Lazy; consume with write/iter.

    The order-restore shuffle (O1) runs on the NARROW INPUT, not the
    extracted output: extraction is a deterministic per-row map and the
    executor is pinned to order-preserving mode, so sorting first gives
    the identical final order while shuffling ~3× fewer bytes (the
    output's spans column aliases every extracted string again). Sort
    uses the polars kernel (measured ~2.4× faster than the default
    pyarrow path on string keys at sf0.1)."""
    if ordered:
        # The read snapshots a COPY of the current DataContext into the
        # plan (ray.data.read_api passes DataContext.get_current().copy()),
        # so setting the flags around dataset CONSTRUCTION pins them for
        # this pipeline's whole execution while the process-global
        # context is restored for every later, unrelated Dataset.
        ctx = rd.DataContext.get_current()
        prev_polars = ctx.use_polars_sort
        prev_order = ctx.execution_options.preserve_order
        ctx.use_polars_sort = True
        # block order must survive the post-sort map stage or the sort
        # is decorative — out-of-order completion may not reassemble
        ctx.execution_options.preserve_order = True
        try:
            ds = sort_stable(read_transcripts(input_path, _sort_block_count(input_path)))
            # shuffle-free re-split: the sort ran on few fat blocks (cheap
            # exchange); the extract stage wants ≥ one block per worker
            ds = ds.repartition(target_num_rows_per_block=65536)
        finally:
            ctx.use_polars_sort = prev_polars
            ctx.execution_options.preserve_order = prev_order
    else:
        ds = read_transcripts(input_path)
    return extract_dataset(
        ds,
        config,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def write_extracted(ds: rd.Dataset, out_dir: str, rows_per_file: int = 50_000) -> str:
    """Partitioned parquet sink (a directory of part files — resumable
    layout handled one level up in state/manifest.py)."""
    os.makedirs(out_dir, exist_ok=True)
    try:
        ds.write_parquet(out_dir, min_rows_per_file=rows_per_file)
    except TypeError:  # older Ray releases
        ds.write_parquet(out_dir, num_rows_per_file=rows_per_file)
    return out_dir
