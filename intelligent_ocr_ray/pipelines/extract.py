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

INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text"]


def auto_concurrency(reserve: int = 2) -> int:
    """Actor-pool size: total CPUs minus headroom for read/write stages
    (a pool that reserves every CPU starves the other stages and the
    pipeline serializes)."""
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    else:
        cpus = 8
    return max(2, cpus - reserve)


def read_transcripts(path: str) -> rd.Dataset:
    """Column-pruned read: only the columns the extractor needs leave
    storage (`tool`/`ts` stay behind unless a caller asks)."""
    return rd.read_parquet(path, columns=INPUT_COLUMNS)


def extract_dataset(
    ds: rd.Dataset,
    config: ExtractorConfig = DEFAULT_CONFIG,
    *,
    batch_size: int = 4096,
    concurrency: int | tuple[int, int] | None = None,
    use_actors: bool = False,
) -> rd.Dataset:
    """Attach the unified extractor to a transcripts Dataset.

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
            fn_constructor_kwargs={"config": config},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    from ..stages.extractor import extract_batch

    return ds.map_batches(
        extract_batch,
        fn_kwargs={"config": config},
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
    """read → extract → (stable order). Lazy; consume with write/iter."""
    ds = extract_dataset(
        read_transcripts(input_path),
        config,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if ordered:
        ds = sort_stable(ds)
    return ds


def write_extracted(ds: rd.Dataset, out_dir: str, rows_per_file: int = 200_000) -> str:
    """Partitioned parquet sink (a directory of part files — resumable
    layout handled one level up in state/manifest.py)."""
    os.makedirs(out_dir, exist_ok=True)
    try:
        ds.write_parquet(out_dir, min_rows_per_file=rows_per_file)
    except TypeError:  # older Ray releases
        ds.write_parquet(out_dir, num_rows_per_file=rows_per_file)
    return out_dir
