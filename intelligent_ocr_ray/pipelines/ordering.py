"""Stable (conv_id, turn_idx) ordering + skew-aware partitioning.

The reference restores insertion order after its out-of-order parallel
path with a permutation select (core/pdf_processor.py:1465-1472; in-batch
sorted iteration at 1348). Ray Data gives NO cross-block ordering, so the
stable order the oracle requires is imposed explicitly here.

Two strategies, both shuffle-efficient:

* ``sort_stable`` — one global range-partitioned ``ds.sort`` on
  ``(conv_id, turn_idx)``. Ray's sort samples key ranges, so hot
  conversations (mega_conv skew fixture) are split across range
  boundaries by the *composite* key — a single conversation never pins a
  single reducer the way a hash ``groupby(conv_id)`` would. This is the
  default and the only required shuffle in the flagship pipeline
  (SURVEY.md §7 step 5).

* ``repartition_by_conv`` — adds a deterministic ``part`` column
  ``hash(conv_id) % num_parts`` (salted for mega-conversations with
  ``turn_idx // salt_turns`` when requested) for groupby-style ops and
  for the resumable partitioned output layout. Salting bounds the rows
  any single reducer sees from one conversation; callers that need
  whole-conversation semantics must combine partials across salted
  sub-keys (mergeable-partial pattern).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sort_stable(ds):
    """Global stable order: the oracle's ordering requirement (O1)."""
    return ds.sort(["conv_id", "turn_idx"])


def sort_within_batch(batch: pa.Table) -> pa.Table:
    """Cheap per-block ordering (reference's sorted in-batch iteration,
    core/pdf_processor.py:1348) — used before per-partition writes when a
    global sort is unnecessary."""
    keys = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    return batch.take(pc.sort_indices(batch, sort_keys=keys))


def _stable_hash_strings(arr: pa.ChunkedArray | pa.Array, num_parts: int) -> np.ndarray:
    """Deterministic (process-independent) string hash → [0, num_parts).

    Python's builtin hash() is salted per process — never use it for
    partitioning. A cheap FNV-1a over utf-8 bytes, vectorized enough for
    a partitioning column (one pass per unique value via dictionary
    encoding: conversations repeat, so hash unique values only).
    """
    darr = pc.dictionary_encode(arr)
    if isinstance(darr, pa.ChunkedArray):
        darr = darr.combine_chunks()
    uniq = darr.dictionary.to_pylist()
    uhash = np.empty(len(uniq), dtype=np.int64)
    for i, s in enumerate(uniq):
        h = hashlib.md5(s.encode("utf-8"), usedforsecurity=False).digest()
        uhash[i] = int.from_bytes(h[:8], "little", signed=False) % num_parts
    return uhash[np.asarray(darr.indices)]


def add_partition_column(
    batch: pa.Table,
    num_parts: int,
    salt_turns: int | None = None,
    col: str = "part",
) -> pa.Table:
    """Append ``part = hash(conv_id) % num_parts`` (optionally salted by
    ``turn_idx // salt_turns`` so mega-conversations spread across
    several partitions; required by the north rule's explicit skew
    handling)."""
    part = _stable_hash_strings(batch.column("conv_id"), num_parts)
    if salt_turns:
        salt = np.asarray(
            pc.divide(pc.cast(batch.column("turn_idx"), pa.int64()), salt_turns)
        )
        part = (part + salt * 1_000_003) % num_parts
    return batch.append_column(col, pa.array(part.astype(np.int32), pa.int32()))


def with_partitions(ds, num_parts: int, salt_turns: int | None = None):
    return ds.map_batches(
        add_partition_column,
        fn_kwargs={"num_parts": num_parts, "salt_turns": salt_turns},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
