"""Export sinks: per-conversation TXT / Markdown projections of an
extracted dataset — the engine analogs of the reference's exporters
(export_txt with `--- 第 N 页 ---` page separators,
core/pdf_processor.py:204-232; export_md_text_only / export_md,
235-271 / 274-332).

The reference assembles one text/markdown file per document from its
pages in order; here one output ROW per conversation is assembled from
its turns in order (groupby(conv_id).map_groups with an in-group sort —
the same single shuffle key as everything else), then written as
parquet or JSON. Page separators become turn separators; the MD
role-header variant mirrors export_md's page headings.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TXT_SEPARATOR = "--- turn {n} ---"


def _assemble(group: pa.Table, fmt: str) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[("turn_idx", "ascending")])
    g = group.take(order)
    conv = g.column("conv_id")[0].as_py()
    idxs = g.column("turn_idx").to_pylist()
    texts = g.column("extracted_text").to_pylist()
    if fmt == "txt":
        parts = [
            f"{TXT_SEPARATOR.format(n=i)}\n{t or ''}" for i, t in zip(idxs, texts)
        ]
    else:  # md: role headings, like export_md's per-page headings
        roles = g.column("role").to_pylist()
        parts = [
            f"## turn {i} ({r})\n\n{t or ''}" for i, r, t in zip(idxs, roles, texts)
        ]
    body = "\n\n".join(parts)
    return pa.table(
        {
            "conv_id": pa.array([conv], pa.string()),
            "n_turns": pa.array([g.num_rows], pa.int64()),
            "content": pa.array([body], pa.string()),
        }
    )


def conversation_text(ds, fmt: str = "txt"):
    """One row per conversation: turns joined in stable order with
    separators. ``fmt`` = 'txt' | 'md'."""
    import functools

    if fmt not in ("txt", "md"):
        raise ValueError(f"fmt must be 'txt' or 'md', got {fmt!r}")
    return ds.groupby("conv_id").map_groups(
        functools.partial(_assemble, fmt=fmt), batch_format="pyarrow"
    )


def export_txt(ds, out_dir: str) -> None:
    """S6 analog: write the per-conversation text view as parquet (one
    file per block — resumable layout, never one giant file)."""
    conversation_text(ds, "txt").write_parquet(out_dir)


def export_md(ds, out_dir: str) -> None:
    """S7 analog (text-only markdown variant)."""
    conversation_text(ds, "md").write_parquet(out_dir)


def export_jsonl(ds, out_dir: str) -> None:
    """S8-style row-record export (JSONL via Ray's JSON datasink)."""
    ds.write_json(out_dir)
