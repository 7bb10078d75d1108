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


def _assemble_md_media(group: pa.Table, out_dir: str, media_col: str) -> pa.Table:
    """One conversation → markdown with media links + sidecar media
    files (the S7 FULL analog of the reference's export_md, which writes
    page PNGs at zoom 2.0 next to the markdown,
    core/pdf_processor.py:274-332). Media bytes are written by the
    worker directly under ``out_dir/media/<conv>/`` — shared storage on
    a real cluster, same contract as partition writes."""
    import os

    order = pc.sort_indices(group, sort_keys=[("turn_idx", "ascending")])
    g = group.take(order)
    conv = g.column("conv_id")[0].as_py()
    idxs = g.column("turn_idx").to_pylist()
    texts = g.column("extracted_text").to_pylist()
    roles = g.column("role").to_pylist()
    media = g.column(media_col).to_pylist() if media_col in g.schema.names else [None] * g.num_rows
    media_dir = os.path.join(out_dir, "media", conv)
    parts: list[str] = []
    n_media = 0
    for i, r, t, m in zip(idxs, roles, texts, media):
        block = f"## turn {i} ({r})\n\n{t or ''}"
        if m is not None:
            rel = f"media/{conv}/turn-{i:05d}.bin"
            os.makedirs(media_dir, exist_ok=True)
            with open(os.path.join(out_dir, rel), "wb") as f:
                f.write(m)
            block += f"\n\n![turn {i}]({rel})"
            n_media += 1
        parts.append(block)
    return pa.table(
        {
            "conv_id": pa.array([conv], pa.string()),
            "n_turns": pa.array([g.num_rows], pa.int64()),
            "n_media": pa.array([n_media], pa.int64()),
            "content": pa.array(["\n\n".join(parts)], pa.string()),
        }
    )


def export_md_media(ds, out_dir: str, media_col: str = "image"):
    """S7 full variant: markdown WITH media sidecars. ``ds`` carries the
    usual turn columns plus an opaque binary media column (the
    multimodal pipeline's layout); rows with a null media payload export
    text-only. Returns the per-conversation Dataset (also written as
    parquet under out_dir)."""
    import functools
    import os

    os.makedirs(out_dir, exist_ok=True)
    conv = ds.groupby("conv_id").map_groups(
        functools.partial(_assemble_md_media, out_dir=out_dir, media_col=media_col),
        batch_format="pyarrow",
    )
    # materialize ONCE: the group task writes media sidecars as a side
    # effect, so a lazy hand-back would re-write every file on each
    # consumer iteration; parquet goes to a subdir so a reader of the
    # conversation view never trips over media/*.bin
    conv = conv.materialize()
    conv.write_parquet(os.path.join(out_dir, "conversations"))
    return conv


def export_jsonl(ds, out_dir: str) -> None:
    """S8-style row-record export (JSONL via Ray's JSON datasink)."""
    ds.write_json(out_dir)
