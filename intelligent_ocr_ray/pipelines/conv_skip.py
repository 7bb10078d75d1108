"""Conversation-level existing-text skip (M1): the doc-level analog of
the reference's `check_existing_text` — a document whose pages already
carry > 100 stripped chars of text is treated as searchable and passed
through whole (core/pdf_processor.py:438-466), vs the page-level > 50
chars skip that the per-turn router (M2) already implements.

Engine form: per-conversation aggregate of existing-plain chars →
boolean flag → hash-joined back onto the turns. Two shuffles by the
same key the rest of the pipeline uses (conv_id); the flag table is one
row per conversation, so the join's build side is tiny relative to the
turns. Flagged conversations take the passthrough route for EVERY turn
— even turns that would individually have parsed as html/pdfish —
mirroring how a searchable PDF skips OCR for all pages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DOC_EXISTING_TEXT_THRESHOLD = 100  # chars (core/pdf_processor.py:455-459)


def _partial_plain_chars(batch: pa.Table) -> pa.Table:
    """Per-block partial: stripped-char count per conversation (combiner
    — the global groupby only sees O(convs-per-block) rows)."""
    # ASCII-whitespace trim (not unicode) so the DuckDB oracle's
    # trim(text, ' '||tab||cr||lf) reproduces the count bit-for-bit
    stripped = pc.utf8_trim(batch.column("text"), " \t\r\n")
    chars = pc.cast(pc.utf8_length(stripped), pa.int64()).fill_null(0)
    t = pa.table({"conv_id": batch.column("conv_id"), "chars": chars})
    return t.group_by(["conv_id"]).aggregate([("chars", "sum")]).rename_columns(
        ["conv_id", "chars"]
    )


def conv_passthrough_flags(ds, threshold: int = DOC_EXISTING_TEXT_THRESHOLD):
    """One row per conversation: ``passthrough`` = total stripped chars
    > threshold (the M1 predicate)."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        _partial_plain_chars, batch_format="pyarrow", zero_copy_batch=True
    )
    total = partial.groupby("conv_id").aggregate(Sum("chars", alias_name="total_chars"))

    def flag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "passthrough", pc.greater(t.column("total_chars"), threshold)
        )

    return total.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def apply_conv_skip(ds, flags, num_partitions: int = 16):
    """Join the flags onto the turns; flagged conversations emit their
    text unchanged with route='conv_passthrough' (whole-document copy,
    core/pdf_processor.py:527-531 writ large); the rest keep a null
    route for the downstream extractor."""
    joined = ds.join(
        flags.select_columns(["conv_id", "passthrough"]),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("conv_id",),
    )

    def mark(t: pa.Table) -> pa.Table:
        mask = np.asarray(t.column("passthrough").fill_null(False))
        route = np.where(mask, "conv_passthrough", None)
        return t.drop_columns(["passthrough"]).append_column(
            "conv_route", pa.array(route, pa.string())
        )

    return joined.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)
