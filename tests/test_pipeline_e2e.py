"""End-to-end equivalence: distributed Ray pipeline ≡ serial oracle.

Per-turn EXACT text equality under stable (conv_id, turn_idx) ordering —
the correctness gate from BASELINE.json, and the comparison the
reference's tests/test_core.py:312-345 skipped for needing models.
"""

import pyarrow as pa
import ray.data as rd

from intelligent_ocr_ray.config import ExtractorConfig
from intelligent_ocr_ray.pipelines.extract import extract_dataset, flagship, write_extracted
from intelligent_ocr_ray.pipelines.oracle import serial_extract
from intelligent_ocr_ray.sources.transcripts import generate_transcripts, write_transcripts

CFG = ExtractorConfig()


def _run_pipeline(table: pa.Table) -> pa.Table:
    ds = rd.from_arrow(table.select(["conv_id", "turn_idx", "role", "text"]))
    # several small blocks → exercises cross-block behavior
    ds = ds.repartition(8)
    out = extract_dataset(ds, CFG, batch_size=256, concurrency=2)
    out = out.sort(["conv_id", "turn_idx"])
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def _assert_tables_equal(got: pa.Table, want: pa.Table):
    assert got.num_rows == want.num_rows
    for col in ["conv_id", "turn_idx", "route", "extracted_text", "text_normalized", "status", "error"]:
        g = got.column(col).to_pylist()
        w = want.column(col).to_pylist()
        for i, (a, b) in enumerate(zip(g, w)):
            assert a == b, f"col={col} row={i}: {a!r} != {b!r}"
    # spans compared structurally
    gs = got.column("spans").to_pylist()
    ws = want.column("spans").to_pylist()
    assert gs == ws


def test_pipeline_matches_serial_oracle():
    table = generate_transcripts(60, seed=7)
    got = _run_pipeline(table)
    want = serial_extract(table, CFG)
    _assert_tables_equal(got, want)


def test_completeness_every_turn_survives():
    """Never drop a row (reference gap-fill + page-count assertion,
    core/pdf_processor.py:1585-1603)."""
    table = generate_transcripts(40, seed=11, dup_every=0)
    got = _run_pipeline(table)
    assert got.num_rows == table.num_rows
    in_counts = table.group_by("conv_id").aggregate([("turn_idx", "count")])
    out_counts = got.group_by("conv_id").aggregate([("turn_idx", "count")])
    assert sorted(in_counts.to_pylist(), key=lambda r: r["conv_id"]) == sorted(
        out_counts.to_pylist(), key=lambda r: r["conv_id"]
    )


def test_flagship_from_parquet(tmp_path):
    src = str(tmp_path / "transcripts")
    write_transcripts(src, 20, seed=5, rows_per_file=50)
    ds = flagship(src, CFG, concurrency=2, batch_size=128)
    out_dir = str(tmp_path / "out")
    write_extracted(ds, out_dir)
    import pyarrow.parquet as pq

    got = pq.read_table(out_dir)
    got = got.take(
        pa.compute.sort_indices(
            got, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )
    want = serial_extract(generate_transcripts(20, seed=5), CFG)
    assert got.column("extracted_text").to_pylist() == want.column("extracted_text").to_pylist()
    assert got.column("status").to_pylist() == want.column("status").to_pylist()


def test_ordering_is_stable():
    table = generate_transcripts(25, seed=3, dup_every=0)
    got = _run_pipeline(table)
    keys = list(zip(got.column("conv_id").to_pylist(), got.column("turn_idx").to_pylist()))
    assert keys == sorted(keys)


def test_input_without_optional_tool_column(tmp_path):
    """An input that satisfies validate_transcripts' 4-column contract
    but lacks the optional `tool` provenance must run end-to-end (the
    read prunes to available columns instead of demanding them)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from intelligent_ocr_ray.pipelines.resumable import audit_completeness, run_resumable
    from intelligent_ocr_ray.state.manifest import validate_transcripts

    src = str(tmp_path / "in")
    os.makedirs(src)
    t = pa.table(
        {
            "conv_id": pa.array(["a", "a", "b"]),
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "role": pa.array(["user", "assistant", "user"]),
            "text": pa.array(["hello world", None, "x" * 60]),
        }
    )
    pq.write_table(t, os.path.join(src, "d.parquet"))
    ok, _ = validate_transcripts(src)
    assert ok
    m = run_resumable(src, str(tmp_path / "out"), num_parts=2, fuse_extract=True)
    complete, n_in, n_out = audit_completeness(src, m)
    assert complete and n_in == n_out == 3


def test_two_runs_byte_identical(tmp_path):
    """Determinism end-to-end: two independent fused runs over the same
    input produce BYTE-identical ordered outputs (the property the
    exact-match oracle and resumability both rest on)."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from intelligent_ocr_ray.pipelines.resumable import read_output, run_resumable
    from intelligent_ocr_ray.sources.transcripts import write_transcripts

    src = write_transcripts(str(tmp_path / "in"), 60, seed=17)

    def run_and_hash(out: str) -> str:
        run_resumable(src, out, num_parts=4, fuse_extract=True)
        t = read_output(out).sort(["conv_id", "turn_idx"]).to_pandas()
        return hashlib.sha256(
            t.to_csv(index=False).encode("utf-8", "surrogatepass")
        ).hexdigest()

    h1 = run_and_hash(str(tmp_path / "o1"))
    h2 = run_and_hash(str(tmp_path / "o2"))
    assert h1 == h2


def test_mixed_shard_schemas_tool_in_some_files(tmp_path):
    """Shards disagreeing on the OPTIONAL tool column (some carry it,
    some don't) run end-to-end: the read intersects schemas across all
    files, so neither listing order nor per-file presence matters."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from intelligent_ocr_ray.pipelines.resumable import audit_completeness, run_resumable

    src = str(tmp_path / "in")
    os.makedirs(src)
    with_tool = pa.table(
        {
            "conv_id": pa.array(["a", "a"]),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": pa.array(["user", "assistant"]),
            "text": pa.array(["hello there", "y" * 70]),
            "tool": pa.array(["", "search"]),
        }
    )
    without_tool = with_tool.drop_columns(["tool"]).set_column(
        0, "conv_id", pa.array(["b", "b"])
    )
    # both orders on disk (listing is sorted by name)
    pq.write_table(with_tool, os.path.join(src, "a_with.parquet"))
    pq.write_table(without_tool, os.path.join(src, "b_without.parquet"))
    m = run_resumable(src, str(tmp_path / "out"), num_parts=2, fuse_extract=True)
    ok, n_in, n_out = audit_completeness(src, m)
    assert ok and n_in == n_out == 4
