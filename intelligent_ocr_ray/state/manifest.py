"""Resumable partitioned output: manifest + done markers + fingerprints.

Engine analog of the reference's checkpoint system (core/checkpoint.py),
amortized from per-page JSON writes to per-partition commits — the
reference's own v1.0.1 postmortem (CHANGELOG.md:24: slow synchronous
flushes silently dropped pages) is the argument for coarser granularity
at 10^12-turn scale.

Parity map:
* checkpoint dir + per-doc JSON (checkpoint.py:170-197)  → run dir with
  `part=NNNN/` output dirs + `_DONE` markers + `manifest.json`;
* atomic save via tmp+os.replace (checkpoint.py:183-190) → partition
  dirs written to `_tmp-` prefix then os.rename; manifest via
  tmp+replace;
* input-hash invalidation (checkpoint.py:104-124, 220-225) → input
  fingerprint over (path, size, mtime) of every input file — cheap at
  any scale, no content read; config change invalidation
  (pdf_processor.py:1089-1093) → ExtractorConfig.fingerprint();
* done-set anti-join (pdf_processor.py:1248-1253) → resume filters the
  partition ids listed done in the manifest before any work runs;
* stale sweep (checkpoint.py:287-323) → sweep_stale_runs(max_age_h).

Scale notes: partition = `stable_hash(conv_id) % num_parts` (salted
variant available in pipelines/ordering.py) so a rerun touches only
missing partitions; the manifest stays O(num_parts), never O(rows).
"""

from __future__ import annotations

import json
import os
import time


def input_fingerprint(paths: list[str]) -> str:
    """Cheap deterministic fingerprint of the input file set: sorted
    (relpath, size, mtime_ns) triples hashed. Mirrors the intent of the
    reference's sampled-MD5 (checkpoint.py:104-124) without reading
    content — at 100 TB you fingerprint metadata, not bytes."""
    import hashlib

    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:16]


def _is_input_artifact(name: str) -> bool:
    """Reject hidden / temp artifacts the way the reference's task
    filter rejects `._*`, `*_temp.pdf`, `_ocr_temp` leftovers
    (core/task_manager.py:124-133): resume temp dirs, partial writes and
    OS metadata files must never be read back as input."""
    return (
        name.startswith(".")
        or name.startswith("_")
        or "_tmp" in name
        or name.endswith(".crc")
    )


def list_parquet_files(input_path: str) -> list[str]:
    if os.path.isfile(input_path):
        return [input_path]
    return [
        os.path.join(input_path, f)
        for f in sorted(os.listdir(input_path))
        if f.endswith(".parquet") and not _is_input_artifact(f)
    ]


def validate_transcripts(input_path: str) -> tuple[bool, str]:
    """S4 analog of validate_pdf (core/pdf_processor.py:335-360):
    openable + required columns + at least one row — all from parquet
    metadata, no data read."""
    import pyarrow.parquet as pq

    required = {"conv_id", "turn_idx", "role", "text"}
    if not os.path.exists(input_path):
        return False, f"input path does not exist: {input_path}"
    files = list_parquet_files(input_path)
    if not files:
        return False, "no parquet files"
    total = 0
    for p in files:
        try:
            meta = pq.read_metadata(p)
            names = set(pq.read_schema(p).names)
        except Exception as e:  # noqa: BLE001
            return False, f"unreadable parquet {os.path.basename(p)}: {e}"
        missing = required - names
        if missing:
            return False, f"{os.path.basename(p)} missing columns {sorted(missing)}"
        total += meta.num_rows
    if total == 0:
        return False, "zero rows"
    return True, f"{len(files)} files, {total} rows"


class RunManifest:
    """Tracks per-partition completion for one output directory.

    Layout:
      out_dir/
        manifest.json            # {input_fp, config_fp, num_parts, done: {...}}
        part=0000/  *.parquet    # committed atomically via dir rename
        part=0001/  ...
    """

    MANIFEST = "manifest.json"

    def __init__(
        self,
        out_dir: str,
        num_parts: int,
        input_fp: str,
        config_fp: str,
    ):
        self.out_dir = out_dir
        self.num_parts = num_parts
        self.input_fp = input_fp
        self.config_fp = config_fp
        os.makedirs(out_dir, exist_ok=True)
        self._path = os.path.join(out_dir, self.MANIFEST)
        self.done: dict[int, dict] = {}
        self._load()

    # -- persistence -------------------------------------------------------

    def _load(self) -> None:
        if not os.path.exists(self._path):
            return
        with open(self._path, encoding="utf-8") as f:
            data = json.load(f)
        if (
            data.get("input_fp") != self.input_fp
            or data.get("config_fp") != self.config_fp
            or data.get("num_parts") != self.num_parts
        ):
            # invalidation (checkpoint.py:220-225 / pdf_processor.py:1089-1093):
            # fingerprints changed → prior partial output is unusable
            self.done = {}
            self._clear_partitions()
            self._save()
            return
        self.done = {int(k): v for k, v in data.get("done", {}).items()}

    def _save(self) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "input_fp": self.input_fp,
                    "config_fp": self.config_fp,
                    "num_parts": self.num_parts,
                    "updated_at": time.time(),
                    "done": {str(k): v for k, v in self.done.items()},
                },
                f,
            )
        os.replace(tmp, self._path)  # atomic (checkpoint.py:183-190 analog)

    def _clear_partitions(self) -> None:
        import shutil

        for name in os.listdir(self.out_dir):
            if name.startswith("part=") or name.startswith("_tmp"):
                shutil.rmtree(os.path.join(self.out_dir, name), ignore_errors=True)

    # -- API ---------------------------------------------------------------

    def pending(self) -> list[int]:
        return [p for p in range(self.num_parts) if p not in self.done]

    def is_complete(self) -> bool:
        return len(self.done) == self.num_parts

    def progress(self) -> float:
        return len(self.done) / max(1, self.num_parts)

    def partition_dir(self, part: int) -> str:
        return os.path.join(self.out_dir, f"part={part:04d}")

    def commit_partition(
        self,
        part: int,
        tmp_dir: str,
        rows: int,
        seconds: float,
        profile: str | None = None,
        counters: str | None = None,
    ) -> None:
        """Atomically promote tmp_dir → part dir and record the lineage
        row (rows, wall seconds; ``profile`` marks partitions that were
        recovered under a degraded rerun config — the task-level R3
        analog of the reference's degraded-profile rerun,
        desktop/workers.py:357-389 — so lineage shows which partitions
        took a lower-fidelity pass)."""
        final = self.partition_dir(part)
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp_dir, final)
        entry = {"rows": rows, "seconds": round(seconds, 3)}
        if profile:
            entry["profile"] = profile
        if counters:
            # per-partition {'status|route': n} JSON computed in-pass by
            # the partition task (ProcessResult-counter analog) — lets
            # run metrics aggregate without re-reading the output
            entry["counters"] = counters
        self.done[part] = entry
        self._save()

    def profile_counts(self) -> dict[tuple[str, str], int]:
        """Aggregate the per-partition counters into {(status, route): n}."""
        out: dict[tuple[str, str], int] = {}
        for v in self.done.values():
            raw = v.get("counters")
            if not raw:
                continue
            for key, n in json.loads(raw).items():
                st, _, rt = key.partition("|")
                out[(st, rt)] = out.get((st, rt), 0) + int(n)
        return out

    def total_rows(self) -> int:
        return sum(v["rows"] for v in self.done.values())


def sweep_stale_runs(root: str, max_age_hours: float = 24.0) -> list[str]:
    """Delete run dirs whose manifest is older than max_age_hours
    (checkpoint.py:287-323 analog). Returns removed dirs."""
    import shutil

    removed = []
    if not os.path.isdir(root):
        return removed
    cutoff = time.time() - max_age_hours * 3600
    for name in os.listdir(root):
        run_dir = os.path.join(root, name)
        mpath = os.path.join(run_dir, RunManifest.MANIFEST)
        if not os.path.isfile(mpath):
            continue
        try:
            with open(mpath, encoding="utf-8") as f:
                updated = json.load(f).get("updated_at", 0)
        except (OSError, json.JSONDecodeError):
            updated = 0
        if updated < cutoff:
            shutil.rmtree(run_dir, ignore_errors=True)
            removed.append(run_dir)
    return removed
