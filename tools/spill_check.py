"""Object-store-pressure check: run the fused flagship through a Ray
object store far smaller than the working set and verify (a) the run
completes with a clean audit and (b) Ray actually spilled — evidence
the pipeline leans on streaming + spill rather than assuming the corpus
fits in plasma (the "let the object store spill" design rule).

Usage: PYTHONPATH=/root/repo python tools/spill_check.py [n_convs] [store_mb]
Prints one JSON line {completed, rows, spilled_mb}.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import sys


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000  # ~0.8M turns
    store_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    import ray

    ctx = ray.init(
        address="local",
        num_cpus=8,
        object_store_memory=store_mb * 1024 * 1024,  # far below the working set
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from intelligent_ocr_ray.pipelines.resumable import (
        audit_completeness,
        run_resumable,
        suggest_layout,
    )
    from intelligent_ocr_ray.sources.transcripts import cached_transcripts_dir

    src = cached_transcripts_dir(n_convs=n_convs, seed=42)
    out = "/tmp/ior_spill_check_out"
    shutil.rmtree(out, ignore_errors=True)
    parts, blocks = suggest_layout(src)
    manifest = run_resumable(
        src, out, num_parts=parts, fuse_extract=True, read_num_blocks=blocks
    )
    ok, n_in, n_out = audit_completeness(src, manifest)

    # spill evidence from THIS session's raylet log (the session dir
    # comes from the init context — a hardcoded /tmp path only works
    # where RAY_TMPDIR happens to point there)
    session = ctx.address_info.get("session_dir", "")
    spilled_mb = 0
    for logf in glob.glob(os.path.join(session, "logs", "raylet.out")):
        for line in open(logf, errors="ignore"):
            m = re.search(r"Spilled (\d+) MiB", line)
            if m:
                spilled_mb = max(spilled_mb, int(m.group(1)))
    ray.shutdown()
    print(
        json.dumps(
            {"completed": ok, "rows": n_out, "rows_in": n_in, "spilled_mb": spilled_mb}
        )
    )


if __name__ == "__main__":
    main()
