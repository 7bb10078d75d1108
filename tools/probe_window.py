"""One-shot host-window probe: print the two bench calibration indices
(cpu_ref_ms single-core in-cache; cpu_ref_par_ms 32-way memory
streaming) so a record run can be gated on a verified-quiet window
without paying a full bench. Quiet (this host family): par ≲ 1200 ms.

Usage: python tools/probe_window.py [ncpus]  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

if len(sys.argv) > 1:
    os.environ["RAY_GRAFT_CPUS"] = sys.argv[1]

import bench  # noqa: E402

print(
    json.dumps(
        {
            "cpu_ref_ms": bench.cpu_ref_ms(),
            "cpu_ref_par_ms": bench.cpu_ref_par_ms(),
            "ncpus": bench.NUM_CPUS,
        }
    )
)
