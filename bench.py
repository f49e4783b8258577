"""Headline benchmark entry point (driver contract).

Prints ONE JSON line. Thin wrapper over tpupose.benchmark so the logic
is importable from the installed package as well (`tpupose bench`).
"""

import os
import sys

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

from tpupose import benchmark

if __name__ == "__main__":
    benchmark.main(baseline_cache=os.path.join(ROOT, "bench_baseline.json"))
