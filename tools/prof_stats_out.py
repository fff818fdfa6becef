#!/usr/bin/env python
"""Profile the stats+out stage (the align driver's PEworker-analog
thread) at production scale: wraps PairEndMapper._stats_out in a
cProfile that enables only for the stage's duration on whatever thread
runs it, then drives the cached stress world's align stage.

Usage: FQ_STRESS_DIR=/tmp/fq_stress_world python tools/prof_stats_out.py
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("FQ_STRESS_STAGES", "align")
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "0")


def main() -> int:
    from fastquick_tpu.align import driver

    prof = cProfile.Profile()
    orig = driver.PairEndMapper._stats_out

    def wrapped(self, b0, b1, fsc):
        prof.enable()
        try:
            orig(self, b0, b1, fsc)
        finally:
            prof.disable()

    driver.PairEndMapper._stats_out = wrapped

    import tools.stress_production_scale as sp

    sp.run()
    prof.dump_stats("/tmp/stats_out.prof")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(35)
    return 0


if __name__ == "__main__":
    sys.exit(main())
