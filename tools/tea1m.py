"""TEA tier at the 1M production shape: retry the compile at smaller
lane vectors (VERDICT r2 item 2). zc=5 failed to compile on the pool
helper (exit 1, /tmp/v3_1m.log 2026-08-19); zc=10/25 shrink l_lane
648 -> 378 / 216."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: F401  (device init before heavy imports)

from tools.v3_1m_probe import subset_gate, timing

if __name__ == "__main__":
    # settle the v2@1M correctness question on the PORTED (value-carried)
    # module — the in-probe attempt imported a mid-edit tree and TypeError'd
    subset_gate(70.0, "v2")
    for zc in (10, 25):
        if subset_gate(70.0, "v3", zc=zc, rng="tea", m=256):
            timing(70.0, zc, rng="tea", rengine="sort")
            break
    print("TEA1M_DONE", flush=True)
