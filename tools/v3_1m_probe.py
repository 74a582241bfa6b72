"""v3 kernel at 1M with EXPLICIT z-chunking (r3 follow-up).

r3_session stage 2 fact: v3 at l=70 (auto z_chunks -> zc=2, nzc=25,
l_lane=1458) fails to COMPILE (remote helper exit 1) while l=32
(zc=1, l_lane=572) compiles and runs 2.1x faster than v2. v2 at 1M runs
z_chunks=5. Hypothesis: the v3 static-unroll body at l_lane ~1500 blows
a compile-time or scoped-VMEM limit; smaller chunks should compile.

Probes zc = 5 then 10 at l=70, single attempt each, printing the FULL
error text. If a zc compiles, times the production loop on it.

Run alone (one device client): nohup python tools/v3_1m_probe.py > LOG &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import numpy as np

print("dev:", jax.devices(), flush=True)

from meso_tpu.core.system import run_bucket_chunked
from meso_tpu.models.classic import classic_fluid
from meso_tpu.obs import kinetic_temperature


def timing(l, zc, skin=0.4, every=3, steps=30, rng="fast", wrap="step",
           rengine="gather", kernel="v3"):
    try:
        system, params, state = classic_fluid(
            l=l, rebuild_every=every, skin=skin, rng_mode=rng,
            force_path="pallas", pair_kernel=kernel, rebuild=rengine,
            wrap_mode=wrap, z_chunks=zc)
        n = int(state.n_valid())
        nch = max(steps // every, 1)
        t0 = time.time()
        state, diag = run_bucket_chunked(system, params, state, nch, every)
        jax.block_until_ready(state.x)
        tc = time.time() - t0
        t0 = time.time()
        state, diag = run_bucket_chunked(system, params, state, nch, every)
        jax.block_until_ready(state.x)
    except Exception as e:
        print(f"ERROR l={l} zc={zc} rng={rng} wrap={wrap}: "
              f"{type(e).__name__}: {str(e)[:2000]}", flush=True)
        return None
    dt = (time.time() - t0) / (nch * every)
    kt = float(kinetic_temperature(state.v, params.mass[state.typ],
                                   state.mask))
    of = float(np.max(np.asarray(diag.get("bucket_overflow", 0))))
    sr = float(np.max(np.asarray(diag.get("worst_skin_ratio", 0.0))))
    print(f"TIMING l={l} n={n} kern={kernel} zc={zc} skin={skin} "
          f"every={every} rng={rng} wrap={wrap} rb={rengine}: "
          f"{dt * 1e3:.1f} ms/step ({n / dt:.3e} ps/s) kT={kt:.4f} "
          f"of={of:.0f} skin_ratio={sr:.2f} compile+warm={tc:.0f}s",
          flush=True)
    return dt


if __name__ == "__main__":
    # zc ladder at the production config; stop at the first one that runs
    for zc in (5, 10, 25):
        if timing(70.0, zc) is not None:
            # it compiles: measure the sort rebuild engine on it too
            timing(70.0, zc, rengine="sort")
            break
    print("V3_1M_PROBE_DONE", flush=True)
