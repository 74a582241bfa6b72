"""r5 session A / stage 6: re-autotune the 1M production point now that
the rebuild is 2.6x cheaper (VERDICT r4 item 7). Sweeps (skin, every, zc)
on 30-step timings from the equilibrated state; overflow/skin-ratio
invariants reported per point so unphysical optima are rejected.
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
from meso_tpu.io.restart import load_restart

EQ_PATH = "/tmp/r5_eq1m.npz"


def point(skin, every, zc, wrap="step"):
    try:
        system, params, state = classic_fluid(
            l=70.0, rebuild_every=every, skin=skin, rng_mode="fast",
            force_path="pallas", pair_kernel="v3", rebuild="sort",
            wrap_mode=wrap, z_chunks=zc)
        if os.path.exists(EQ_PATH):
            eq = load_restart(EQ_PATH)
            if eq.x.shape == state.x.shape:
                state = state.replace(x=eq.x, v=eq.v, f=eq.f, typ=eq.typ,
                                      tag=eq.tag, mask=eq.mask,
                                      image=eq.image, step=eq.step)
            else:
                # different ncell/K -> different row count: equilibrate
                # fresh instead (probe states must be physical)
                state, _ = run_bucket_chunked(system, params, state, 40, 3,
                                              thermo_trace=False)
        n = int(state.n_valid())
        nch = max(30 // every, 1)
        t0 = time.time()
        state, diag = run_bucket_chunked(system, params, state, nch, every,
                                         thermo_trace=False)
        jax.block_until_ready(state.x)
        tc = time.time() - t0
        t0 = time.time()
        state, diag = run_bucket_chunked(system, params, state, nch, every,
                                         thermo_trace=False)
        jax.block_until_ready(state.x)
        steps = nch * every
        ms = (time.time() - t0) / steps * 1e3
        kt = float(kinetic_temperature(state.v, params.mass[state.typ],
                                       state.mask))
        of = float(np.asarray(diag["bucket_overflow"]))
        sr = float(np.asarray(diag["worst_skin_ratio"]))
        flag = " INVALID" if (of > 0 or sr > 1.0) else ""
        print(f"TUNE skin={skin} every={every} zc={zc} wrap={wrap} "
              f"K={system.cells.capacity} ncell={system.cells.ncell[0]}: "
              f"{ms:.1f} ms/step ({n/ms*1e3:.3e} ps/s) kT={kt:.4f} "
              f"of={of:.0f} sr={sr:.3f}{flag} (c{tc:.0f}s)", flush=True)
    except Exception as e:
        print(f"TUNE skin={skin} every={every} zc={zc} ERROR: "
              f"{type(e).__name__}: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    # baseline point first (sanity anchor), then the sweep
    point(0.4, 3, 5)
    point(0.4, 2, 5)
    point(0.4, 4, 5)
    point(0.4, 5, 5)
    point(0.35, 3, 17)  # ncell 51 (zc must divide ncz; 51 = 3*17)
    point(0.35, 2, 17)
    point(0.45, 4, 6)   # ncell 48; K may overflow (r3: 0.47 -> of)
    point(0.4, 3, 10)
    print("R5A_TUNE_DONE", flush=True)
