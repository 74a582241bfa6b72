"""r5 session A / stage 4: device timings for configs 3/4 (VERDICT r4
item 6): edpd_slab + tdpd_diffusion decks at 98k (l=32), pair_kernel v2
vs v3 — the r3 "done" bar for the transport port.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import dataclasses

import jax
import numpy as np

print("dev:", jax.devices(), flush=True)

from meso_tpu.core.system import run_bucket_chunked
from meso_tpu.models.transport import edpd_slab, tdpd_diffusion
from meso_tpu.obs import kinetic_temperature

L = 32.0


def run(builder, name, kernel):
    try:
        system, params, state = builder(l=L, force_path="pallas", skin=0.4)
        system = system.replace(pair_kernel=kernel)
        system = system.replace(
            cells=dataclasses.replace(system.cells, rebuild_every=3,
                                      rebuild="sort"))
        n = int(state.n_valid())
        t0 = time.time()
        state, diag = run_bucket_chunked(system, params, state, 10, 3,
                                         thermo_trace=False)
        jax.block_until_ready(state.x)
        tc = time.time() - t0
        t0 = time.time()
        state, diag = run_bucket_chunked(system, params, state, 10, 3,
                                         thermo_trace=False)
        jax.block_until_ready(state.x)
        ms = (time.time() - t0) / 30 * 1e3
        kt = float(kinetic_temperature(state.v, params.mass[state.typ],
                                       state.mask))
        of = float(np.asarray(diag["bucket_overflow"]))
        sr = float(np.asarray(diag["worst_skin_ratio"]))
        extra = ""
        if state.T is not None:
            extra = f" T_mean={float(np.asarray(state.T).mean()):.4f}"
        if state.C is not None:
            extra = f" C_mean={float(np.asarray(state.C).mean()):.4f}"
        print(f"TRANSPORT {name} kern={kernel}: n={n} {ms:.2f} ms/step "
              f"({n/ms*1e3:.3e} ps/s) kT={kt:.4f} of={of:.0f} "
              f"skin_ratio={sr:.2f}{extra} (compile+warm {tc:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"TRANSPORT {name} kern={kernel} ERROR: {type(e).__name__}: "
              f"{str(e)[:800]}", flush=True)


if __name__ == "__main__":
    for kernel in ("v3", "v2"):
        run(edpd_slab, "edpd_slab", kernel)
        run(tdpd_diffusion, "tdpd_diffusion", kernel)
    print("R5A_TRANSPORT_DONE", flush=True)
