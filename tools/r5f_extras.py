"""r5 session F (short): two record completions, then leave the worker
alone for the driver's closing bench.

1. The production config at 98k (l=32) — a second scale point for the
   throughput record.
2. Config 2 (Poiseuille walls) device timing — walls need per-step
   wrapping + post-integrate fixes, so they run wrap=step with the
   static-zc kernel; this completes per-config device coverage.
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


def classic_98k():
    try:
        sy, pa, st = classic_fluid(
            l=32.0, rebuild_every=3, skin=0.4, rng_mode="fast",
            force_path="pallas", pair_kernel="v3_dynroll", rebuild="sort",
            wrap_mode="rebuild", z_chunks=2)
        sy = sy.replace(lam=0.65)
        n = int(st.n_valid())
        st, _ = run_bucket_chunked(sy, pa, st, 134, 3, thermo_trace=False)
        jax.block_until_ready(st.x)
        t0 = time.time()
        st, dg = run_bucket_chunked(sy, pa, st, 67, 3, thermo_trace=False)
        jax.block_until_ready(st.x)
        ms = (time.time() - t0) / 201 * 1e3
        kt = float(kinetic_temperature(st.v, pa.mass[st.typ], st.mask))
        of = float(np.asarray(dg["bucket_overflow"]))
        sr = float(np.asarray(dg["worst_skin_ratio"]))
        print(f"CLASSIC_98K production config: {ms:.2f} ms/step "
              f"({n/ms*1e3:.3e} ps/s) kT={kt:.4f} of={of:.0f} sr={sr:.3f}",
              flush=True)
    except Exception as e:
        print(f"98K ERROR: {type(e).__name__}: {str(e)[:600]}", flush=True)


def poiseuille_dev():
    try:
        from meso_tpu.models.walls import poiseuille
        sy, pa, st = poiseuille(lx=24.0, h=22.0, lz=24.0, force_path="pallas")
        n = int(st.n_valid())
        st, _ = run_bucket_chunked(sy, pa, st, 50, 3, thermo_trace=False)
        jax.block_until_ready(st.x)
        t0 = time.time()
        st, dg = run_bucket_chunked(sy, pa, st, 50, 3, thermo_trace=False)
        jax.block_until_ready(st.x)
        ms = (time.time() - t0) / 150 * 1e3
        of = float(np.asarray(dg["bucket_overflow"]))
        print(f"POISEUILLE config-2 device: n={n} {ms:.2f} ms/step "
              f"({n/ms*1e3:.3e} ps/s) of={of:.0f}", flush=True)
    except Exception as e:
        print(f"POISEUILLE ERROR: {type(e).__name__}: {str(e)[:600]}",
              flush=True)


if __name__ == "__main__":
    classic_98k()
    poiseuille_dev()
    print("R5F_DONE", flush=True)
