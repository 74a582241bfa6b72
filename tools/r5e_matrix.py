"""r5 session E: disambiguate the in-loop 87 ms regression.

Matrix evidence so far (1M, equilibrated, in-loop ms/step):
  static zc5 + wrap=rebuild + virial ON  (r5a, pre-nv)  : 60.9
  ring   zc5 + wrap=rebuild + nv         (r5b)          : 86.8
  dynroll zc2 + wrap=rebuild + nv        (r5d)          : 87.0
  ring   zc5 + wrap=step    + nv         (r5c)          : 63.5
Suspect: the need_virial=False program interacts with the wrap=rebuild
chunk loop (XLA donation/fusion). This measures the missing cells on
the SHIPPED kernel. The winner becomes the bench rung-1 config.
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
from meso_tpu.io.restart import load_restart

EQ_PATH = "/tmp/r5_eq1m.npz"
eq = load_restart(EQ_PATH) if os.path.exists(EQ_PATH) else None


def cell(kernel, zc, wrap, trace, label):
    try:
        sy, pa, st = classic_fluid(
            l=70.0, rebuild_every=3, skin=0.4, rng_mode="fast",
            force_path="pallas", pair_kernel=kernel, rebuild="sort",
            wrap_mode=wrap, z_chunks=zc)
        sy = sy.replace(lam=0.65)
        if eq is not None:
            st = st.replace(x=eq.x, v=eq.v, f=eq.f, typ=eq.typ, tag=eq.tag,
                            mask=eq.mask, image=eq.image, step=eq.step)
        n = int(st.n_valid())
        st, dg = run_bucket_chunked(sy, pa, st, 10, 3, thermo_trace=trace)
        jax.block_until_ready(st.x)
        t0 = time.time()
        st, dg = run_bucket_chunked(sy, pa, st, 20, 3, thermo_trace=trace)
        jax.block_until_ready(st.x)
        ms = (time.time() - t0) / 60 * 1e3
        of = float(np.asarray(dg["bucket_overflow"]))
        sr = float(np.asarray(dg["worst_skin_ratio"]))
        print(f"CELL {label}: {ms:.1f} ms/step ({n/ms*1e3:.3e} ps/s) "
              f"of={of:.0f} sr={sr:.3f}", flush=True)
    except Exception as e:
        print(f"CELL {label} ERROR: {type(e).__name__}: {str(e)[:400]}",
              flush=True)


if __name__ == "__main__":
    # suspect cell first, then its virial-ON twin (trace=True => nv off)
    cell("v3", 5, "rebuild", False, "static-zc5-rebuild-nv")
    cell("v3", 5, "rebuild", True, "static-zc5-rebuild-vir")
    cell("v3", 5, "step", False, "static-zc5-step-nv")
    cell("v3_dynroll", 2, "rebuild", True, "dynroll-zc2-rebuild-vir")
    cell("v3_dynroll", 2, "step", False, "dynroll-zc2-step-nv")
    print("R5E_DONE", flush=True)
