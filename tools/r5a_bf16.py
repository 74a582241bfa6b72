"""r5 session A / stage 5: close the bf16_v verdict (VERDICT r4 item 5 —
third ask). The flag lives in the v2 fused kernel (bf16 velocity band
refs, fp32 staging); the device gate passes at 3.19e-4 rel since the r3
value-carried port. This measures whether the halved v-channel bandwidth
buys anything at 1M — the decision datum for adopt-or-delete.
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


def timing(bf16_v):
    system, params, state = classic_fluid(
        l=70.0, rebuild_every=3, skin=0.4, rng_mode="fast",
        force_path="pallas", pair_kernel="v2", rebuild="sort", z_chunks=5)
    system = system.replace(bf16_v=bf16_v)
    if os.path.exists(EQ_PATH):
        eq = load_restart(EQ_PATH)
        state = state.replace(x=eq.x, v=eq.v, f=eq.f, typ=eq.typ,
                              tag=eq.tag, mask=eq.mask, image=eq.image,
                              step=eq.step)
    n = int(state.n_valid())
    try:
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
        of = float(np.asarray(diag["bucket_overflow"]))
        print(f"BF16V bf16_v={bf16_v}: {ms:.1f} ms/step "
              f"({n/ms*1e3:.3e} ps/s) of={of:.0f} (compile+warm {tc:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"BF16V bf16_v={bf16_v} ERROR: {type(e).__name__}: "
              f"{str(e)[:800]}", flush=True)


if __name__ == "__main__":
    timing(False)
    timing(True)
    print("R5A_BF16_DONE", flush=True)
