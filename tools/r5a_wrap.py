"""r5 session A / stage 2: settle the wrap_mode="rebuild" contradiction
at 1M on device (VERDICT r4 item 4).

io/deck.py warns the config overflows K=16 at 1M (r3 probe: of=42);
neighbor/bucket_layout.py claims the r4 pre-shift restores wrap relief at
every box size (CPU-tested). One of them is stale. This script decides:

1. subset-oracle gate of the min_image=False kernel program at the 1M
   shape (r3's gate3 covered small shapes only);
2. 60-step run from the equilibrated state: bucket_overflow MUST be 0 for
   the r4 claim to stand;
3. timing vs wrap="step" (the min-image drop is ~12 VPU ops/candidate).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

print("dev:", jax.devices(), flush=True)

from meso_tpu.core.system import run_bucket_chunked
from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.models.classic import classic_fluid
from meso_tpu.obs import kinetic_temperature
from meso_tpu.io.restart import load_restart
from tools.subset_oracle import subset_check

L_BOX = 70.0
ZC = 5
EQ_PATH = "/tmp/r5_eq1m.npz"


def main():
    system, params, state = classic_fluid(
        l=L_BOX, rebuild_every=3, skin=0.4, rng_mode="fast",
        force_path="pallas", pair_kernel="v3", rebuild="sort",
        wrap_mode="rebuild", z_chunks=ZC)
    cfg = system.cells
    if os.path.exists(EQ_PATH):
        eq = load_restart(EQ_PATH)
        state = state.replace(x=eq.x, v=eq.v, f=eq.f, typ=eq.typ,
                              tag=eq.tag, mask=eq.mask, image=eq.image,
                              step=eq.step)
        print("loaded equilibrated state", flush=True)
    n = int(state.n_valid())

    # 1. force-field gate at the 1M shape (min_image=False program)
    from meso_tpu.neighbor.bucket_layout import rebuild_buckets
    state_rb, of0 = rebuild_buckets(state, cfg)
    jax.block_until_ready(state_rb.x)
    print(f"rebuild under wrap_at_rebuild cfg: of={int(of0)}", flush=True)
    step_c = jnp.int32(11)
    try:
        f, vir = bucket_forces_pallas_v3(
            state_rb.x, state_rb.v, state_rb.typ, state_rb.tag,
            state_rb.mask, state_rb.box, step_c, params.pair, system.dt,
            cfg, rng_mode="fast", z_chunks=ZC)
        jax.block_until_ready(f)
    except Exception as e:
        print(f"GATE ERROR: {type(e).__name__}: {str(e)[:1000]}", flush=True)
        return
    ok, err = subset_check(
        state_rb.x, state_rb.v, state_rb.tag, state_rb.mask,
        state_rb.box.lengths, 11, params.pair, system.dt, "fast", f, m=384,
        label=f"v3 wrap=rebuild l={L_BOX} zc={ZC} K={cfg.capacity}")

    # 2+3. run + timing
    t0 = time.time()
    state2, diag = run_bucket_chunked(system, params, state, 20, 3,
                                      thermo_trace=False)
    jax.block_until_ready(state2.x)
    t_compile = time.time() - t0
    t0 = time.time()
    state2, diag = run_bucket_chunked(system, params, state2, 20, 3,
                                      thermo_trace=False)
    jax.block_until_ready(state2.x)
    dt_ms = (time.time() - t0) / 60 * 1e3
    kt = float(kinetic_temperature(state2.v, params.mass[state2.typ],
                                   state2.mask))
    of = float(np.asarray(diag["bucket_overflow"]))
    sr = float(np.asarray(diag["worst_skin_ratio"]))
    print(f"WRAP_REBUILD 1M: {dt_ms:.1f} ms/step ({n/dt_ms*1e3:.3e} ps/s) "
          f"kT={kt:.4f} of={of:.0f} skin_ratio={sr:.3f} gate_ok={ok} "
          f"(compile+warm {t_compile:.0f}s)", flush=True)
    print("R5A_WRAP_DONE", flush=True)


if __name__ == "__main__":
    main()
