"""r5 session A / stage 3: the tea-tier 1M record (VERDICT r4 item 3 —
third ask). zc=10 keeps l_lane = 378 <= the tea compile ceiling.

Produces the reference-parity-RNG record with the repo's own physics
rule applied (CLAUDE.md): kT averaged over the last 201 steps, quoted
with sigma/sqrt(n_eff) error bars and a 3-sigma bound; skin_ratio < 1;
of = 0.
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
from meso_tpu.io.restart import load_restart
from tools.subset_oracle import subset_check

L_BOX = 70.0
ZC = 10
EQ_PATH = "/tmp/r5_eq1m.npz"


def main():
    system, params, state = classic_fluid(
        l=L_BOX, rebuild_every=3, skin=0.4, rng_mode="tea",
        force_path="pallas", pair_kernel="v3", rebuild="sort",
        z_chunks=ZC)
    cfg = system.cells
    if os.path.exists(EQ_PATH):
        eq = load_restart(EQ_PATH)
        state = state.replace(x=eq.x, v=eq.v, f=eq.f, typ=eq.typ,
                              tag=eq.tag, mask=eq.mask, image=eq.image,
                              step=eq.step)
        print("loaded equilibrated state", flush=True)
    n = int(state.n_valid())

    # gate the tea zc=10 program at the 1M shape first
    step_c = jnp.int32(11)
    try:
        f, vir = bucket_forces_pallas_v3(
            state.x, state.v, state.typ, state.tag, state.mask, state.box,
            step_c, params.pair, system.dt, cfg, rng_mode="tea",
            z_chunks=ZC)
        jax.block_until_ready(f)
    except Exception as e:
        print(f"TEA GATE ERROR zc={ZC}: {type(e).__name__}: "
              f"{str(e)[:1000]}", flush=True)
        return
    ok, err = subset_check(
        state.x, state.v, state.tag, state.mask, state.box.lengths, 11,
        params.pair, system.dt, "tea", f, m=256,
        label=f"v3 tea l={L_BOX} zc={ZC} K={cfg.capacity}")
    if not ok:
        print("TEA 1M GATE FAILED — no record", flush=True)
        return

    # re-equilibrate 120 steps under the tea tier, then measure 201 steps
    # with the per-step kT trace on
    t0 = time.time()
    state, _ = run_bucket_chunked(system, params, state, 40, 3,
                                  thermo_trace=False)
    jax.block_until_ready(state.x)
    print(f"tea re-equilibration 120 steps: {time.time()-t0:.0f}s",
          flush=True)
    t0 = time.time()
    state, diag = run_bucket_chunked(system, params, state, 67, 3,
                                     thermo_trace=True)
    jax.block_until_ready(state.x)
    wall = time.time() - t0
    steps = 67 * 3
    kts = np.asarray(diag["kt_trace"])
    # integrated autocorrelation ~ a few steps for kT at 1M; quote a
    # conservative n_eff using tau from the trace itself
    kmean, ksig = kts.mean(), kts.std(ddof=1)
    dk = kts - kmean
    acf1 = float((dk[:-1] * dk[1:]).mean() / max(dk.var(), 1e-30))
    tau = (1 + acf1) / max(1 - acf1, 1e-3)
    n_eff = max(len(kts) / (2 * tau), 1.0)
    sem = ksig / np.sqrt(n_eff)
    of = float(np.asarray(diag["bucket_overflow"]))
    sr = float(np.asarray(diag["worst_skin_ratio"]))
    ms = wall / steps * 1e3
    print(f"TEA_1M_RECORD: n={n} steps={steps} {ms:.1f} ms/step "
          f"({n/ms*1e3:.3e} ps/s) kT={kmean:.4f}+-{sem:.4f} "
          f"(sigma={ksig:.4f}, tau={tau:.1f}, n_eff={n_eff:.0f}) "
          f"|kT-1|={abs(kmean-1):.4f} 3sig={3*sem:.4f} of={of:.0f} "
          f"skin_ratio={sr:.3f}", flush=True)
    print("R5A_TEA_DONE", flush=True)


if __name__ == "__main__":
    main()
