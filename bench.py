"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.md): particle-steps/sec/chip on a ~1M-particle classic DPD
fluid (rho=3, a=25, gamma=4.5, rc=1, dt=0.01), kinetic temperature within 1%
of target. vs_baseline is measured against the BASELINE.json north-star of
1e9 particle-steps/sec/chip.

Runs on whatever jax.devices()[0] is (the real TPU chip under the driver).
Env overrides: MESO_BENCH_L (box side, default 70 -> 1,029,000 particles),
MESO_BENCH_STEPS, MESO_BENCH_PATH (nlist|pallas).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from meso_tpu.core.system import run
    from meso_tpu.models.classic import classic_fluid
    from meso_tpu.obs import kinetic_temperature

    l = float(os.environ.get("MESO_BENCH_L", "70"))
    path = os.environ.get("MESO_BENCH_PATH", "nlist")
    rebuild_every = int(os.environ.get("MESO_BENCH_REBUILD", "10"))
    nsteps = int(os.environ.get("MESO_BENCH_STEPS", "200"))
    nchunks = max(nsteps // rebuild_every, 1)

    system, params, state = classic_fluid(
        l=l, rebuild_every=rebuild_every, rng_mode="fast", force_path=path)
    n = state.n

    # equilibrate + warm the compile cache
    state, _ = run(system, params, state, nchunks=max(100 // rebuild_every, 1))
    jax.block_until_ready(state.x)

    t0 = time.perf_counter()
    state, diags = run(system, params, state, nchunks=nchunks)
    jax.block_until_ready(state.x)
    dt_wall = time.perf_counter() - t0

    steps = nchunks * rebuild_every
    ps_per_s = n * steps / dt_wall
    kt = float(kinetic_temperature(
        state.v, params.mass[state.typ], state.mask))
    result = {
        "metric": "particle-steps/sec/chip (1M DPD fluid, rho=3)",
        "value": round(ps_per_s, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(ps_per_s / 1e9, 4),
        "n_particles": n,
        "steps": steps,
        "wall_s": round(dt_wall, 3),
        "kT": round(kt, 4),
        "kT_err": round(abs(kt - 1.0), 4),
        "cell_overflow": int(jnp.sum(diags["cell_overflow"])),
        "nlist_overflow": int(jnp.sum(diags["nlist_overflow"])),
        "skin_violations": int(jnp.sum(diags["skin_violation"])),
        "force_path": path,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
