"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.md): particle-steps/sec/chip on a ~1M-particle classic DPD
fluid (rho=3, a=25, gamma=4.5, rc=1, dt=0.01), kinetic temperature within 1%
of target. vs_baseline is measured against the BASELINE.json north-star of
1e9 particle-steps/sec/chip.

Runs the fused pallas-path production loop (run_bucket_fixed) on
jax.devices()[0] (the real TPU chip under the driver). Env overrides:
MESO_BENCH_L (box side, default 70 -> 1,029,000 particles),
MESO_BENCH_STEPS, MESO_BENCH_PATH (pallas|bucket|nlist),
MESO_BENCH_SKIN, MESO_BENCH_REBUILD.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def run_config(l, path, skin, every, nsteps):
    from meso_tpu.core.system import run_adaptive, run_bucket_chunked
    from meso_tpu.models.classic import classic_fluid
    from meso_tpu.obs import kinetic_temperature

    system, params, state = classic_fluid(
        l=l, rebuild_every=every, skin=skin, rng_mode="fast",
        force_path=path)
    n = int(state.n_valid())
    fused = path in ("pallas", "bucket")

    def advance(s, steps):
        if fused:
            return run_bucket_chunked(system, params, s,
                                      max(steps // every, 1), every)
        return run_adaptive(system, params, s, steps)

    # equilibrate (hot random start -> kT 1.0) + warm the compile cache
    state, _ = advance(state, 399)
    jax.block_until_ready(state.x)

    t0 = time.perf_counter()
    state, diag = advance(state, nsteps)
    jax.block_until_ready(state.x)
    dt_wall = time.perf_counter() - t0

    steps = (max(nsteps // every, 1) * every) if fused else nsteps
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
        "force_path": path,
        "device": str(jax.devices()[0]),
    }
    for key in ("bucket_overflow", "worst_skin_ratio", "cell_overflow",
                "nlist_overflow", "n_rebuilds"):
        if key in diag:
            result[key] = round(float(jnp.max(jnp.asarray(diag[key]))), 3)
    return result


def main():
    from meso_tpu.core.system import run_adaptive, run_bucket_chunked  # noqa
    l = float(os.environ.get("MESO_BENCH_L", "70"))
    path = os.environ.get("MESO_BENCH_PATH", "pallas")
    skin = float(os.environ.get("MESO_BENCH_SKIN", "0.4"))
    every = int(os.environ.get("MESO_BENCH_REBUILD", "3"))
    nsteps = int(os.environ.get("MESO_BENCH_STEPS", "201"))
    try:
        result = run_config(l, path, skin, every, nsteps)
    except Exception as e:  # fall back to the validated 98k config
        sys.stderr.write(f"[bench] L={l} failed ({type(e).__name__}); "
                         f"falling back to L=32\n")
        result = run_config(32.0, path, skin, every, nsteps)
        result["note"] = f"fallback from L={l}: {type(e).__name__}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
