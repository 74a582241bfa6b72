"""Measure the pallas-path production loop on the TPU (dev tool)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    l = float(sys.argv[1]) if len(sys.argv) > 1 else 32.0
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from meso_tpu.core.system import run_bucket
    from meso_tpu.models.classic import classic_fluid
    from meso_tpu.obs import kinetic_temperature

    print(jax.devices(), flush=True)
    t0 = time.time()
    system, params, state = classic_fluid(l=l, rng_mode="fast",
                                          force_path="pallas")
    n_real = int(state.n_valid())
    print(f"setup {time.time()-t0:.1f}s rows={state.n} real={n_real} "
          f"cfg={system.cells}", flush=True)
    t0 = time.time()
    state, diag = run_bucket(system, params, state, 10)
    jax.block_until_ready(state.x)
    print(f"compile+10 steps: {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    state, diag = run_bucket(system, params, state, steps)
    jax.block_until_ready(state.x)
    dt = (time.perf_counter() - t0) / steps
    kt = float(kinetic_temperature(state.v, params.mass[state.typ],
                                   state.mask))
    print(f"N={n_real}: {dt*1e3:.2f} ms/step -> {n_real/dt:.3e} ps/s, "
          f"rebuilds {int(diag['n_rebuilds'])}/{steps}, "
          f"overflow {int(diag['bucket_overflow'])}, kT={kt:.4f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
