"""One-config TPU probe of the fused pallas/bucket production loop.

Usage: python tools/bench_tpu_probe.py [L] [STEPS] [PATH] [SKIN] [EVERY] [G]
Prints setup/compile/measure timings + ms/step + kT. Dev tool for perf
iteration (run under tools/tpu_retry.py on the flaky axon pool).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    l = float(sys.argv[1]) if len(sys.argv) > 1 else 32.0
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    path = sys.argv[3] if len(sys.argv) > 3 else "pallas"
    skin = float(sys.argv[4]) if len(sys.argv) > 4 else 0.4
    every = int(sys.argv[5]) if len(sys.argv) > 5 else 3

    from meso_tpu.core.system import run_bucket_chunked
    from meso_tpu.models.classic import classic_fluid
    from meso_tpu.obs import kinetic_temperature

    print(jax.devices(), flush=True)
    t0 = time.time()
    system, params, state = classic_fluid(
        l=l, rng_mode=os.environ.get("MESO_BENCH_RNG", "fast"), skin=skin,
        rebuild_every=every, force_path=path,
        pair_kernel=os.environ.get("MESO_BENCH_KERNEL", "v2"),
        rebuild=os.environ.get("MESO_BENCH_REBUILD_ENGINE", "gather"),
        z_chunks=int(os.environ.get("MESO_BENCH_ZCHUNKS", "0")))
    n_real = int(state.n_valid())
    print(f"setup {time.time()-t0:.1f}s rows={state.n} real={n_real} "
          f"cfg={system.cells}", flush=True)

    t0 = time.time()
    tt = os.environ.get("MESO_BENCH_TRACE", "0") == "1"
    state, _ = run_bucket_chunked(system, params, state, 1, every,
                                  thermo_trace=tt)
    jax.block_until_ready(state.x)
    print(f"compile+1 chunk: {time.time()-t0:.1f}s", flush=True)

    nchunks = max(steps // every, 1)
    t0 = time.perf_counter()
    state, diag = run_bucket_chunked(system, params, state, nchunks,
                                     every, thermo_trace=tt)
    jax.block_until_ready(state.x)
    dt = (time.perf_counter() - t0) / (nchunks * every)
    kt = float(kinetic_temperature(state.v, params.mass[state.typ],
                                   state.mask))
    print(f"N={n_real} path={path} skin={skin} every={every}: "
          f"{dt*1e3:.2f} ms/step -> {n_real/dt:.3e} ps/s, "
          f"overflow {int(diag['bucket_overflow'])}, "
          f"skin_ratio {float(diag['worst_skin_ratio']):.2f}, kT={kt:.4f}",
        flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
