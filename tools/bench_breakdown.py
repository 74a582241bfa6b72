"""Break down the fused-pallas step cost on device: bare kernel vs channel
prep vs rebuild vs full step vs fused chunk. Usage:
    python tools/bench_breakdown.py [L] [v2|v3|v3_dynroll]
(redirect to a file and poll; no short retry timeouts — CLAUDE.md r3)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(f, *a, reps=3):
    r = f(*a)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / reps, r


def main():
    l = float(sys.argv[1]) if len(sys.argv) > 1 else 32.0
    kernel = sys.argv[2] if len(sys.argv) > 2 else "v2"
    from meso_tpu.core.system import _bucket_chunk, make_step
    from meso_tpu.kernels.pair_dpd_fused import bucket_forces_pallas_fused
    from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
    from meso_tpu.models.classic import classic_fluid
    from meso_tpu.neighbor.bucket_layout import rebuild_buckets

    print(jax.devices(), flush=True)
    system, params, state = classic_fluid(l=l, rng_mode="fast", skin=0.4,
                                          rebuild_every=3,
                                          force_path="pallas",
                                          pair_kernel=kernel)
    n_real = int(state.n_valid())
    print(f"rows={state.n} real={n_real} cfg={system.cells}", flush=True)

    @jax.jit
    def kern(s):
        if kernel.startswith("v3"):
            f, vir = bucket_forces_pallas_v3(
                s.x, s.v, s.typ, s.tag, s.mask, s.box, s.step, params.pair,
                system.dt, system.cells,
                dyn_roll=kernel == "v3_dynroll")
        else:
            f, vir = bucket_forces_pallas_fused(
                s.x, s.v, s.typ, s.tag, s.mask, s.box, s.step, params.pair,
                system.dt, system.cells)
        return f

    t, _ = timeit(kern, state)
    print(f"bare {kernel} kernel + prep: {t*1e3:.2f} ms", flush=True)

    @jax.jit
    def reb(s):
        s2, of = rebuild_buckets(s, system.cells)
        return s2.x

    t, _ = timeit(reb, state)
    print(f"rebuild_buckets:          {t*1e3:.2f} ms "
          f"(/{system.cells.rebuild_every} steps = "
          f"{t*1e3/system.cells.rebuild_every:.2f} ms/step)", flush=True)

    step_fn = make_step(system)
    jstep = jax.jit(lambda s: step_fn(params, s))
    t, _ = timeit(jstep, state)
    print(f"one full step (jit):      {t*1e3:.2f} ms", flush=True)

    every = system.cells.rebuild_every
    t, _ = timeit(lambda s: _bucket_chunk(system, params, s, every)[0],
                  state)
    print(f"chunk (rebuild+{every} steps): {t*1e3:.2f} ms "
          f"-> {t*1e3/every:.2f} ms/step", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
