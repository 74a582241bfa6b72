"""Break down pallas-path step cost: pure scan vs rebuild vs cond-loop."""

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
    from meso_tpu.core.system import make_step, run_bucket
    from meso_tpu.kernels.pair_dpd import bucket_forces_pallas
    from meso_tpu.models.classic import classic_fluid
    from meso_tpu.neighbor.bucket_layout import rebuild_buckets

    print(jax.devices(), flush=True)
    system, params, state = classic_fluid(l=l, rng_mode="fast",
                                          force_path="pallas")
    n_real = int(state.n_valid())
    print(f"rows={state.n} real={n_real}", flush=True)

    # 1) bare kernel
    @jax.jit
    def kern(s):
        f, vir = bucket_forces_pallas(s.x, s.v, s.typ, s.tag, s.mask, s.box,
                                      s.step, params.pair, system.dt,
                                      system.cells)
        return s.replace(f=f)
    t, state = timeit(kern, state)
    print(f"bare kernel call: {t*1e3:.2f} ms", flush=True)

    # 2) single jitted step (integrate + kernel)
    step_fn = make_step(system)
    sj = jax.jit(lambda s: step_fn(params, s))
    t, state = timeit(sj, state)
    print(f"one step (no scan): {t*1e3:.2f} ms", flush=True)

    # 3) scan of 20 steps, no rebuild
    @jax.jit
    def scan20(s):
        def body(c, _):
            return step_fn(params, c), None
        s, _ = jax.lax.scan(body, s, None, length=20)
        return s
    t, state = timeit(scan20, state)
    print(f"scan(20) no rebuild: {t/20*1e3:.2f} ms/step", flush=True)

    # 4) rebuild alone
    rb = jax.jit(lambda s: rebuild_buckets(s, system.cells))
    t, (state, _) = timeit(rb, state)
    print(f"rebuild: {t*1e3:.2f} ms", flush=True)

    # 5) host-chunked: rebuild + scan(10) per iteration
    @jax.jit
    def chunk(s):
        s, of = rebuild_buckets(s, system.cells)
        def body(c, _):
            return step_fn(params, c), None
        s, _ = jax.lax.scan(body, s, None, length=10)
        return s
    t, state = timeit(chunk, state)
    print(f"chunk rebuild+scan(10): {t/10*1e3:.2f} ms/step "
          f"-> {n_real/(t/10):.3e} ps/s", flush=True)

    # 6) run_bucket (cond loop) for reference
    t, (state, diag) = timeit(lambda s: run_bucket(system, params, s, 20),
                              state, reps=2)
    print(f"run_bucket(20): {t/20*1e3:.2f} ms/step "
          f"(rebuilds {int(diag['n_rebuilds'])}/20)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
