"""Probe per-call vs per-step cost scaling of the fused bucket loop."""

import sys
import time

sys.path.insert(0, ".")

import jax


def main():
    l = float(sys.argv[1]) if len(sys.argv) > 1 else 32.0
    from meso_tpu.core.system import run_bucket_fixed
    from meso_tpu.models.classic import classic_fluid

    print(jax.devices(), flush=True)
    system, params, state = classic_fluid(l=l, rng_mode="fast",
                                          force_path="pallas", skin=0.4)
    n_real = int(state.n_valid())
    print(f"rows={state.n} real={n_real}", flush=True)

    for nchunks, spc in ((2, 5), (10, 5), (40, 5), (20, 10)):
        t0 = time.time()
        s, diag = run_bucket_fixed(system, params, state, nchunks, spc)
        jax.block_until_ready(s.x)
        t_compile = time.time() - t0
        t0 = time.perf_counter()
        s, diag = run_bucket_fixed(system, params, s, nchunks, spc)
        jax.block_until_ready(s.x)
        dt = time.perf_counter() - t0
        steps = nchunks * spc
        print(f"nchunks={nchunks} spc={spc}: {dt/steps*1e3:.2f} ms/step "
              f"-> {n_real*steps/dt:.3e} ps/s (call {dt*1e3:.0f} ms, "
              f"compile {t_compile:.0f}s, of={int(diag['bucket_overflow'])}, "
              f"skin_ratio={float(diag['worst_skin_ratio']):.2f})",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
