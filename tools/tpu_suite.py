"""Device-smoke suite — COMPILED-kernel correctness on the real TPU chip
(VERDICT r1 item 9: one recorded TPU test artifact per round).

Runs the Mosaic-compiled kernels (no interpret mode) against their XLA
twins / the dense oracle on-device, plus short physics runs of the
validation-config models. Each section is isolated: a raised error (e.g. a
Mosaic compile failure) records a FAIL and the run continues. Exits nonzero
on any failure.

Usage: python tools/tpu_retry.py --timeout 1800 tools/tpu_suite.py \
           | tee TPU_SUITE_r02.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def section(name, fn):
    """A raised error records a FAIL instead of aborting the artifact."""
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — artifact must always complete
        check(name, False, f"raised {type(e).__name__}: {str(e)[:200]}")


def main():
    dev = jax.devices()[0]
    print("device:", dev, "platform:", dev.platform, flush=True)
    check("platform is TPU", dev.platform == "tpu")

    from meso_tpu.core.box import Box
    from meso_tpu.core.state import create_random
    from meso_tpu.kernels.pair_dpd_fused import bucket_forces_pallas_fused
    from meso_tpu.neighbor.bucket_layout import to_bucket_state
    from meso_tpu.neighbor.cells import CellConfig
    from meso_tpu.ops.bucket_dpd import bucket_forces_xla
    from meso_tpu.ops.dpd import DPDParams, dense_forces

    params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)

    def rel(f_a, f_b, mask):
        m = np.asarray(mask)
        return float(np.abs(np.asarray(f_a)[m] - np.asarray(f_b)[m]).max()
                     / np.abs(np.asarray(f_b)).max())

    def strict_vs_sweep():
        # l=12 is a VALIDATED strict shape; l=8 strict is the known Mosaic
        # miscompile shape (production routes strict pallas to the sweep —
        # see core/system.py)
        l = 12.0
        n = int(3 * l ** 3)
        box = Box.cubic(l)
        st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
        for rng_mode in ("fast", "tea"):
            cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3,
                                     skin=0.3)
            bst = to_bucket_state(st, cfg)
            step = jnp.int32(42)
            f_p, _ = bucket_forces_pallas_fused(
                bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step,
                params, 0.01, cfg, rng_mode=rng_mode, interpret=False)
            f_b, _ = jax.jit(
                bucket_forces_xla,
                static_argnames=("dt", "cfg", "rng_mode"))(
                bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step,
                params, 0.01, cfg, rng_mode=rng_mode)
            err = rel(f_p, f_b, bst.mask)
            check(f"fused kernel (strict l=12) vs XLA sweep ({rng_mode})",
                  err < 2e-5, f"rel_err={err:.2e}")

        l, n = 8.0, 1536
        box = Box.cubic(l)
        st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
        cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3,
                                 skin=0.3, spill=True)
        pst = to_bucket_state(st, cfg)
        step = jnp.int32(9)
        f_d, _, _ = dense_forces(pst.x, pst.v, pst.typ, pst.tag, pst.mask,
                                 box, step, params, 0.01, rng_mode="fast")
        f_sp, _ = bucket_forces_pallas_fused(
            pst.x, pst.v, pst.typ, pst.tag, pst.mask, box, step, params,
            0.01, cfg, rng_mode="fast", interpret=False)
        err = rel(f_sp, f_d, pst.mask)
        check(f"spill kernel (K={cfg.capacity}) vs dense", err < 2e-5,
              f"rel_err={err:.2e}")

    def model_kernels():
        from meso_tpu.kernels.pair_dpd_fused import (
            bucket_forces_pallas_edpd_fused, bucket_forces_pallas_tdpd_fused)
        from meso_tpu.ops.edpd import EDPDParams, bucket_forces_edpd
        from meso_tpu.ops.tdpd import TDPDParams, bucket_forces_tdpd

        l = 12.0
        n = int(3 * l ** 3)
        box = Box.cubic(l)
        st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
        cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3,
                                 skin=0.3)
        st2 = st.replace(T=1.0 + 0.3 * jnp.sin(st.x[:, 0]),
                         dTdt=jnp.zeros(st.n),
                         typ=(st.tag % 2).astype(jnp.int32))
        ep = EDPDParams.build(
            a=jnp.asarray([[25.0, 35.0], [35.0, 18.0]]),
            gamma=jnp.asarray([[4.5, 6.0], [6.0, 3.0]]),
            rc=1.0, kappa=jnp.asarray([[1.5, 0.7], [0.7, 2.2]]), cv=10.0,
            seed=7, n_types=2)
        bst2 = to_bucket_state(st2, cfg)
        fb, qb, _ = jax.jit(bucket_forces_edpd,
                            static_argnames=("dt", "cfg"))(
            bst2.x, bst2.v, bst2.T, bst2.typ, bst2.tag, bst2.mask, box,
            jnp.int32(5), ep, 0.01, cfg)
        fp, qp, _ = bucket_forces_pallas_edpd_fused(
            bst2.x, bst2.v, bst2.T, bst2.typ, bst2.tag, bst2.mask, box,
            jnp.int32(5), ep, 0.01, cfg, interpret=False)
        err = rel(fp, fb, bst2.mask)
        check("eDPD fused multi-type kernel (compiled)", err < 2e-5,
              f"rel_err={err:.2e}")

        st3 = st.replace(C=(1.0 + 0.5 * jnp.cos(st.x[:, 0]))[:, None],
                         dCdt=jnp.zeros((st.n, 1)),
                         typ=(st.tag % 2).astype(jnp.int32))
        tp = TDPDParams.build(
            a=jnp.asarray([[25.0, 40.0], [40.0, 15.0]]),
            gamma=jnp.asarray([[4.5, 9.0], [9.0, 2.0]]),
            rc=1.0, kt=1.0, kappa_c=[1.0], eps_c=[0.1], rcc=1.0, seed=5,
            n_types=2)
        bst3 = to_bucket_state(st3, cfg)
        fb, qb, _ = jax.jit(bucket_forces_tdpd,
                            static_argnames=("dt", "cfg"))(
            bst3.x, bst3.v, bst3.C, bst3.typ, bst3.tag, bst3.mask, box,
            jnp.int32(4), tp, 0.01, cfg)
        fp, qp, _ = bucket_forces_pallas_tdpd_fused(
            bst3.x, bst3.v, bst3.C, bst3.typ, bst3.tag, bst3.mask, box,
            jnp.int32(4), tp, 0.01, cfg, interpret=False)
        err = rel(fp, fb, bst3.mask)
        check("tDPD fused multi-type kernel (compiled)", err < 2e-5,
              f"rel_err={err:.2e}")

    def physics_runs():
        from meso_tpu.core.system import run_bucket_chunked
        from meso_tpu.models.classic import classic_fluid
        from meso_tpu.obs import kinetic_temperature

        system, sp, state = classic_fluid(l=10.0, force_path="pallas",
                                          rng_mode="tea", rebuild_every=5,
                                          skin=0.3)
        state, diag = run_bucket_chunked(system, sp, state, 80, 5)
        kt = float(kinetic_temperature(state.v, sp.mass[state.typ],
                                       state.mask))
        check("classic fluid 400 steps (spill kernel, tea rng)",
              abs(kt - 1.0) < 0.04 and int(diag["bucket_overflow"]) == 0,
              f"kT={kt:.4f}")

    def bonded_runs():
        from meso_tpu.core.system import run_bucket_chunked
        from meso_tpu.models.polymer import membrane_suspension, polymer_melt
        from meso_tpu.obs import kinetic_temperature

        system, sp, state = polymer_melt(l=8.0, force_path="bucket",
                                         special_weight=0.5)
        state, diag = run_bucket_chunked(system, sp, state, 80, 5)
        kt = float(kinetic_temperature(state.v, sp.mass[state.typ],
                                       state.mask))
        check("polymer melt 400 steps (bonded + special_bonds)",
              0.85 < kt < 1.3 and bool(jnp.isfinite(state.x).all()),
              f"kT={kt:.4f}")

        system, sp, state, info = membrane_suspension(
            l=8.0, radius=2.0, subdiv=1, force_path="bucket")
        state, diag = run_bucket_chunked(system, sp, state, 10, 5)
        check("membrane suspension 50 steps",
              bool(jnp.isfinite(state.x).all()))

    section("strict kernel vs sweep", strict_vs_sweep)
    section("spill kernel", spill_kernel)
    section("model kernels", model_kernels)
    section("physics runs", physics_runs)
    section("bonded runs", bonded_runs)

    print(f"\n{len(FAILURES)} failures: {FAILURES}" if FAILURES
          else "\nALL PASS", flush=True)
    return 1 if FAILURES else 0


if __name__ == "__main__":
    t0 = time.time()
    rc = main()
    print(f"wall: {time.time() - t0:.0f}s", flush=True)
    sys.exit(rc)
