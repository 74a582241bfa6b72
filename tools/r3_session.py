"""Round-3 consolidated device session: v3 kernel validation + perf ladder
in ONE process (one client, no mid-compile kills; CLAUDE.md r3 rules).

STATIC-first (2026-08-17): the dyn_roll path miscompiles on this device
toolchain (tools/v3_discriminate.py: rel ~0.6 at every shape, identical
before/after the reaction-assembly restructure — the traced-offset
tpu.dynamic_rotate composition itself is wrong); the static-unroll path
is the production candidate and is gated here against the dense oracle
on every r2 miscompile trigger shape BEFORE any default flips.

Stages (each prints incrementally, flush=True):
  1. v3 STATIC parity gate: spill/strict at the r2 trigger shapes,
     spill+tea (VERDICT item 2), z-chunked, padded-capacity
  2. v2 vs v3 timing at 98k and 1M (fused production loop), v3+tea at 1M
  3. rebuild engine gather-vs-sort timing at 1M
  4. informational dyn_roll probe (expected FAIL; recorded for the
     miscompile registry)

Run: nohup python tools/r3_session.py > /tmp/r3_session.log 2>&1 &
with NO outer timeout below 2h; poll the log.
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

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import run_bucket_chunked, setup
from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.models.classic import classic_fluid
from meso_tpu.neighbor.bucket_layout import (_rebuild_buckets_gather,
                                             rebuild_buckets_sort,
                                             to_bucket_state)
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.obs import kinetic_temperature
from meso_tpu.ops.dpd import DPDParams, dense_forces

PARAMS = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)


def parity(l, n, skin, cap=None, spill=False, rng="fast", dyn=False,
           zc=0, tol=5e-5, wrap_rebuild=False, label=""):
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l ** 3, skin=skin,
                             capacity=cap, spill=spill,
                             wrap_at_rebuild=wrap_rebuild)
    bst = to_bucket_state(st, cfg)
    if wrap_rebuild:
        # drift rows OUT of the box (<= skin/2) — the no-min-image regime
        drift = jnp.clip(0.04 * bst.v, -skin / 2, skin / 2)
        bst = bst.replace(x=bst.x + drift * bst.mask[:, None])
    step = jnp.int32(42)
    t0 = time.time()
    try:
        f_p, vir_p = bucket_forces_pallas_v3(
            bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, PARAMS,
            0.01, cfg, rng_mode=rng, interpret=False, dyn_roll=dyn,
            z_chunks=zc)
        jax.block_until_ready(f_p)
    except Exception as e:
        print(f"ERROR {label}: {type(e).__name__}: {str(e)[:500]}",
              flush=True)
        return False
    tc = time.time() - t0
    f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                                 box, step, PARAMS, 0.01, rng_mode=rng)
    m = np.asarray(bst.mask)
    fd, fp = np.asarray(f_d), np.asarray(f_p)
    err = np.abs(fp[m] - fd[m]).max() / np.abs(fd).max()
    verr = abs(float(vir_p) - float(vir_d)) / abs(float(vir_d))
    ok = err < tol and verr < 1e-3
    print(f"{'PASS' if ok else 'FAIL'} {label} l={l} ncell={cfg.ncell} "
          f"K={cfg.capacity} spill={cfg.spill} rng={rng} dyn={dyn} zc={zc}: "
          f"rel={err:.2e} vir={verr:.2e} compile={tc:.0f}s", flush=True)
    return ok


def timing(l, kernel, rengine="gather", skin=0.4, every=3, steps=60,
           rng="fast", cap=None, wrap="step"):
    try:
        system, params, state = classic_fluid(
            l=l, rebuild_every=every, skin=skin, rng_mode=rng,
            force_path="pallas", pair_kernel=kernel, rebuild=rengine,
            capacity=cap, wrap_mode=wrap)
        n = int(state.n_valid())
        nch = max(steps // every, 1)
        t0 = time.time()
        state, diag = run_bucket_chunked(system, params, state, nch, every)
        jax.block_until_ready(state.x)
        tc = time.time() - t0
        t0 = time.time()
        state, diag = run_bucket_chunked(system, params, state, nch, every)
        jax.block_until_ready(state.x)
    except Exception as e:
        print(f"ERROR timing l={l} kern={kernel}: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return None
    dt = (time.time() - t0) / (nch * every)
    kt = float(kinetic_temperature(state.v, params.mass[state.typ],
                                   state.mask))
    of = float(np.max(np.asarray(diag.get("bucket_overflow", 0))))
    sr = float(np.max(np.asarray(diag.get("worst_skin_ratio", 0.0))))
    print(f"TIMING l={l} n={n} kern={kernel} rb={rengine} skin={skin} "
          f"every={every} K={system.cells.capacity} wrap={wrap} "
          f"ncell={system.cells.ncell[0]} rng={rng}: {dt * 1e3:.1f} ms/step "
          f"({n / dt:.3e} ps/s) kT={kt:.4f} of={of:.0f} skin_ratio={sr:.2f} "
          f"compile+warm={tc:.0f}s", flush=True)
    return dt


def rebuild_timing(l=70.0, skin=0.4, spill=True):
    n = int(round(3.0 * l ** 3))
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(1), n, box, kt=1.0)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=3.0, skin=skin,
                             spill=spill)
    bst = to_bucket_state(st, cfg)
    bst = bst.replace(x=box.wrap(bst.x + 0.05 * bst.v)[0])
    for name, fn in (("gather", _rebuild_buckets_gather),
                     ("sort", rebuild_buckets_sort)):
        jf = jax.jit(fn, static_argnames="cfg")
        out, of = jf(bst, cfg)
        jax.block_until_ready(out.x)
        t0 = time.time()
        for _ in range(5):
            out, of = jf(bst, cfg)
        jax.block_until_ready(out.x)
        print(f"REBUILD {name} l={l} rows={out.n}: "
              f"{(time.time() - t0) / 5 * 1e3:.1f} ms (of={int(of)})",
              flush=True)


if __name__ == "__main__":
    print("=== stage 1: v3 STATIC parity gate ===", flush=True)
    oks = []
    oks.append(parity(8.0, 1536, 0.3, spill=True, label="spill-small"))
    oks.append(parity(8.0, 1536, 0.3, label="strict-small"))
    if not any(oks):
        print("ABORT: v3 static does not run on device", flush=True)
        sys.exit(1)
    oks.append(parity(8.0, 1536, 0.3, spill=True, rng="tea",
                      label="spill-tea"))
    oks.append(parity(8.0, 1536, 0.3, rng="tea", label="strict-tea"))
    oks.append(parity(12.0, 5184, 0.4, spill=True, label="mid-spill"))
    oks.append(parity(9.0, 2187, 0.3, zc=3, label="zc3"))
    oks.append(parity(8.0, 1536, 0.3, cap=28, label="padK28"))
    # wrap_mode="rebuild" (no-min-image kernel) on drifted states
    wm_spill = parity(8.0, 1536, 0.3, spill=True, wrap_rebuild=True,
                      label="wrapmode-spill")
    oks.append(wm_spill)
    oks.append(parity(8.0, 1536, 0.3, wrap_rebuild=True,
                      label="wrapmode-strict"))
    wm_tea = parity(8.0, 1536, 0.3, spill=True, rng="tea",
                    wrap_rebuild=True, label="wrapmode-spill-tea")
    oks.append(wm_tea)
    gate = all(oks)
    print(f"STATIC GATE: {'ALL PASS' if gate else 'FAILURES'}", flush=True)
    print("=== stage 2: timing ladder ===", flush=True)
    timing(32.0, "v2")
    timing(32.0, "v3")
    timing(70.0, "v2", steps=30)
    timing(70.0, "v3", steps=30)
    if oks[2]:
        timing(70.0, "v3", steps=30, rng="tea")
    # skin sweep inside the K=16 band: cell 1.45-1.47 cuts row count ~15%
    # (47-48^3 x 16 vs 50^3 x 16) and stretches the rebuild cadence
    timing(70.0, "v3", skin=0.47, every=5, steps=30)
    timing(70.0, "v3", skin=0.45, every=4, steps=32)
    # NOTE on the K ladder (measured on CPU, 2026-08-17): right-spill only
    # displaces a particle into the NEXT x-cell (l_lin < (cx+2)K), so the
    # viable K is ~1.9-2.0x mean occupancy — K=8 small-cell and K=16
    # supercell families (ratio ~1.5x) overflow on Poisson starts; the
    # r2 production shape (cell 1.4-1.49, K=16) is already the
    # K^2/occupancy optimum of this layout. Remaining levers: op trims,
    # cadence, rebuild engine.
    # best-guess combined config on the sort engine
    timing(70.0, "v3", skin=0.47, every=5, steps=30, rengine="sort")
    if wm_spill:
        # no-min-image kernel (wrap_mode="rebuild"): 12 fewer VPU ops per
        # candidate + no validity product
        timing(70.0, "v3", skin=0.47, every=5, steps=30, rengine="sort",
               wrap="rebuild")
        if wm_tea:
            # reference-parity RNG on the full production-candidate config
            # (VERDICT r2 item 2: tea at 1M)
            timing(70.0, "v3", skin=0.47, every=5, steps=30, rengine="sort",
                   wrap="rebuild", rng="tea")
    print("=== stage 3: rebuild engines at 1M ===", flush=True)
    rebuild_timing()
    print("=== stage 4: dyn_roll informational probe ===", flush=True)
    parity(8.0, 1536, 0.3, spill=True, dyn=True, label="dyn-info")
    print("=== stage 5: MXU tile-shape probe (r4 layout candidate) ===",
          flush=True)
    # LAST on purpose: a failed Mosaic compile wedges the worker; all
    # decision-critical results are already printed above. In-process
    # (one device client at a time).
    import runpy
    try:
        runpy.run_path(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "toy_mxu_tile.py"), run_name="__main__")
    except Exception as e:
        print(f"MXU_PROBE crashed: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
    print("R3_SESSION_DONE", flush=True)
