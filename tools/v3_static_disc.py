"""Discriminate the v3 STATIC-path device miscompiles (r3, 2026-08-18).

r3_session stage-1 facts (all interpret-exact; errors are layout-
independent — identical rel/vir across strict-K24 vs spill-K16 in the
tea and wrapmode rows — so the compiled kernel computes the same wrong
per-pair force regardless of layout):

  PASS  spill K=16 fast min_image zc=1            (the production shape)
  FAIL  every K>=24 shape (strict l=8/9, spill l=12), rel ~0.6-0.75
  FAIL  tea at any layout, rel ~0.91 vir ~0.79
  FAIL  wrap_mode="rebuild" at any layout, rel ~0.54

Suspect axes, probed one at a time against the PASSING config:
  K (group count 2 vs 3+)  |  strict vs spill (xr, w_lane)  |
  z_halo (zc>1)            |  small-l vs production-l       |
  the tea hash body        |  the wrapmode poison/pre-shift pads

Run AFTER any running device session finishes (one client at a time):
  nohup python tools/v3_static_disc.py > /tmp/v3sdisc.log 2>&1 &
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
from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams, dense_forces

PARAMS = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)


def probe(l, n, skin, cap=None, spill=False, rng="fast", zc=0,
          wrap_rebuild=False, label="", localize=False):
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
    try:
        cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l ** 3,
                                 skin=skin, capacity=cap, spill=spill,
                                 wrap_at_rebuild=wrap_rebuild)
        bst = to_bucket_state(st, cfg)
    except ValueError as e:
        print(f"SKIP {label}: {e}", flush=True)
        return False
    if wrap_rebuild:
        drift = jnp.clip(0.04 * bst.v, -skin / 2, skin / 2)
        bst = bst.replace(x=bst.x + drift * bst.mask[:, None])
    step = jnp.int32(42)
    t0 = time.time()
    try:
        f_p, vir_p = bucket_forces_pallas_v3(
            bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, PARAMS,
            0.01, cfg, rng_mode=rng, interpret=False, z_chunks=zc)
        jax.block_until_ready(f_p)
    except Exception as e:
        print(f"ERROR {label}: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return False
    tc = time.time() - t0
    f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                                 box, step, PARAMS, 0.01, rng_mode=rng)
    m = np.asarray(bst.mask)
    fd, fp = np.asarray(f_d), np.asarray(f_p)
    err = np.abs(fp[m] - fd[m]).max() / np.abs(fd).max()
    verr = abs(float(vir_p) - float(vir_d)) / abs(float(vir_d))
    ok = err < 5e-5 and verr < 1e-3
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    print(f"{'PASS' if ok else 'FAIL'} {label} l={l} ncell={cfg.ncell} "
          f"K={k} spill={cfg.spill} rng={rng} zc={zc} wrap={wrap_rebuild}: "
          f"rel={err:.2e} vir={verr:.2e} t={tc:.0f}s", flush=True)
    if not ok and localize:
        rel = np.abs(fp - fd).max(axis=1) / np.abs(fd).max()
        rel = np.where(m, rel, 0.0).reshape(ny, nz, k, nx)
        bad = np.argwhere(rel > 1e-3)
        print(f"  bad rows: {len(bad)} of {m.sum()}", flush=True)
        if len(bad):
            cy, cz, sl, cx = bad.T
            print(f"  cy hist: {np.bincount(cy, minlength=ny)}", flush=True)
            print(f"  cz hist: {np.bincount(cz, minlength=nz)}", flush=True)
            print(f"  cx hist: {np.bincount(cx, minlength=nx)}", flush=True)
            print(f"  slot hist: {np.bincount(sl, minlength=k)}", flush=True)
    return ok


if __name__ == "__main__":
    # 0. re-anchor: the passing production shape
    probe(8.0, 1536, 0.3, spill=True, label="0-anchor-pass")
    # 1. K axis at the SAME spill layout: K=24 -> 3 groups
    probe(8.0, 1536, 0.3, cap=24, spill=True, label="1-spill-K24",
          localize=True)
    # 2. strict with K=16 (2 groups): does strict itself fail, or only K>16?
    probe(8.0, 1536, 0.3, cap=16, label="2-strict-K16", localize=True)
    # 3. z_halo at the passing config (zc=2, min_image still on)
    probe(8.0, 1536, 0.3, spill=True, zc=2, label="3-spill-zc2",
          localize=True)
    # 4. production-scale l: does the K>16 bug persist at big shapes?
    probe(16.0, 12288, 0.4, cap=24, spill=True, label="4-l16-K24")
    # 5. strict at big shape, K=24 (the v2 bug was small-shape-only)
    probe(16.0, 12288, 0.4, label="5-l16-strict")
    # 6. K=32 spill small (4 groups; err same as K=24?)
    probe(8.0, 1536, 0.3, cap=32, spill=True, label="6-spill-K32")
    print("V3SDISC_DONE", flush=True)
