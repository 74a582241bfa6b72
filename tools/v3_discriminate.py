"""Discriminate the v3 dyn_roll device miscompile (r3, 2026-08-17).

Observed: compiled v3 dyn_roll at l=8 spill (ncell 6^3, w_lane=10,
l_log=80 padded to 128) gives rel 0.61 vs the dense oracle while
interpret is exact. Suspects: (a) 128-pad lanes + circular dynamic_rotate,
(b) the small-shape Mosaic trigger from r2 (strict fused kernel, rel 0.6
at ncell 6^3), (c) dyn_roll codegen generally.

One process, sequential probes, each printing PASS/FAIL + an error-
localization map (which (slot, zb, xw) lanes are wrong) for failures.
Run: nohup python tools/v3_discriminate.py > /tmp/v3disc.log 2>&1 &
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


def probe(l, n, skin, cap=None, spill=False, rng="fast", dyn=True, zc=0,
          label="", localize=False):
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l ** 3, skin=skin,
                             capacity=cap, spill=spill)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(42)
    t0 = time.time()
    try:
        f_p, vir_p = bucket_forces_pallas_v3(
            bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, PARAMS,
            0.01, cfg, rng_mode=rng, interpret=False, dyn_roll=dyn,
            z_chunks=zc)
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
          f"K={k} spill={cfg.spill} rng={rng} dyn={dyn} zc={zc}: "
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
            # interpret reference on the same inputs: separates Mosaic
            # codegen error from any oracle/tolerance artifact
            f_i, _ = bucket_forces_pallas_v3(
                bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step,
                PARAMS, 0.01, cfg, rng_mode=rng, interpret=True,
                dyn_roll=dyn, z_chunks=zc)
            fi = np.asarray(f_i)
            ierr = np.abs(fi[m] - fd[m]).max() / np.abs(fd).max()
            cerr = np.abs(fp[m] - fi[m]).max() / np.abs(fd).max()
            print(f"  interpret-vs-oracle rel={ierr:.2e}; "
                  f"compiled-vs-interpret rel={cerr:.2e}", flush=True)
    return ok


if __name__ == "__main__":
    # a. the repro (localized)
    probe(8.0, 1536, 0.3, spill=True, dyn=True, label="a-repro",
          localize=True)
    # b. same shape, static rolls (no dynamic_rotate, no pad, no z halo)
    probe(8.0, 1536, 0.3, spill=True, dyn=False, label="b-static")
    # c. dyn at a shape with ZERO pad lanes: l=12 spill zc=2 ->
    #    (6+2)*(12+4) = 128 exactly
    probe(12.0, 5184, 0.4, spill=True, dyn=True, zc=2, label="c-nopad")
    # d. dyn at l=12 spill zc=1: body=(12+2), w=16 -> l_log=224 pad to 256
    probe(12.0, 5184, 0.4, spill=True, dyn=True, label="d-pad12",
          localize=True)
    # e. dyn strict small shape (w_lane=8, l_log=64 pad to 128)
    probe(8.0, 1536, 0.3, dyn=True, label="e-strict8")
    # f. larger: l=16 spill dyn (production-like shape class)
    probe(16.0, 12288, 0.4, spill=True, dyn=True, label="f-l16",
          localize=True)
    print("V3DISC_DONE", flush=True)
