"""Round 2 of the width-rule characterization (tools/v3_lane_scan.py).

Established (device, compiled vs dense oracle): the v3 static-path
miscompile is determined by the ROW WIDTH w_lane: w in {10, 11, 26} pass,
w in {8, 12, 13, 14, 18, 28, 29, 50} fail — rule candidate
w % 16 in {10, 11}. This run:

  A. w_pad rescue: failing nx=8 shape padded to w=26/27 (predict PASS)
     and w=24 (mod 8 — control, predict FAIL); the E production shape
     (nx=46, w=50) padded to w=58 (predict PASS).
  B. rule refinement at natural widths: w=27 (nx=23, mod 11 -> PASS?),
     w=42 (nx=38, mod 10 -> PASS?), w=9 (nx=5, mod 9 -> unknown).
  C. v2 (pair_dpd_fused) at failing-class widths: w=12 and w=50 — the r2
     device suite only ever validated v2 at w in {10, 11} class shapes;
     if v2 shares the bug, the 1M bench numbers are suspect.
  D. v3 TEA with the value-tags design (tags as exact f32 values, ONE
     f32->int32 convert at the TEA input) at the anchor w=10 — the fix
     for the tea-tier corruption (bitcast-free tag path).

Run alone: nohup python tools/v3_lane_scan2.py > /tmp/v3scan2.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

print("dev:", jax.devices(), flush=True)

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.kernels.pair_dpd_fused import bucket_forces_pallas_fused
from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams, dense_forces

PARAMS = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)


def probe(lens, zc=0, w_pad=0, skin=0.3, rng="fast", kern="v3", label=""):
    box = Box.orthorhombic(*lens)
    n = int(round(3.0 * lens[0] * lens[1] * lens[2]))
    try:
        st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
        cfg = CellConfig.for_box(lens, rc=1.0, density=3.0, skin=skin,
                                 spill=True)
        bst = to_bucket_state(st, cfg)
        step = jnp.int32(42)
        if kern == "v3":
            f_p, vir_p = bucket_forces_pallas_v3(
                bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, PARAMS,
                0.01, cfg, rng_mode=rng, interpret=False, z_chunks=zc,
                w_pad=w_pad)
        else:
            f_p, vir_p = bucket_forces_pallas_fused(
                bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, PARAMS,
                0.01, cfg, rng_mode=rng)
        jax.block_until_ready(f_p)
        f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag,
                                     bst.mask, box, step, PARAMS, 0.01,
                                     rng_mode=rng)
    except Exception as e:
        print(f"ERROR {label}: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
    nx, ny, nz = cfg.ncell
    w = max(nx + 4, w_pad)
    m = np.asarray(bst.mask)
    fd, fp = np.asarray(f_d), np.asarray(f_p)
    err = np.abs(fp[m] - fd[m]).max() / np.abs(fd).max()
    verr = abs(float(vir_p) - float(vir_d)) / abs(float(vir_d))
    ok = err < 5e-5 and verr < 1e-3
    print(f"{'PASS' if ok else 'FAIL'} {label} kern={kern} rng={rng} "
          f"ncell={cfg.ncell} w={w} (w%16={w % 16}) zc={zc}: rel={err:.2e} "
          f"vir={verr:.2e}", flush=True)
    return ok


if __name__ == "__main__":
    E = [65.0, 4.0, 8.0]       # nx=46 -> w=50 (fails natural)
    # A. w_pad rescue
    probe([10.7, 8.0, 8.0], w_pad=26, label="A-nx8-pad-w26")
    probe([10.7, 8.0, 8.0], w_pad=27, label="A-nx8-pad-w27")
    probe([10.7, 8.0, 8.0], w_pad=24, label="A-nx8-pad-w24-ctl")
    probe(E, skin=0.4, w_pad=58, label="A-E-pad-w58")
    # B. natural-width rule refinement
    probe([30.0, 8.0, 8.0], label="B-w27-m11")       # nx=23
    probe([49.5, 8.0, 8.0], label="B-w42-m10")       # nx=38
    probe([6.6, 8.0, 8.0], label="B-w9-m9")          # nx=5
    # C. v2 at failing-class widths
    probe([10.7, 8.0, 8.0], kern="v2", label="C-v2-w12")
    probe(E, skin=0.4, kern="v2", label="C-v2-w50")
    # D. value-tags TEA at the anchor (w=10, device-good class)
    probe([8.0] * 3, rng="tea", label="D-tea-vals-w10")
    probe([10.7, 8.0, 8.0], rng="tea", w_pad=26, label="D-tea-vals-pad26")
    print("V3SCAN2_DONE", flush=True)
