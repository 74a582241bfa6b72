"""Map the v3 static-path device miscompile vs lane-vector length L.

Facts so far (device, compiled vs dense oracle, all interpret-exact):
  PASS L in {50, 60, 66, 572}; FAIL L in {32, 48, 72, 78, 84, 96, 108}.
  572 mod 128 = 60 -> working hypothesis: a "good window" of L mod 128
  around [50..66]; every probe below is chosen to confirm/refute and to
  find a padding rule for the 1M production shape (l=70, zc=5: natural
  L=648, 648 mod 128 = 8 -> would need pad to 700).

Probe groups:
  A. L-vs-w separation: reach the SAME L=60 with w=12 (zc=2, body=5)
     that passed with w=10 — if it fails, the trigger is w, not L.
  B. window boundaries at w=10/w=14: L=70 (14x5), L=80 (10x8, min-image
     strict... spill), L=40.
  C. second 128-window: L=180 (w30 x 6, mod 52 -> predict PASS),
     L=168 (w28 x 6, mod 40 -> predict FAIL).
  D. lane_pad rescue: failing shape (w12) padded to 188 (mod 60):
     predict PASS under the window rule — the production workaround.
  E. production-width: w=54 (nx=50) natural L=324 (mod 68, predict FAIL)
     and padded to 444 (mod 60, predict PASS).

Run alone: nohup python tools/v3_lane_scan.py > /tmp/v3scan.log 2>&1 &
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
from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams, dense_forces

PARAMS = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)


def probe(lens, zc=0, lane_pad=0, skin=0.3, label=""):
    box = Box.orthorhombic(*lens)
    n = int(round(3.0 * lens[0] * lens[1] * lens[2]))
    try:
        st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
        cfg = CellConfig.for_box(lens, rc=1.0, density=3.0, skin=skin,
                                 spill=True)
        bst = to_bucket_state(st, cfg)
        step = jnp.int32(42)
        f_p, vir_p = bucket_forces_pallas_v3(
            bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, PARAMS,
            0.01, cfg, rng_mode="fast", interpret=False, z_chunks=zc,
            lane_pad=lane_pad)
        jax.block_until_ready(f_p)
        f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag,
                                     bst.mask, box, step, PARAMS, 0.01,
                                     rng_mode="fast")
    except Exception as e:
        print(f"ERROR {label}: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
    nx, ny, nz = cfg.ncell
    w = nx + 4
    zce = zc if zc > 0 else 1
    z_halo = zce > 1 or lane_pad > 0
    body = (nz // zce + 2) if z_halo else nz
    L = max(body * w, lane_pad)
    m = np.asarray(bst.mask)
    fd, fp = np.asarray(f_d), np.asarray(f_p)
    err = np.abs(fp[m] - fd[m]).max() / np.abs(fd).max()
    verr = abs(float(vir_p) - float(vir_d)) / abs(float(vir_d))
    ok = err < 5e-5 and verr < 1e-3
    print(f"{'PASS' if ok else 'FAIL'} {label} ncell={cfg.ncell} w={w} "
          f"zc={zc} pad={lane_pad} L={L} (L%128={L % 128}): rel={err:.2e} "
          f"vir={verr:.2e}", flush=True)
    return ok


if __name__ == "__main__":
    # A. same L=60, different w: w=12 (nx=8) x body5 (zc=2, nz=6)
    probe([10.7, 8.0, 8.0], zc=2, label="A-w12-body5-L60")
    # A2. w=11 x body5 = 55 (in-window, different w)
    probe([9.2, 8.0, 8.0], zc=2, label="A-w11-body5-L55")
    # B. boundary: w=14 x body5 = 70 (between pass-66 and fail-72)
    probe([13.2, 8.0, 8.0], zc=2, label="B-w14-body5-L70")
    # B2. w=10 x body8 = 80 via nz=12 zc=2 (body=8): min-image, z-halo
    probe([8.0, 8.0, 16.0], zc=2, label="B-w10-body8-L80")
    # B3. w=10 x body4 = 40 via nz=12 zc=6
    probe([8.0, 8.0, 16.0], zc=6, label="B-w10-body4-L40")
    # B4. lower boundary: w=13 x body4 = 52 via nz=12 zc=6
    probe([11.8, 8.0, 16.0], zc=6, label="B-w13-body4-L52")
    # C. second window: w=30 x 6 = 180 (mod 52, predict PASS)
    probe([33.8, 8.0, 8.0], label="C-w30-L180-m52")
    # C2. w=28 x 6 = 168 (mod 40, predict FAIL)
    probe([31.2, 8.0, 8.0], label="C-w28-L168-m40")
    # D. pad rescue: failing w=12 shape padded into the window (188%128=60)
    probe([10.7, 8.0, 8.0], lane_pad=188, label="D-w12-pad188-m60")
    # E. production width w=54 (nx=50): natural 324 (mod 68, predict FAIL)
    probe([65.0, 4.0, 8.0], skin=0.4, label="E-w54-L324-m68")
    # E2. padded to 444 (mod 60, predict PASS)
    probe([65.0, 4.0, 8.0], skin=0.4, lane_pad=444, label="E-w54-pad444-m60")
    print("V3SCAN_DONE", flush=True)
