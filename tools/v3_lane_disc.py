"""Isolate the v3 static-path miscompile trigger: lane-vector length mod 8.

Evidence so far (device, all interpret-exact):
  PASS: L=60 (w10 x body6, K16 AND K24), L=572 (w26 x 22, timing parity)
  FAIL: L=48 (w8), L=96 (w12), L=32 (w8 zc3), L=80 (w10 wrapmode)
Candidate rules consistent with the data: L%8==4 (both passes are r4,
all fails r0), L%16==12 (60 and 572 are both 12 mod 16, fails all 0),
L%128==60 (both passes!). This probe pins the axis with non-cubic
boxes: identical physics/density/capacity, ONLY nx (hence w_lane = nx+4
and L = body_z*w_lane) varies across residues; nx14 (L=108: 12 mod 16
but 108 mod 128) separates the %16 and %128 rules. Also re-gates the
TEA tier at the anchor after the int-roll fix (bitcast before roll,
tools/toy_tea_roll.py pre_bc).

Run alone: nohup python tools/v3_lane_disc.py > /tmp/v3lane.log 2>&1 &
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


def probe(lens, cap=None, spill=True, rng="fast", zc=0, skin=0.3,
          label="", localize=False, lane_pad=0):
    box = Box.orthorhombic(*lens)
    n = int(round(3.0 * lens[0] * lens[1] * lens[2]))
    try:
        st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
        cfg = CellConfig.for_box(lens, rc=1.0, density=3.0, skin=skin,
                                 capacity=cap, spill=spill)
        bst = to_bucket_state(st, cfg)
        step = jnp.int32(42)
        f_p, vir_p = bucket_forces_pallas_v3(
            bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, PARAMS,
            0.01, cfg, rng_mode=rng,
            interpret=os.environ.get("V3LANE_INTERP") == "1", z_chunks=zc,
            lane_pad=lane_pad)
        jax.block_until_ready(f_p)
        f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag,
                                     bst.mask, box, step, PARAMS, 0.01,
                                     rng_mode=rng)
    except Exception as e:
        print(f"ERROR {label}: {type(e).__name__}: {str(e)[:400]}",
              flush=True)
        return None
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    xr = 2 if cfg.spill else 1
    w_lane = nx + 2 * xr
    zce = zc if zc > 0 else 1
    z_halo = zce > 1 or lane_pad > 0
    body = (nz // zce + 2) if z_halo else nz
    l_lane = max(body * w_lane, lane_pad)
    m = np.asarray(bst.mask)
    fd, fp = np.asarray(f_d), np.asarray(f_p)
    err = np.abs(fp[m] - fd[m]).max() / np.abs(fd).max()
    verr = abs(float(vir_p) - float(vir_d)) / abs(float(vir_d))
    ok = err < 5e-5 and verr < 1e-3
    print(f"{'PASS' if ok else 'FAIL'} {label} ncell={cfg.ncell} K={k} "
          f"spill={cfg.spill} zc={zc} w={w_lane} L={l_lane} "
          f"(L%8={l_lane % 8}): rel={err:.2e} vir={verr:.2e}", flush=True)
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
    # nx sweep at fixed (ny, nz) = (6, 6): w = nx+4, L = 6*w
    probe([10.7, 8.0, 8.0], label="nx8-L72-r0", localize=True)   # L%8=0
    probe([9.2, 8.0, 8.0], label="nx7-L66-r2")                   # L%8=2
    probe([11.8, 8.0, 8.0], label="nx9-L78-r6")                  # L%8=6
    probe([13.2, 8.0, 8.0], label="nx10-L84-r4")                 # L%8=4
    # L=108: 12 mod 16 but NOT 60 mod 128 — separates %16 from %128
    probe([18.5, 8.0, 8.0], label="nx14-L108-m16r12")
    # z-chunked at the cubic passing shape: L=50 (r2), z_halo ON
    probe([8.0] * 3, zc=2, label="cubic-zc2-L50-r2")
    # 4 groups at the passing L=60: K axis control
    probe([8.0] * 3, cap=32, label="cubic-K32-L60-r4")
    # strict at L%8==4 (l=16: ncell 12, w13, L156): strict-axis control
    probe([16.0] * 3, spill=False, skin=0.3, label="strict16-L156-r4")
    # lane-pad workaround probes: FAILING shapes padded to %16==12 (also
    # %8==4 — either rule predicts PASS; pads chosen != 60 mod 128)
    probe([10.7, 8.0, 8.0], lane_pad=108, label="nx8-pad108")
    probe([8.0] * 3, zc=2, lane_pad=76, label="cubic-zc2-pad76")
    # TEA tier at the anchor: gates the int-roll fix (pre_bc) on device
    probe([8.0] * 3, rng="tea", label="tea-introll-anchor")
    probe([8.0] * 3, rng="tea", zc=2, label="tea-introll-zc2")
    print("V3LANE_DONE", flush=True)
