"""Device gate of the v3 in-kernel-hash design (r3 root-cause fix).

Root cause established by tools/v3_lane_scan2.py: integer bit patterns
bitcast into the f32 channel stack are corrupted on device, value- and
shape-dependently (v2 and v3 failed IDENTICALLY at the same shapes; the
value-carried tea tier passed at the exact shapes the bitcast-hash fast
tier failed; interpret always exact). v3 now carries tags as exact f32
values and computes BOTH tiers' randoms in-kernel — no bitcast channel
exists. This gate re-runs every previously-failing shape class:

  fast at nx in {6, 8, 23, 46} (the old fail set + anchor)
  strict buckets at l=8 K=24 (old fail, routed since r2)
  tea at nx=8, zc=2
  exclusion channels as values (special_bonds probe)
  wrap_mode="rebuild" (old fail: poisoned-pad path)
  z-chunked at nx=8

Run alone: nohup python tools/v3_gate3.py > /tmp/v3gate3.log 2>&1 &
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

BASE = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)


def probe(lens, zc=0, skin=0.3, rng="fast", spill=True, cap=None,
          excl=False, wrap=False, label=""):
    box = Box.orthorhombic(*lens)
    n = int(round(3.0 * lens[0] * lens[1] * lens[2]))
    params = BASE
    if excl:
        tags = np.arange(n)
        ex = np.stack([tags - 1, tags + 1], axis=1).astype(np.int32)
        ex[0, 0] = -7
        ex[-1, 1] = -7
        params = BASE.replace(excl=jnp.asarray(ex), excl_w=jnp.float32(0.25))
    try:
        st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
        cfg = CellConfig.for_box(lens, rc=1.0, density=3.0, skin=skin,
                                 spill=spill, capacity=cap,
                                 wrap_at_rebuild=wrap)
        bst = to_bucket_state(st, cfg)
        if wrap:
            drift = jnp.clip(0.04 * bst.v, -skin / 2, skin / 2)
            bst = bst.replace(x=bst.x + drift * bst.mask[:, None])
        step = jnp.int32(42)
        f_p, vir_p = bucket_forces_pallas_v3(
            bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params,
            0.01, cfg, rng_mode=rng, interpret=False, z_chunks=zc)
        jax.block_until_ready(f_p)
        f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag,
                                     bst.mask, box, step, params, 0.01,
                                     rng_mode=rng)
    except Exception as e:
        print(f"ERROR {label}: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
    m = np.asarray(bst.mask)
    fd, fp = np.asarray(f_d), np.asarray(f_p)
    err = np.abs(fp[m] - fd[m]).max() / np.abs(fd).max()
    verr = abs(float(vir_p) - float(vir_d)) / abs(float(vir_d))
    ok = err < 5e-5 and verr < 1e-3
    print(f"{'PASS' if ok else 'FAIL'} {label} ncell={cfg.ncell} "
          f"K={cfg.capacity} spill={spill} rng={rng} zc={zc} wrap={wrap} "
          f"excl={excl}: rel={err:.2e} vir={verr:.2e}", flush=True)
    return ok


if __name__ == "__main__":
    probe([8.0] * 3, label="anchor-nx6")
    probe([10.7, 8.0, 8.0], label="nx8")
    probe([30.0, 8.0, 8.0], label="nx23")
    probe([65.0, 4.0, 8.0], skin=0.4, label="nx46-prodwidth")
    probe([8.0] * 3, spill=False, cap=24, label="strict-nx6-K24")
    probe([10.7, 8.0, 8.0], rng="tea", label="tea-nx8")
    probe([10.7, 8.0, 8.0], rng="tea", zc=2, label="tea-nx8-zc2")
    probe([10.7, 8.0, 8.0], excl=True, label="excl-nx8")
    probe([10.7, 8.0, 8.0], wrap=True, label="wrapmode-nx8")
    probe([10.7, 8.0, 8.0], zc=2, label="fast-nx8-zc2")
    print("V3GATE3_DONE", flush=True)
