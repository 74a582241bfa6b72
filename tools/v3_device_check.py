"""Compiled v3-kernel device validation (pre-bench gate, CLAUDE.md
discipline): run the COMPILED Newton fused-lane kernel against the dense
O(N^2) oracle across the shapes where the v2 toolchain miscompiles were
found (strict l=8/K=24, spill, tea tier), both roll paths.

Run via ``python tools/tpu_retry.py --timeout 1200 tools/v3_device_check.py``
— one TPU client at a time.
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

params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)
failures = 0


def check(l, n, skin, cap=None, spill=False, rng="fast", dyn_roll=False,
          tol=5e-5):
    global failures
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l ** 3, skin=skin,
                             capacity=cap, spill=spill)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(42)
    f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                                 box, step, params, 0.01, rng_mode=rng)
    f_p, vir_p = bucket_forces_pallas_v3(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode=rng, interpret=False, dyn_roll=dyn_roll)
    m = np.asarray(bst.mask)
    fd, fp = np.asarray(f_d), np.asarray(f_p)
    scale = np.abs(fd).max()
    err = np.abs(fp[m] - fd[m]).max() / scale
    verr = abs(float(vir_p) - float(vir_d)) / abs(float(vir_d))
    ok = err < tol and verr < 1e-3
    failures += 0 if ok else 1
    print(f"{'PASS' if ok else 'FAIL'} l={l} ncell={cfg.ncell} "
          f"K={cfg.capacity} spill={cfg.spill} rng={rng} dyn={dyn_roll}: "
          f"rel={err:.2e} vir={verr:.2e}", flush=True)


# the v2 strict small-shape miscompile trigger (ncell 6^3, K=24)
check(8.0, 1536, 0.3)
check(8.0, 1536, 0.3, dyn_roll=True)
check(8.0, 1536, 0.3, spill=True)
check(8.0, 1536, 0.3, spill=True, dyn_roll=True)
# the v2 spill+tea miscompile trigger
check(8.0, 1536, 0.3, spill=True, rng="tea")
check(8.0, 1536, 0.3, spill=True, rng="tea", dyn_roll=True)
check(8.0, 1536, 0.3, rng="tea")
# mid shape, production-like skin
check(12.0, 5184, 0.4, spill=True)
check(12.0, 5184, 0.4, spill=True, dyn_roll=True)
# odd capacity (overlapped last group)
check(8.0, 1536, 0.3, cap=12)

print(f"V3_DEVICE_CHECK {'ALL_PASS' if failures == 0 else 'FAILURES'}",
      flush=True)
