"""Minimal compiled-v3 probe: ONE config, dyn_roll selectable, prints
compile + run time and parity vs the dense oracle. Used to find out
whether the big static-unroll program is slow-to-compile on the remote
toolchain (run the dyn_roll=1 variant first — its program is ~20x
smaller). Usage:

    python tools/v3_compile_probe.py [dyn]   # 'dyn' -> dyn_roll=True

Run ONE attempt with a generous outer timeout; do NOT kill it mid-compile
(a killed Mosaic compile wedges the remote worker; CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

dyn = len(sys.argv) > 1 and sys.argv[1] == "dyn"
print("dev:", jax.devices(), "dyn_roll:", dyn, flush=True)

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams, dense_forces

params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)
l, n = 8.0, 1536
box = Box.cubic(l)
st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l ** 3, skin=0.3,
                         spill=True)
bst = to_bucket_state(st, cfg)
step = jnp.int32(42)

t0 = time.time()
f_p, vir_p = bucket_forces_pallas_v3(
    bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
    cfg, rng_mode="fast", interpret=False, dyn_roll=dyn)
jax.block_until_ready(f_p)
print(f"compile+first-run: {time.time() - t0:.1f}s", flush=True)

t0 = time.time()
for _ in range(5):
    f_p, vir_p = bucket_forces_pallas_v3(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast", interpret=False, dyn_roll=dyn)
jax.block_until_ready(f_p)
print(f"steady: {(time.time() - t0) / 5 * 1e3:.2f} ms", flush=True)

f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                             box, step, params, 0.01, rng_mode="fast")
m = np.asarray(bst.mask)
fd, fp = np.asarray(f_d), np.asarray(f_p)
err = np.abs(fp[m] - fd[m]).max() / np.abs(fd).max()
verr = abs(float(vir_p) - float(vir_d)) / abs(float(vir_d))
print(f"parity rel={err:.2e} vir={verr:.2e} -> "
      f"{'PASS' if err < 5e-5 else 'FAIL'}", flush=True)
