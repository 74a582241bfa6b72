"""Minimal TRUE-interpret CPU parity check of the v3 int-roll fix.

Small shapes only (the full v3_cpu_check takes >10 min/probe on the
1-core host). Covers the three channel classes the fix touches: the fast
hash channel, the tea tag channel, and the exclusion-tag channels.
Run plainly: python tools/v3_introll_check.py
"""
import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax.numpy as jnp
import numpy as np

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams, dense_forces


def probe(rng, excl=False, label=""):
    l, n = 6.5, 823
    box = Box.cubic(l)
    p = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)
    if excl:
        # fake 1-2 exclusions: consecutive tags
        tags = np.arange(n)
        ex = np.stack([tags - 1, tags + 1], axis=1).astype(np.int32)
        ex[0, 0] = -7
        ex[-1, 1] = -7
        p = p.replace(excl=jnp.asarray(ex), excl_w=jnp.float32(0.25))
    st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l ** 3, skin=0.3,
                             spill=True)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(42)
    f_p, vir_p = bucket_forces_pallas_v3(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, p, 0.01, cfg,
        rng_mode=rng, interpret=True)
    f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                                 box, step, p, 0.01, rng_mode=rng)
    m = np.asarray(bst.mask)
    fd, fp = np.asarray(f_d), np.asarray(f_p)
    err = np.abs(fp[m] - fd[m]).max() / np.abs(fd).max()
    verr = abs(float(vir_p) - float(vir_d)) / abs(float(vir_d))
    ok = err < 5e-5 and verr < 1e-3
    print(f"{'PASS' if ok else 'FAIL'} {label}: rel={err:.2e} "
          f"vir={verr:.2e}", flush=True)
    return ok


if __name__ == "__main__":
    oks = [probe("fast", label="fast"),
           probe("tea", label="tea"),
           probe("fast", excl=True, label="fast+excl")]
    print("V3_INTROLL_CHECK", "ALL PASS" if all(oks) else "FAILURES",
          flush=True)
