"""TRUE-interpret CPU parity check of the v3 kernel (pre-device gate).

Forces the CPU platform and disables the pallas axon pool (CLAUDE.md r3:
with PALLAS_AXON_POOL_IPS set, interpret=True silently runs the REMOTE
compiled kernel). Run plainly: python tools/v3_cpu_check.py
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

P = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)


def probe(l, n, skin, spill, dyn, zc=0, cap=None, rng="fast", label=""):
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l ** 3, skin=skin,
                             spill=spill, capacity=cap)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(42)
    f_p, vir_p = bucket_forces_pallas_v3(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, P, 0.01, cfg,
        rng_mode=rng, interpret=True, dyn_roll=dyn, z_chunks=zc)
    f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                                 box, step, P, 0.01, rng_mode=rng)
    m = np.asarray(bst.mask)
    fd, fp = np.asarray(f_d), np.asarray(f_p)
    err = np.abs(fp[m] - fd[m]).max() / np.abs(fd).max()
    verr = abs(float(vir_p) - float(vir_d)) / abs(float(vir_d))
    ok = err < 5e-5 and verr < 1e-3
    print(f"{'PASS' if ok else 'FAIL'} {label} ncell={cfg.ncell} "
          f"K={cfg.capacity} spill={spill} dyn={dyn} zc={zc} rng={rng}: "
          f"rel={err:.2e} vir={verr:.2e}", flush=True)
    return ok


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    oks = [
        probe(8.0, 1536, 0.3, False, False, label="strict-static"),
        probe(8.0, 1536, 0.3, True, False, label="spill-static"),
        probe(8.0, 1536, 0.3, True, True, label="spill-dyn"),
        probe(9.0, 2187, 0.3, False, False, zc=3, label="zc3-static"),
        probe(8.0, 1536, 0.3, True, True, rng="tea", label="tea-dyn"),
        probe(8.0, 1536, 0.3, False, False, cap=28, label="oddK-static"),
    ]
    print("V3_CPU_CHECK", "ALL PASS" if all(oks) else "FAILURES", flush=True)
