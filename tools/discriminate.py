"""Device-miscompile discriminator (VERDICT r2 weak #3).

Runs the compiled fused kernel AND the XLA sweep against the dense O(N^2)
oracle on the shapes where the strict-bucket fused kernel was observed to
miscompile on the axon v5e toolchain (PERF_NOTES.md registry), and localizes
wrong rows by (cx, slot, cy, cz). Run ON DEVICE via
``python tools/tpu_retry.py --timeout 900 tools/discriminate.py`` —
one TPU client at a time (CLAUDE.md worker discipline).
"""
import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax, jax.numpy as jnp, numpy as np
print("dev:", jax.devices(), flush=True)
from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.kernels.pair_dpd_fused import bucket_forces_pallas_fused
from meso_tpu.ops.bucket_dpd import bucket_forces_xla
from meso_tpu.ops.dpd import DPDParams, dense_forces

params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)

def run(l, n, skin, cap=None, spill=False):
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
    cfg = CellConfig.for_box([l]*3, rc=1.0, density=n/l**3, skin=skin,
                             capacity=cap, spill=spill)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(42)
    m = np.asarray(bst.mask)
    f_d, _, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask, box,
                             step, params, 0.01, rng_mode="fast")
    fd = np.asarray(f_d); scale = np.abs(fd).max()
    f_p, _ = bucket_forces_pallas_fused(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast", interpret=False)
    e_p = np.abs(np.asarray(f_p)[m] - fd[m]).max() / scale
    f_x, _ = jax.jit(bucket_forces_xla,
                     static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast") if not spill else (None, None)
    e_x = (np.abs(np.asarray(f_x)[m] - fd[m]).max() / scale
           if f_x is not None else float("nan"))
    print(f"l={l} cfg={cfg.ncell} K={cfg.capacity} spill={cfg.spill}: "
          f"fused_vs_dense={e_p:.2e} xla_vs_dense={e_x:.2e}", flush=True)
    if e_p > 1e-4:
        # localize: which rows are wrong?
        bad = np.abs(np.asarray(f_p) - fd).max(axis=1) / scale > 1e-4
        rows = np.where(bad & m)[0]
        nx, ny, nz = cfg.ncell; k = cfg.capacity
        cy = rows // (nx * k * nz)
        cz = (rows // (nx * k)) % nz
        print(f"  bad rows: {len(rows)} of {m.sum()}; "
              f"cx={sorted(set((rows % nx).tolist()))[:12]} "
              f"slot={sorted(set(((rows // nx) % k).tolist()))[:24]} "
              f"cy={sorted(set(cy.tolist()))} cz={sorted(set(cz.tolist()))}",
              flush=True)

run(8.0, 1536, 0.3)                    # the failing suite config (K=24)
run(8.0, 1536, 0.3, cap=20)            # strict K=20
run(8.0, 1536, 0.3, cap=32)            # strict K=32
run(8.0, 1536, 0.3, cap=28)            # strict K=28 (the 98k capacity)
run(12.0, 5184, 0.3)                   # bigger box (ncx=9, L=99, K=24)
run(8.0, 1536, 0.3, spill=True)        # control (passed before)
print("DISCRIMINATE_DONE", flush=True)
