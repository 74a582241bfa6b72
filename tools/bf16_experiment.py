"""Mixed-precision experiment (SURVEY.md §2b row 31).

The reference's 'mixed precision' is fp32 storage/arithmetic in hot CUDA
kernels versus the CPU's fp64 — which this framework already matches
everywhere (fp32 channels, fp32 accumulation, top-23-bit uniform RNG).
The TPU-native question is whether bf16 CHANNEL STORAGE (halved HBM/VMEM
traffic for v and model channels; positions must stay fp32 — bf16's ~3
significant digits cannot resolve dr at box scale) is usable.

This script measures the per-force relative error of bf16 velocity
channels against the fp32 bucket path on a thermal DPD fluid.

Findings (recorded in PERF_NOTES.md): at l=8/n=1536, bf16 velocity
channels give max_rel_err ~ 2.7e-4 and rms ~ 4e-5 relative to the max
force scale (the conservative a*w term dominates, and bf16 error enters
only through the dissipative term). Small enough to be a live round-2
candidate for the Pallas kernel's v channels (halves their VMEM/HBM
traffic) — needs TPU validation of the kT budget over long runs before
becoming default; positions stay fp32 regardless.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from meso_tpu.core.box import Box
    from meso_tpu.core.state import create_random
    from meso_tpu.neighbor.bucket_layout import to_bucket_state
    from meso_tpu.neighbor.cells import CellConfig
    from meso_tpu.ops.bucket_dpd import bucket_forces_xla
    from meso_tpu.ops.dpd import DPDParams

    l = float(os.environ.get("BF16_L", "8.0"))
    box = Box.cubic(l)
    n = int(3.0 * l ** 3)
    st = create_random(jax.random.PRNGKey(0), n, box, kt=1.0)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=3.0, skin=0.3)
    params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=7)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(11)

    f32, _ = bucket_forces_xla(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                               box, step, params, 0.01, cfg, rng_mode="fast")
    v_bf16 = bst.v.astype(jnp.bfloat16).astype(jnp.float32)
    fbf, _ = bucket_forces_xla(bst.x, v_bf16, bst.typ, bst.tag, bst.mask,
                               box, step, params, 0.01, cfg, rng_mode="fast")
    m = np.asarray(bst.mask)
    err = np.abs(np.asarray(fbf)[m] - np.asarray(f32)[m])
    scale = np.abs(np.asarray(f32)[m]).max()
    print(f"n={n}  max_rel_err={err.max() / scale:.3e}  "
          f"rms_rel_err={np.sqrt((err ** 2).mean()) / scale:.3e}")


if __name__ == "__main__":
    main()
