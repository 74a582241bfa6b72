"""v3 kernel at 1M: exact-subset correctness gate + timing (r3).

Device facts driving this probe:
* v3 at l=70 with AUTO z-chunking (zc=2, l_lane 1458) fails to COMPILE;
  explicit zc in {5, 10, 25} keeps the lane vector small.
* The static-path miscompile is determined by the row width w_lane
  (tools/v3_lane_scan*.py): w % 16 in {10, 11} is the validated-good
  class; 1M has nx=50 -> w=54 (bad) -> w_pad=58.
* v2 at 1M (w=54) was never force-checked on device (the r2 suite shapes
  all landed in the good width class by luck) — gate it here too via the
  exact subset oracle (tools/subset_oracle.py), which needs no dense
  O(N^2) pass.

Run alone (one device client): nohup python tools/v3_1m_probe.py > LOG &
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

from meso_tpu.core.system import run_bucket_chunked
from meso_tpu.kernels.pair_dpd_fused import bucket_forces_pallas_fused
from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.models.classic import classic_fluid
from meso_tpu.obs import kinetic_temperature
from tools.subset_oracle import subset_check

L_BOX = 70.0


def subset_gate(l, kern, zc=0, w_pad=0, rng="fast", skin=0.4, m=384):
    """Kernel force field at the FULL shape vs the exact subset oracle."""
    try:
        system, params, state = classic_fluid(
            l=l, rebuild_every=3, skin=skin, rng_mode=rng,
            force_path="pallas", pair_kernel=kern, z_chunks=zc)
        cfg = system.cells
        step = jnp.int32(7)
        if kern == "v3":
            f, vir = bucket_forces_pallas_v3(
                state.x, state.v, state.typ, state.tag, state.mask,
                state.box, step, params.pair, system.dt, cfg, rng_mode=rng,
                interpret=False, z_chunks=zc, w_pad=w_pad)
        else:
            f, vir = bucket_forces_pallas_fused(
                state.x, state.v, state.typ, state.tag, state.mask,
                state.box, step, params.pair, system.dt, cfg, rng_mode=rng)
        jax.block_until_ready(f)
    except Exception as e:
        print(f"GATE ERROR {kern} l={l} zc={zc} wpad={w_pad}: "
              f"{type(e).__name__}: {str(e)[:1500]}", flush=True)
        return False
    ok, err = subset_check(
        state.x, state.v, state.tag, state.mask, state.box.lengths, 7,
        params.pair, system.dt, rng, f, m=m,
        label=f"{kern} l={l} zc={zc} wpad={w_pad} rng={rng} "
              f"K={cfg.capacity}")
    return ok


def timing(l, zc, w_pad=0, skin=0.4, every=3, steps=30, rng="fast",
           wrap="step", rengine="gather", kernel="v3"):
    try:
        system, params, state = classic_fluid(
            l=l, rebuild_every=every, skin=skin, rng_mode=rng,
            force_path="pallas", pair_kernel=kernel, rebuild=rengine,
            wrap_mode=wrap, z_chunks=zc)
        n = int(state.n_valid())
        nch = max(steps // every, 1)
        t0 = time.time()
        state, diag = run_bucket_chunked(system, params, state, nch, every)
        jax.block_until_ready(state.x)
        tc = time.time() - t0
        t0 = time.time()
        state, diag = run_bucket_chunked(system, params, state, nch, every)
        jax.block_until_ready(state.x)
    except Exception as e:
        print(f"ERROR l={l} zc={zc} rng={rng} wrap={wrap}: "
              f"{type(e).__name__}: {str(e)[:1500]}", flush=True)
        return None
    dt = (time.time() - t0) / (nch * every)
    kt = float(kinetic_temperature(state.v, params.mass[state.typ],
                                   state.mask))
    of = float(np.max(np.asarray(diag.get("bucket_overflow", 0))))
    sr = float(np.max(np.asarray(diag.get("worst_skin_ratio", 0.0))))
    print(f"TIMING l={l} n={n} kern={kernel} zc={zc} wpad={w_pad} "
          f"skin={skin} every={every} rng={rng} wrap={wrap} rb={rengine}: "
          f"{dt * 1e3:.1f} ms/step ({n / dt:.3e} ps/s) kT={kt:.4f} "
          f"of={of:.0f} skin_ratio={sr:.2f} compile+warm={tc:.0f}s",
          flush=True)
    return dt


if __name__ == "__main__":
    # Post-root-cause ordering (PERF_NOTES r3): the width rule was an
    # artifact of the bitcast-channel corruption, now fixed by the
    # value-carried design — gate the NATURAL width first and engage the
    # w_pad fallback only if it fails. Production-candidate timings run
    # FIRST (compile time is the scarce resource on this worker).
    # 1. v3 at the production shape: natural width, explicit z-chunks
    #    (auto-zc picks zc=2 -> l_lane 1458 which fails to COMPILE)
    ok = subset_gate(L_BOX, "v3", zc=5)
    wp = 0
    if not ok:
        import meso_tpu.kernels.pair_dpd_v3 as v3mod
        v3mod._W_RESIDUES = frozenset({10, 11})
        ok = subset_gate(L_BOX, "v3", zc=5, w_pad=58)
        wp = 58
    if ok:
        # production candidate: sort rebuild + deferred wrap (both gated
        # on-device by tools/v3_gate3.py / r2 suite at small shapes)
        timing(L_BOX, 5, w_pad=wp, rengine="sort", wrap="rebuild")
        # reference-parity RNG at 1M (VERDICT r2 item 2)
        if subset_gate(L_BOX, "v3", zc=5, w_pad=wp, rng="tea", m=256):
            timing(L_BOX, 5, w_pad=wp, rng="tea", rengine="sort",
                   wrap="rebuild")
        # ablations (cheapest last): wrap=step, gather rebuild
        timing(L_BOX, 5, w_pad=wp, rengine="sort")
        timing(L_BOX, 5, w_pad=wp)
    else:
        # fall back: probe other chunkings before giving up
        for zc in (10, 25):
            if subset_gate(L_BOX, "v3", zc=zc):
                timing(L_BOX, zc, rengine="sort", wrap="rebuild")
                break
    # settle the v2@1M correctness question (w=54, never force-gated;
    # the r2 bench number's kT ran on this path)
    subset_gate(L_BOX, "v2")
    print("V3_1M_PROBE_DONE", flush=True)
