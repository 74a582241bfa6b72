"""Runtime autotuning — kernel/config selection by measurement
(SURVEY.md §2b row 29: the reference timed CUDA launch configs during
warmup; here the tunables are the neighbor-machinery shape knobs, measured
on the fused production loop).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax


@dataclass
class TuneResult:
    skin: float
    rebuild_every: int
    ms_per_step: float
    ps_per_s: float
    skin_ratio: float
    spill: bool = False
    z_chunks: int = 0


def autotune_fluid(make_system, params, state0, candidates=None,
                   steps: int = 30, verbose: bool = True,
                   tune_kernel: bool = False):
    """Measure run_bucket_fixed throughput across configuration candidates
    and return the fastest SAFE config (worst_skin_ratio <= 1).

    ``make_system(skin, rebuild_every, spill=..., z_chunks=...)`` must
    return a System whose cells reflect the knobs. ``state0`` is reused
    (copied by jit) per candidate. With ``tune_kernel`` the sweep also
    covers the fused-kernel launch-shape knobs (right-spill packing and
    the z-chunk split — SURVEY §2b row 29's launch-config analog).
    """
    from meso_tpu.core.system import run_bucket_fixed, setup

    if candidates is None:
        candidates = [(0.3, 3), (0.4, 5), (0.5, 5), (0.5, 8), (0.65, 10)]
    candidates = [c if len(c) == 4 else (*c, None, None)
                  for c in candidates]
    if tune_kernel:
        extra = []
        for skin, every, _, _ in candidates[:3]:
            extra += [(skin, every, True, 0), (skin, every, True, 2),
                      (skin, every, False, 2)]
        candidates = candidates + extra
    results = []
    for skin, every, spill, zc in candidates:
        kw = {}
        if spill is not None:
            kw["spill"] = spill
        if zc is not None:
            kw["z_chunks"] = zc
        try:
            system = make_system(skin, every, **kw)
        except (TypeError, ValueError):
            continue   # caller does not support the knob / invalid combo
        state = setup(system, params, state0)
        n_real = int(state.n_valid())
        nchunks = max(steps // every, 1)
        s, diag = run_bucket_fixed(system, params, state, nchunks, every)
        jax.block_until_ready(s.x)
        t0 = time.perf_counter()
        s, diag = run_bucket_fixed(system, params, s, nchunks, every)
        jax.block_until_ready(s.x)
        dt = (time.perf_counter() - t0) / (nchunks * every)
        r = TuneResult(skin=skin, rebuild_every=every,
                       ms_per_step=dt * 1e3, ps_per_s=n_real / dt,
                       skin_ratio=float(diag["worst_skin_ratio"]),
                       spill=bool(getattr(system.cells, "spill", False)),
                       z_chunks=zc or 0)
        results.append(r)
        if verbose:
            print(f"  skin={skin} every={every} spill={r.spill} "
                  f"zc={r.z_chunks}: {r.ms_per_step:.2f} ms/step"
                  f" ({r.ps_per_s:.3e} ps/s, skin_ratio={r.skin_ratio:.2f})",
                  flush=True)
    safe = [r for r in results if r.skin_ratio <= 1.0]
    pool = safe if safe else results
    best = min(pool, key=lambda r: r.ms_per_step)
    if verbose:
        print(f"  -> best: skin={best.skin} every={best.rebuild_every}"
              f" ({best.ps_per_s:.3e} ps/s)", flush=True)
    return best, results
