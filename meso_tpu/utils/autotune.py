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
    pair_kernel: str = "v2"
    rebuild: str = "gather"
    capacity: int = 0
    wrap_mode: str = ""


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
        # r3: cadence extended beyond 10 and rebuild-engine/kernel knobs
        # join the sweep (VERDICT r2 weak #6)
        candidates = [dict(skin=0.3, every=3), dict(skin=0.4, every=5),
                      dict(skin=0.5, every=5), dict(skin=0.5, every=8),
                      dict(skin=0.65, every=10), dict(skin=0.65, every=14),
                      dict(skin=0.8, every=18)]
    candidates = [dict(skin=c[0], every=c[1]) if isinstance(c, tuple)
                  else dict(c) for c in candidates]
    if tune_kernel:
        extra = []
        for c in candidates[:3]:
            for knobs in (dict(spill=True, z_chunks=0),
                          dict(spill=True, z_chunks=2),
                          dict(spill=False, z_chunks=2),
                          dict(spill=True, pair_kernel="v3"),
                          dict(spill=True, pair_kernel="v3",
                               rebuild="sort"),
                          dict(spill=True, pair_kernel="v3",
                               rebuild="sort", wrap_mode="rebuild"),
                          # r5 production winner at 1M (51.4 ms/step):
                          # traced-offset rolls compile at zc=2 where the
                          # static unroll cannot; box-size dependent (at
                          # 98k the lane pad costs 30% — PERF_NOTES r5
                          # session F), hence swept, not hardcoded.
                          dict(spill=True, pair_kernel="v3_dynroll",
                               z_chunks=2, rebuild="sort",
                               wrap_mode="rebuild"),
                          dict(spill=True, rebuild="sort"),
                          dict(spill=True, capacity=24)):
                extra.append({**c, **knobs})
        candidates = candidates + extra
    results = []
    for cand in candidates:
        skin, every = cand["skin"], cand["every"]
        kw = {k: v for k, v in cand.items() if k not in ("skin", "every")}
        try:
            system = make_system(skin, every, **kw)
        except (TypeError, ValueError):
            continue   # caller does not support the knob / invalid combo
        zc = kw.get("z_chunks")
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
                       z_chunks=zc or 0,
                       pair_kernel=getattr(system, "pair_kernel", "v2"),
                       rebuild=getattr(system.cells, "rebuild", "gather"),
                       capacity=system.cells.capacity,
                       wrap_mode=getattr(system, "wrap_mode", "step"))
        results.append(r)
        if verbose:
            print(f"  skin={skin} every={every} spill={r.spill} "
                  f"zc={r.z_chunks} K={r.capacity} kern={r.pair_kernel} "
                  f"rb={r.rebuild}: {r.ms_per_step:.2f} ms/step"
                  f" ({r.ps_per_s:.3e} ps/s, skin_ratio={r.skin_ratio:.2f})",
                  flush=True)
    safe = [r for r in results if r.skin_ratio <= 1.0]
    pool = safe if safe else results
    best = min(pool, key=lambda r: r.ms_per_step)
    if verbose:
        print(f"  -> best: skin={best.skin} every={best.rebuild_every}"
              f" ({best.ps_per_s:.3e} ps/s)", flush=True)
    return best, results
