"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.md): particle-steps/sec/chip on a ~1M-particle classic DPD
fluid (rho=3, a=25, gamma=4.5, rc=1, dt=0.01), kinetic temperature within 1%
of target. vs_baseline is measured against the BASELINE.json north-star of
1e9 particle-steps/sec/chip.

Runs the fused pallas-path production loop on jax.devices()[0] (the real
TPU chip under the driver). Env overrides: MESO_BENCH_L (box side, default
70 -> 1,029,000 particles), MESO_BENCH_STEPS, MESO_BENCH_PATH
(pallas|bucket|nlist), MESO_BENCH_SKIN, MESO_BENCH_REBUILD.

Robustness: the TPU worker of this pool can hang (not raise) when it is
down, so every configuration runs in a SUBPROCESS with a hard timeout and
the harness walks an escalation ladder (1M TPU -> 98k TPU -> CPU) until a
JSON line is produced — the driver always gets a record.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_config(l, path, skin, every, nsteps, equil=399):
    import jax
    import jax.numpy as jnp

    from meso_tpu.core.system import run_adaptive, run_bucket_chunked
    from meso_tpu.models.classic import classic_fluid
    from meso_tpu.obs import kinetic_temperature

    rng_mode = os.environ.get("MESO_BENCH_RNG", "fast")
    kernel = os.environ.get("MESO_BENCH_KERNEL", "v3")
    rengine = os.environ.get("MESO_BENCH_REBUILD_ENGINE", "gather")
    wrap_mode = os.environ.get("MESO_BENCH_WRAP", "step")
    zc = int(os.environ.get("MESO_BENCH_ZCHUNKS", "0"))
    system, params, state = classic_fluid(
        l=l, rebuild_every=every, skin=skin, rng_mode=rng_mode,
        force_path=path, pair_kernel=kernel, rebuild=rengine,
        wrap_mode=wrap_mode, z_chunks=zc)
    # Groot-Warren lambda: 0.65 halves the dt=0.01 kT artifact vs 0.5
    # (device, averaged: 1.0104+-0.0005 at 0.5 vs 1.0062+-0.0012 at
    # 0.65, same speed — tools/r5c_tea.py). 0.5 is the plain-VV
    # reference default; the bench needs the in-band artifact.
    lam = float(os.environ.get("MESO_BENCH_LAM", "0.65"))
    if lam != system.lam:
        system = system.replace(lam=lam)
    n = int(state.n_valid())
    fused = path in ("pallas", "bucket")

    def advance(s, steps):
        if fused:
            # thermo_trace off: throughput run; kT honesty comes from the
            # final-state reduction below
            return run_bucket_chunked(system, params, s,
                                      max(steps // every, 1), every,
                                      thermo_trace=False)
        return run_adaptive(system, params, s, steps)

    # equilibrate (hot random start -> kT 1.0) + warm the compile cache
    state, _ = advance(state, equil)
    jax.block_until_ready(state.x)

    t0 = time.perf_counter()
    state, diag = advance(state, nsteps)
    jax.block_until_ready(state.x)
    dt_wall = time.perf_counter() - t0

    steps = (max(nsteps // every, 1) * every) if fused else nsteps
    ps_per_s = n * steps / dt_wall
    kt = float(kinetic_temperature(
        state.v, params.mass[state.typ], state.mask))
    # Averaged kT with error bars (CLAUDE.md physics rule / VERDICT r4
    # item 8): a short traced run AFTER the timed window; quote
    # mean +- sem with an autocorrelation-corrected n_eff.
    kt_stats = {}
    if fused:
        import numpy as _np
        state, d2 = run_bucket_chunked(system, params, state,
                                       max(60 // every, 1), every,
                                       thermo_trace=True)
        kts = _np.asarray(d2["kt_trace"])
        if kts.size > 4:
            dk = kts - kts.mean()
            acf1 = float((dk[:-1] * dk[1:]).mean() / max(dk.var(), 1e-30))
            tau = (1 + acf1) / max(1 - acf1, 1e-3)
            n_eff = max(kts.size / (2 * tau), 1.0)
            sem = float(kts.std(ddof=1) / _np.sqrt(n_eff))
            kt_stats = {"kT_mean": round(float(kts.mean()), 4),
                        "kT_sem": round(sem, 4),
                        "kT_3sig": round(3 * sem, 4),
                        "kT_n_eff": round(n_eff, 1)}
            kt = float(kts.mean())
    result = {
        "metric": "particle-steps/sec/chip (1M DPD fluid, rho=3)",
        "value": round(ps_per_s, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(ps_per_s / 1e9, 4),
        "n_particles": n,
        "steps": steps,
        "wall_s": round(dt_wall, 3),
        "kT": round(kt, 4),
        "kT_err": round(abs(kt - 1.0), 4),
        "force_path": path,
        "pair_kernel": kernel,
        "rebuild_engine": rengine,
        "wrap_mode": wrap_mode,
        "lambda": lam,
        "z_chunks": zc,
        "rng_mode": rng_mode,
        "device": str(jax.devices()[0]),
        # launch-shape knobs in effect (SURVEY 2b row 29)
        "skin": skin,
        "rebuild_every": every,
        "capacity_K": system.cells.capacity,
        "spill": bool(getattr(system.cells, "spill", False)),
        "ncell": list(system.cells.ncell),
    }
    result.update(kt_stats)
    for key in ("bucket_overflow", "worst_skin_ratio", "cell_overflow",
                "nlist_overflow", "n_rebuilds"):
        if key in diag:
            result[key] = round(float(jnp.max(jnp.asarray(diag[key]))), 3)
    return result


def _child():
    l = float(os.environ.get("MESO_BENCH_L", "70"))
    path = os.environ.get("MESO_BENCH_PATH", "pallas")
    skin = float(os.environ.get("MESO_BENCH_SKIN", "0.4"))
    every = int(os.environ.get("MESO_BENCH_REBUILD", "3"))
    nsteps = int(os.environ.get("MESO_BENCH_STEPS", "201"))
    equil = int(os.environ.get("MESO_BENCH_EQUIL", "399"))
    print(json.dumps(run_config(l, path, skin, every, nsteps, equil)),
          flush=True)


def _try(env_overrides: dict, timeout_s: int):
    """Run one config in a subprocess; return its parsed JSON or None."""
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_overrides.items()})
    env["MESO_BENCH_CHILD"] = "1"
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"[bench] {env_overrides}: timeout {timeout_s}s\n")
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    sys.stderr.write(f"[bench] {env_overrides}: rc={out.returncode} "
                     f"stderr tail: {out.stderr[-400:]}\n")
    return None


def _probe_device(timeout_s: int = 120) -> bool:
    """Can the accelerator run a trivial op? A DOWN worker HANGS (never
    raises), so this runs in a subprocess with a hard timeout."""
    code = ("import jax, jax.numpy as jnp;"
            "print(int(jnp.arange(8).sum()))")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
        return out.returncode == 0 and "28" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_for_device(max_wait_s: int = 2700, poll_s: int = 180) -> bool:
    """Wait-and-retry rung (VERDICT r4 item 2): the worker recovers from
    crashes in 10-90 min, so a single failed probe must NOT send the
    official record to the CPU rung. Probe now, then every ``poll_s``
    until ``max_wait_s`` elapses. Override budget with MESO_BENCH_WAIT_S
    (0 = single probe, for tests)."""
    max_wait_s = int(os.environ.get("MESO_BENCH_WAIT_S", max_wait_s))
    t0 = time.time()
    if _probe_device():
        return True
    while time.time() - t0 < max_wait_s:
        wait = min(poll_s, max(max_wait_s - (time.time() - t0), 1))
        sys.stderr.write(f"[bench] worker down {int(time.time() - t0)}s; "
                         f"re-probing in {int(wait)}s\n")
        time.sleep(wait)
        if _probe_device():
            return True
    return False


def main():
    if os.environ.get("MESO_BENCH_CHILD"):
        _child()
        return
    l = os.environ.get("MESO_BENCH_L", "70")
    if _wait_for_device():
        # rung 1: the r5 production winner (tools/r5e_matrix.py CELL
        # dynroll-zc2-rebuild-vir = 51.4 ms/step = 2.00e7 ps/s at 1M):
        # v3 kernel with dynamic-shift rolls at z_chunks=2 (the fori
        # offset body compiles at l_lane 1536 where the static unroll
        # cannot; z-halo target waste 1.2x -> 1.08x), deferred box wrap
        # (min-image-free kernel, of=0 + subset oracle 2.2e-6 at 1M).
        # rung 2: the static-zc5 config (r4-proven). rung 3: v2.
        v3_cfg = {"MESO_BENCH_L": l, "MESO_BENCH_KERNEL": "v3_dynroll",
                  "MESO_BENCH_ZCHUNKS": 2,
                  "MESO_BENCH_WRAP": "rebuild",
                  "MESO_BENCH_REBUILD_ENGINE": "sort"}
        ladder = [
            (v3_cfg, 3000),
            ({"MESO_BENCH_L": l, "MESO_BENCH_KERNEL": "v3",
              "MESO_BENCH_ZCHUNKS": 5,
              "MESO_BENCH_REBUILD_ENGINE": "sort"}, 2400),
            ({"MESO_BENCH_L": l, "MESO_BENCH_KERNEL": "v2"}, 2400),
            ({"MESO_BENCH_L": 32}, 1200),
        ]
    else:
        sys.stderr.write("[bench] worker stayed down for the whole wait "
                         "budget — falling to the CPU rung\n")
        ladder = []
    # last resort: the TPU worker is unreachable/hung — measure the XLA
    # bucket path on CPU so the driver still gets a record. Sized to ALWAYS
    # finish on the 1-core host (r1 lesson: L=16 x 600 steps timed out):
    # L=10 -> 3000 particles, 201 equil + 63 measured steps, ~4 min total
    # (measured r2: 63+63 steps = 2m04s incl. compile on the 1-core host).
    ladder.append(({"MESO_BENCH_L": 10, "MESO_BENCH_PATH": "bucket",
                    "MESO_BENCH_EQUIL": 201, "MESO_BENCH_STEPS": 63,
                    "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""},
                   900))
    for i, (cfg, tmo) in enumerate(ladder):
        result = _try(cfg, tmo)
        if result is not None:
            if str(cfg.get("MESO_BENCH_L")) != str(l):
                result["note"] = f"fallback rung: {cfg}"
            print(json.dumps(result))
            return
    print(json.dumps({"metric":
                      "particle-steps/sec/chip (1M DPD fluid, rho=3)",
                      "value": 0.0, "unit": "particle-steps/s",
                      "vs_baseline": 0.0,
                      "note": "all bench rungs failed (TPU worker down)"}))


if __name__ == "__main__":
    main()
