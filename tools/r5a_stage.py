"""r5 session A / stage 1: the v3 kernel stage breakdown at 1M.

VERDICT r4 item 1 + weak 1: reconcile the 93.5 ms standalone-kernel
measurement (/tmp/kprobe.log, r4) against the ~51 ms/step kernel+integrate
implied by BENCH_r04 (66.93 total - 48.5/3 rebuild), and produce the
per-stage numbers the layout decision needs:

  T_step      production loop ms/step (run_bucket_chunked, thermo off)
  T_rebuild   sort-engine rebuild, standalone
  T_call      standalone force call = prep + pallas + epilogue
  T_null      null-math pallas_call with IDENTICAL grid/specs/out_shape
              (pure DMA + grid dispatch + output-write floor)
  T_epi       epilogue replica on a dummy out tensor
  census      exact candidate count + static op count -> achieved VPU
              ops/cycle vs the 8x128 single-issue vreg model

Also times the real kernel at zc=10 (l_lane 378) and the null kernel at
zc in {5, 10, 25} for the dispatch-overhead slope.

Equilibrates 300 steps first (probe states must be physical — VERDICT r4
weak 4) and saves the state to /tmp/r5_eq1m.npz for the later session-A
scripts (wrap/tea/tune) to reuse.

SMOKE=1 env: run everything tiny (l=12) on CPU interpret to validate the
null kernel + harness before touching the device (CLAUDE.md rule).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

SMOKE = os.environ.get("SMOKE") == "1"
if SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["MESO_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("dev:", jax.devices(), flush=True)

from meso_tpu.core.system import run_bucket_chunked
from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.models.classic import classic_fluid
from meso_tpu.neighbor.bucket_layout import rebuild_buckets
from meso_tpu.obs import kinetic_temperature
from meso_tpu.io.restart import save_restart, load_restart

L_BOX = 12.0 if SMOKE else 70.0
ZC = 1 if SMOKE else 5
EQ_STEPS = 30 if SMOKE else 300
EQ_PATH = "/tmp/r5_eq1m.npz"


def timeit(fn, reps=3 if SMOKE else 10):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, sorted(ts)[len(ts) // 2] * 1e3


def null_pallas(view, n_chan, ny, zc, kp, l_lane, n_out=4):
    """pallas_call with the v3 kernel's EXACT grid/in/out specs but null
    math: reads both band blocks, writes every output plane once. Measures
    the DMA + grid-dispatch + output-write floor of the real kernel."""

    def kern(scal, iscal, tab, jm, offs, b_mid, b_down, out_ref):
        s = b_mid[0, 0, 0] + b_down[1, 0, 0]
        for c in range(n_out):
            out_ref[c, 0, 0, 0] = s
            out_ref[c, 1, 0, 0] = s

    def band_spec(dy):
        return pl.BlockSpec((n_chan, 1, 1, kp, l_lane),
                            index_map=lambda cy, cb: (0, cy + dy, cb, 0, 0),
                            memory_space=pltpu.VMEM)

    scal = jnp.zeros((1, 12), jnp.float32)
    iscal = jnp.zeros((1, 2), jnp.int32)
    tab = jnp.zeros((5, 1), jnp.float32)
    jm = jnp.zeros((2, ny * zc), jnp.int32)
    offs = jnp.zeros((1, 22), jnp.int32)
    in_specs = [
        pl.BlockSpec((1, 12), lambda cy, cb: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda cy, cb: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((5, 1), lambda cy, cb: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((2, ny * zc), lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 22), lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        band_spec(1), band_spec(2),
    ]
    call = pl.pallas_call(
        kern, grid=(ny, zc), in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n_out, 2, 1, 1, kp, l_lane),
            index_map=lambda cy, cb: (0, 0, cy, cb, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, 2, ny, zc, kp, l_lane),
                                       jnp.float32),
        interpret=SMOKE)
    return jax.jit(lambda v: call(scal, iscal, tab, jm, offs, v, v))


def epilogue_replica(out, ny, zc, kp, l_log, l_lane, body_z, w_lane, nx,
                     nz, xr, n_out=4):
    """The v3 epilogue ops (pair_dpd_v3.py:795-812) on a dummy tensor."""
    combined = out[:, 0] + jnp.roll(out[:, 1], 1, axis=1)
    arr = combined[..., :l_log].reshape(n_out, ny, zc, kp, body_z, w_lane)
    core = arr[..., xr:xr + nx]
    core = core.at[..., nx - xr:].add(arr[..., :xr])
    core = core.at[..., :xr].add(arr[..., nx + xr:nx + 2 * xr])
    if body_z > nz // zc:
        zcore = core[..., 1:-1, :]
        zcore = zcore.at[:, :, :, :, -1, :].add(
            jnp.roll(core[:, :, :, :, 0, :], -1, axis=2))
        zcore = zcore.at[:, :, :, :, 0, :].add(
            jnp.roll(core[:, :, :, :, -1, :], 1, axis=2))
        core = zcore
    outp = core.transpose(0, 1, 2, 4, 3, 5).reshape(
        n_out, ny, nz, kp, nx)
    return jnp.stack([outp[0].reshape(-1), outp[1].reshape(-1),
                      outp[2].reshape(-1)], axis=-1)


def main():
    system, params, state = classic_fluid(
        l=L_BOX, rebuild_every=3, skin=0.4, rng_mode="fast",
        force_path="pallas", pair_kernel="v3", rebuild="sort",
        z_chunks=ZC)
    cfg = system.cells
    n = int(state.n_valid())
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    print(f"config: n={n} ncell={cfg.ncell} K={k} zc={ZC} "
          f"skin={cfg.skin} every={cfg.rebuild_every}", flush=True)

    # --- equilibrate (physical probe state) + persist for later scripts
    if not SMOKE and os.path.exists(EQ_PATH):
        state = load_restart(EQ_PATH)
        print("loaded equilibrated state", flush=True)
    else:
        t0 = time.time()
        state, diag = run_bucket_chunked(system, params, state,
                                         EQ_STEPS // 3, 3,
                                         thermo_trace=False)
        jax.block_until_ready(state.x)
        kt = float(kinetic_temperature(state.v, params.mass[state.typ],
                                       state.mask))
        of = float(np.asarray(diag["bucket_overflow"]))
        sr = float(np.asarray(diag["worst_skin_ratio"]))
        print(f"equilibrated {EQ_STEPS} steps in {time.time()-t0:.0f}s: "
              f"kT={kt:.4f} of={of:.0f} skin_ratio={sr:.3f}", flush=True)
        if not SMOKE:
            save_restart(EQ_PATH, state)

    # --- T_step: production loop
    tmin, tmed = timeit(lambda: run_bucket_chunked(
        system, params, state, 10, 3, thermo_trace=False)[0].x,
        reps=2 if SMOKE else 3)
    t_step = tmin / 30
    print(f"T_step  = {t_step:.2f} ms/step (30-step loop, min of runs)",
          flush=True)

    # --- T_rebuild: sort engine standalone
    rb = jax.jit(partial(rebuild_buckets, cfg=cfg))
    tmin, tmed = timeit(lambda: rb(state)[0].x)
    print(f"T_rebuild = {tmin:.2f} ms (sort engine, standalone)", flush=True)

    # --- T_call: standalone force call (prep + pallas + epilogue)
    step_c = jnp.int32(11)

    def call():
        f, vir = bucket_forces_pallas_v3(
            state.x, state.v, state.typ, state.tag, state.mask, state.box,
            step_c, params.pair, system.dt, cfg, rng_mode="fast",
            interpret=SMOKE or None, z_chunks=ZC)
        return f
    tmin, tmed = timeit(call)
    print(f"T_call  = {tmin:.2f} ms (standalone v3 zc={ZC}: "
          f"prep+pallas+epilogue)", flush=True)

    # --- zc=10 real-kernel timing (l_lane 378)
    if not SMOKE:
        def call10():
            f, vir = bucket_forces_pallas_v3(
                state.x, state.v, state.typ, state.tag, state.mask,
                state.box, step_c, params.pair, system.dt, cfg,
                rng_mode="fast", z_chunks=10)
            return f
        try:
            tmin, tmed = timeit(call10)
            print(f"T_call(zc=10) = {tmin:.2f} ms", flush=True)
        except Exception as e:
            print(f"zc=10 call FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # --- geometry shared by the null/epilogue replicas
    xr = 2 if cfg.spill else 1
    w_lane = nx + 2 * xr
    kp = -(-k // 8) * 8
    n_chan = 8

    # --- T_null at the zc ladder
    for zc_i in ([ZC] if SMOKE else [5, 10, 25]):
        if nz % zc_i:
            continue
        nzc = nz // zc_i
        body_z = nzc + 2 if (zc_i > 1 or SMOKE is False) else nz
        l_log = body_z * w_lane
        l_lane = l_log
        view = jnp.zeros((n_chan, ny + 2, zc_i, kp, l_lane), jnp.float32)
        try:
            fn = null_pallas(view, n_chan, ny, zc_i, kp, l_lane)
            tmin, tmed = timeit(lambda: fn(view))
            gsteps = ny * zc_i
            print(f"T_null(zc={zc_i}) = {tmin:.2f} ms  "
                  f"({gsteps} grid steps, l_lane={l_lane}, "
                  f"{tmin/gsteps*1e3:.1f} us/grid-step)", flush=True)
        except Exception as e:
            print(f"null zc={zc_i} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # --- T_epi: epilogue replica
    nzc = nz // ZC
    body_z = nzc + 2 if ZC > 1 else nz
    l_log = body_z * w_lane
    out_dummy = jnp.zeros((4, 2, ny, ZC, kp, l_log), jnp.float32)
    epi = jax.jit(partial(epilogue_replica, ny=ny, zc=ZC, kp=kp,
                          l_log=l_log, l_lane=l_log, body_z=body_z,
                          w_lane=w_lane, nx=nx, nz=nz, xr=xr))
    tmin, tmed = timeit(lambda: epi(out_dummy))
    print(f"T_epi   = {tmin:.2f} ms (epilogue replica)", flush=True)

    # --- census: exact candidate + op counts -> achieved ops/cycle
    shape = (ny, nz, k, nx)
    vmask = np.asarray(state.mask, np.float32).reshape(shape)
    occ_slot = np.where(vmask > 0.5,
                        np.arange(1, k + 1, dtype=np.int32)[None, None, :,
                                                            None], 0)
    occ_yz = occ_slot.max(axis=(2, 3))
    occ_pad = np.concatenate([occ_yz[:, -1:], occ_yz, occ_yz[:, :1]], axis=1)
    jm_rows = np.stack(
        [occ_pad[:, i * nzc:i * nzc + nzc + 2].max(axis=1)
         for i in range(ZC)], axis=1)
    jm_mid = np.maximum(jm_rows, 1)
    jm_down = np.roll(jm_mid, -1, axis=0)
    mid_offs = xr + (2 * xr + 1)
    down_offs = 3 * (2 * xr + 1)
    l_lane = l_log

    def rows_of(jm, base_offs, center):
        g_on = np.ceil(jm / 8.0).clip(1)          # groups that run
        rows = g_on * 8 * base_offs
        if center:
            rows = rows + g_on * 8 - 1            # center pass (g0=0: 7)
        return rows.sum()

    pr_calls = rows_of(jm_mid, mid_offs, True) + rows_of(jm_down, down_offs,
                                                         False)
    cands = pr_calls * kp * l_lane
    print(f"census: pair_rows calls={pr_calls:.0f} lane area={kp}x{l_lane} "
          f"candidates/step={cands:.3e} per-particle={cands/n:.0f}",
          flush=True)
    occup = vmask.sum() / (nx * ny * nz)
    g1_skip = float((jm_mid <= 8).mean())
    print(f"occupancy={occup:.2f}/{k} per cell  (row, chunk)s with groups"
          f" beyond 8 skipped: {g1_skip*100:.0f}%", flush=True)
    # static op count per candidate (pair_rows fast/min_image/s=1): see
    # PERF_NOTES r5; ~64 VPU ops counting where/cmp/and as 1 each
    OPS = 64
    print(f"vreg model: {cands*OPS:.3e} ops/step; single-issue 8x128 @940MHz"
          f" -> {cands*OPS/(1024*0.94e9)*1e3:.1f} ms", flush=True)
    print("R5A_STAGE_DONE", flush=True)


if __name__ == "__main__":
    main()
