"""r5 session D: dynroll z-chunking on the PRODUCTION (plane) kernel.

Session B found (on the r5-dev ring variant) that dyn_roll's fori-loop
offset body COMPILES at zc=2 (l_lane 1536) where the static unroll
failed at zc=2 since r3 — and runs 18% faster standalone (54.9 vs 67.3
ms: z-halo waste 1.2x -> 1.08x + 2.5x fewer grid steps). This probes the
same on the shipped kernel, plus zc=1 (halo waste 1.04x, ~13 MB VMEM —
may not fit), and times the production loop at the winning config with
wrap=rebuild + the virial-free thermo-off path.
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
from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.models.classic import classic_fluid
from meso_tpu.obs import kinetic_temperature
from meso_tpu.io.restart import load_restart
from tools.subset_oracle import subset_check

EQ_PATH = "/tmp/r5_eq1m.npz"


def timeit(fn, reps=8):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    system, params, state = classic_fluid(
        l=70.0, rebuild_every=3, skin=0.4, rng_mode="fast",
        force_path="pallas", pair_kernel="v3", rebuild="sort", z_chunks=5)
    cfg = system.cells
    if os.path.exists(EQ_PATH):
        eq = load_restart(EQ_PATH)
        state = state.replace(x=eq.x, v=eq.v, f=eq.f, typ=eq.typ,
                              tag=eq.tag, mask=eq.mask, image=eq.image,
                              step=eq.step)
    n = int(state.n_valid())
    step_c = jnp.int32(11)

    def call(zc, dyn, nv=True):
        f, _ = bucket_forces_pallas_v3(
            state.x, state.v, state.typ, state.tag, state.mask, state.box,
            step_c, params.pair, system.dt, cfg, rng_mode="fast",
            z_chunks=zc, dyn_roll=dyn, need_virial=nv)
        return f

    # anchor + nv on the shipped kernel
    try:
        print(f"T_call(plane zc=5 static)     = {timeit(lambda: call(5, False)):.2f} ms",
              flush=True)
        print(f"T_call(plane zc=5 static, nv) = {timeit(lambda: call(5, False, nv=False)):.2f} ms",
              flush=True)
    except Exception as e:
        print(f"anchor ERROR: {type(e).__name__}: {str(e)[:600]}", flush=True)

    best = None
    for zc in (2, 1):
        try:
            f = call(zc, True)
            jax.block_until_ready(f)
            ok, _ = subset_check(
                state.x, state.v, state.tag, state.mask, state.box.lengths,
                11, params.pair, system.dt, "fast", f, m=256,
                label=f"plane dynroll zc={zc}")
            if ok:
                t = timeit(lambda: call(zc, True))
                print(f"T_call(plane dynroll zc={zc})  = {t:.2f} ms",
                      flush=True)
                if best is None or t < best[1]:
                    best = (zc, t)
        except Exception as e:
            print(f"DYNROLL zc={zc}: {type(e).__name__}: {str(e)[:600]}",
                  flush=True)

    if best is None:
        print("no dynroll win on the plane kernel", flush=True)
        return
    zc = best[0]
    # production loop: wrap=rebuild + dynroll zc + thermo off (nv path)
    sy2, pa2, st2 = classic_fluid(
        l=70.0, rebuild_every=3, skin=0.4, rng_mode="fast",
        force_path="pallas", pair_kernel="v3_dynroll", rebuild="sort",
        wrap_mode="rebuild", z_chunks=zc)
    st2 = st2.replace(x=state.x, v=state.v, f=state.f, typ=state.typ,
                      tag=state.tag, mask=state.mask, image=state.image,
                      step=state.step)
    st2, diag = run_bucket_chunked(sy2, pa2, st2, 10, 3, thermo_trace=False)
    jax.block_until_ready(st2.x)
    t0 = time.time()
    st2, diag = run_bucket_chunked(sy2, pa2, st2, 20, 3, thermo_trace=False)
    jax.block_until_ready(st2.x)
    ms = (time.time() - t0) / 60 * 1e3
    kt = float(kinetic_temperature(st2.v, pa2.mass[st2.typ], st2.mask))
    of = float(np.asarray(diag["bucket_overflow"]))
    sr = float(np.asarray(diag["worst_skin_ratio"]))
    print(f"T_step(plane dynroll zc={zc}, wrap=rebuild, thermo off) = "
          f"{ms:.1f} ms/step ({n/ms*1e3:.3e} ps/s) kT={kt:.4f} of={of:.0f} "
          f"sr={sr:.3f}", flush=True)
    # gate the evolved wrap=rebuild state program too
    from meso_tpu.neighbor.bucket_layout import rebuild_buckets
    st3, _ = rebuild_buckets(st2, sy2.cells)
    f3, _ = bucket_forces_pallas_v3(
        st3.x, st3.v, st3.typ, st3.tag, st3.mask, st3.box, step_c,
        pa2.pair, sy2.dt, sy2.cells, rng_mode="fast", z_chunks=zc,
        dyn_roll=True)
    subset_check(
        st3.x, st3.v, st3.tag, st3.mask, st3.box.lengths, 11, pa2.pair,
        sy2.dt, "fast", f3, m=256,
        label=f"plane dynroll zc={zc} wrap=rebuild")

    # config-3 datum the sessions still lack: edpd_slab on the SHIPPED
    # v3 kernel at deck skin (the session-A run overflowed at skin 0.4;
    # session-B's ring numbers are not the product)
    try:
        import dataclasses
        from meso_tpu.models.transport import edpd_slab
        sy_e, pa_e, st_e = edpd_slab(l=32.0, force_path="pallas", skin=0.3)
        sy_e = sy_e.replace(
            pair_kernel="v3",
            cells=dataclasses.replace(sy_e.cells, rebuild_every=3,
                                      rebuild="sort"))
        ne = int(st_e.n_valid())
        st_e, dg = run_bucket_chunked(sy_e, pa_e, st_e, 10, 3,
                                      thermo_trace=False)
        jax.block_until_ready(st_e.x)
        t0 = time.time()
        st_e, dg = run_bucket_chunked(sy_e, pa_e, st_e, 10, 3,
                                      thermo_trace=False)
        jax.block_until_ready(st_e.x)
        mse = (time.time() - t0) / 30 * 1e3
        print(f"TRANSPORT edpd_slab plane-v3: n={ne} {mse:.2f} ms/step "
              f"({ne/mse*1e3:.3e} ps/s) "
              f"of={float(np.asarray(dg['bucket_overflow'])):.0f}",
              flush=True)
    except Exception as e:
        print(f"edpd plane ERROR: {type(e).__name__}: {str(e)[:500]}",
              flush=True)

    # lambda=0.65 kT + the tea-tier record on the SHIPPED kernel (the
    # r5c session ran on the r5-dev ring variant, whose in-loop programs
    # proved untrustworthy — its impossible 15.4 ms/step "tea record" is
    # discarded)
    def kt_record(rng, lam, zc, label):
        try:
            sy, pa, st = classic_fluid(
                l=70.0, rebuild_every=3, skin=0.4, rng_mode=rng,
                force_path="pallas", pair_kernel="v3", rebuild="sort",
                z_chunks=zc)
            sy = sy.replace(lam=lam)
            st = st.replace(x=state.x, v=state.v, f=state.f, typ=state.typ,
                            tag=state.tag, mask=state.mask,
                            image=state.image, step=state.step)
            # warm both programs outside any timing
            st, _ = run_bucket_chunked(sy, pa, st, 1, 3, thermo_trace=False)
            st, _ = run_bucket_chunked(sy, pa, st, 1, 3, thermo_trace=True)
            jax.block_until_ready(st.x)
            # equilibrate under this tier/lambda
            st, _ = run_bucket_chunked(sy, pa, st, 100, 3,
                                       thermo_trace=False)
            jax.block_until_ready(st.x)
            t0 = time.time()
            st, dg = run_bucket_chunked(sy, pa, st, 67, 3,
                                        thermo_trace=False)
            jax.block_until_ready(st.x)
            ms = (time.time() - t0) / 201 * 1e3
            st, dg2 = run_bucket_chunked(sy, pa, st, 67, 3,
                                         thermo_trace=True)
            jax.block_until_ready(st.x)
            kts = np.asarray(dg2["kt_trace"])
            dk = kts - kts.mean()
            acf1 = float((dk[:-1] * dk[1:]).mean() / max(dk.var(), 1e-30))
            tau = (1 + acf1) / max(1 - acf1, 1e-3)
            n_eff = max(kts.size / (2 * tau), 1.0)
            sem = float(kts.std(ddof=1) / np.sqrt(n_eff))
            of2 = float(np.asarray(dg["bucket_overflow"]))
            sr2 = float(np.asarray(dg["worst_skin_ratio"]))
            print(f"KT_RECORD {label}: {ms:.1f} ms/step "
                  f"({n/ms*1e3:.3e} ps/s) kT={kts.mean():.4f}+-{sem:.4f} "
                  f"(3sig={3*sem:.4f}, tau={tau:.1f}) "
                  f"|kT-1|={abs(kts.mean()-1):.4f} of={of2:.0f} "
                  f"sr={sr2:.3f}", flush=True)
        except Exception as e:
            print(f"KT_RECORD {label} ERROR: {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)

    kt_record("fast", 0.65, 5, "plane-fast-lam065")
    kt_record("tea", 0.65, 10, "plane-tea-lam065")
    print("R5D_DONE", flush=True)


if __name__ == "__main__":
    main()
