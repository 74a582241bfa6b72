"""Device gate of the value-carried v2 fused-kernel family (r3 port).

The r3 root cause (PERF_NOTES.md) established that every routed v2-family
"miscompile" — strict small-shape (rel 0.6), spill+tea (rel ~1.2), and the
bf16_v band refs (rel 0.67, machinery removed r5) — came from integer bit patterns bitcast into
the f32 channel stack. The port carries tags/exclusions as exact f32
VALUES and hashes both RNG tiers in-kernel. This gate re-runs the exact
r2 trigger classes on the compiled kernels:

  classic fused: strict nx=6 (r2 fail shape), spill nx=8, spill+tea,
                 exclusions
  eDPD fused:    spill nx=8 fast + tea, multi-type
  tDPD fused:    spill nx=8 fast (2 species)

Run alone (one device client): nohup python tools/v2_gate.py > LOG &
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

print("dev:", jax.devices(), flush=True)

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.kernels.pair_dpd_fused import (
    bucket_forces_pallas_edpd_fused, bucket_forces_pallas_fused,
    bucket_forces_pallas_tdpd_fused)
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams
from meso_tpu.ops.edpd import EDPDParams, dense_forces_edpd
from meso_tpu.ops.tdpd import TDPDParams, dense_forces_tdpd
from meso_tpu.ops.dpd import dense_forces

BASE = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)


def _setup(lens, skin, spill, cap=None):
    box = Box.orthorhombic(*lens)
    n = int(round(3.0 * lens[0] * lens[1] * lens[2]))
    st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
    cfg = CellConfig.for_box(lens, rc=1.0, density=3.0, skin=skin,
                             spill=spill, capacity=cap)
    return box, to_bucket_state(st, cfg), cfg


def _report(label, cfg, rng, f_p, vir_p, f_d, vir_d, mask, tol=5e-5):
    m = np.asarray(mask)
    fd, fp = np.asarray(f_d), np.asarray(f_p)
    err = np.abs(fp[m] - fd[m]).max() / np.abs(fd).max()
    verr = abs(float(vir_p) - float(vir_d)) / abs(float(vir_d))
    ok = err < tol and verr < 1e-3
    print(f"{'PASS' if ok else 'FAIL'} {label} ncell={cfg.ncell} "
          f"K={cfg.capacity} spill={cfg.spill} rng={rng}: "
          f"rel={err:.2e} vir={verr:.2e}", flush=True)
    return ok


def classic(lens, skin=0.3, spill=True, cap=None, rng="fast", excl=False,
            tol=5e-5, label=""):
    box, bst, cfg = _setup(lens, skin, spill, cap)
    params = BASE
    if excl:
        n = bst.x.shape[0]
        tags = np.arange(n)
        ex = np.stack([tags - 1, tags + 1], axis=1).astype(np.int32)
        ex[0, 0] = -7
        ex[-1, 1] = -7
        params = BASE.replace(excl=jnp.asarray(ex), excl_w=jnp.float32(0.25))
    step = jnp.int32(42)
    try:
        f_p, vir_p = bucket_forces_pallas_fused(
            bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params,
            0.01, cfg, rng_mode=rng, interpret=False)
        jax.block_until_ready(f_p)
    except Exception as e:
        print(f"ERROR {label}: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return False
    f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                                 box, step, params, 0.01, rng_mode=rng)
    return _report(label, cfg, rng, f_p, vir_p, f_d, vir_d, bst.mask, tol)


def edpd(lens, skin=0.3, rng="fast", label=""):
    params = EDPDParams.build(a=25.0, gamma=4.5, rc=1.0, seed=77,
                              kappa=1.0e-4, cv=1.0e4)
    box, bst, cfg = _setup(lens, skin, True)
    n = bst.x.shape[0]
    t = jnp.where(bst.mask, 1.0 + 0.1 * jnp.sin(jnp.arange(n) * 0.01), 1.0)
    t = t.astype(jnp.float32)
    step = jnp.int32(42)
    try:
        f_p, dtdt_p, vir_p = bucket_forces_pallas_edpd_fused(
            bst.x, bst.v, t, bst.typ, bst.tag, bst.mask, box, step, params,
            0.01, cfg, rng_mode=rng, interpret=False)
        jax.block_until_ready(f_p)
    except Exception as e:
        print(f"ERROR {label}: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return False
    f_d, dtdt_d, vir_d = dense_forces_edpd(
        bst.x, bst.v, t, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, rng_mode=rng)
    ok = _report(label, cfg, rng, f_p, vir_p, f_d, vir_d, bst.mask)
    m = np.asarray(bst.mask)
    derr = np.abs(np.asarray(dtdt_p)[m] - np.asarray(dtdt_d)[m]).max() / \
        max(np.abs(np.asarray(dtdt_d)).max(), 1e-12)
    print(f"  dTdt rel={derr:.2e} {'ok' if derr < 5e-5 else 'BAD'}",
          flush=True)
    return ok and derr < 5e-5


def tdpd(lens, skin=0.3, rng="fast", label=""):
    params = TDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77,
                              kappa_c=[2.0, 1.0],
                              eps_c=[0.1, 0.05], rcc=1.0, s1=1.0)
    box, bst, cfg = _setup(lens, skin, True)
    n = bst.x.shape[0]
    c = jnp.stack([
        jnp.where(bst.mask, 0.5 + 0.2 * jnp.cos(jnp.arange(n) * 0.02), 0.0),
        jnp.where(bst.mask, 0.3 + 0.1 * jnp.sin(jnp.arange(n) * 0.03), 0.0),
    ], axis=-1).astype(jnp.float32)
    step = jnp.int32(42)
    try:
        f_p, dcdt_p, vir_p = bucket_forces_pallas_tdpd_fused(
            bst.x, bst.v, c, bst.typ, bst.tag, bst.mask, box, step, params,
            0.01, cfg, rng_mode=rng, interpret=False)
        jax.block_until_ready(f_p)
    except Exception as e:
        print(f"ERROR {label}: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return False
    f_d, dcdt_d, vir_d = dense_forces_tdpd(
        bst.x, bst.v, c, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, rng_mode=rng)
    ok = _report(label, cfg, rng, f_p, vir_p, f_d, vir_d, bst.mask)
    m = np.asarray(bst.mask)
    derr = np.abs(np.asarray(dcdt_p)[m] - np.asarray(dcdt_d)[m]).max() / \
        max(np.abs(np.asarray(dcdt_d)).max(), 1e-12)
    print(f"  dCdt rel={derr:.2e} {'ok' if derr < 5e-5 else 'BAD'}",
          flush=True)
    return ok and derr < 5e-5


if __name__ == "__main__":
    oks = []
    oks.append(classic([8.0] * 3, spill=False, cap=24,
                       label="v2-strict-nx6"))           # r2 fail shape
    oks.append(classic([10.7, 8.0, 8.0], label="v2-spill-nx8"))
    oks.append(classic([10.7, 8.0, 8.0], rng="tea",
                       label="v2-spill-tea-nx8"))        # r2 fail class
    oks.append(classic([10.7, 8.0, 8.0], excl=True, label="v2-excl-nx8"))
    # (the bf16_v probe is gone with the flag — r5 measured zero win and
    # the machinery was deleted; PERF_NOTES r5)
    oks.append(edpd([10.7, 8.0, 8.0], label="edpd-spill-nx8"))
    oks.append(edpd([10.7, 8.0, 8.0], rng="tea", label="edpd-tea-nx8"))
    oks.append(tdpd([10.7, 8.0, 8.0], label="tdpd-spill-nx8"))
    print(f"V2GATE: {'ALL PASS' if all(oks) else 'FAILURES'}", flush=True)
    print("V2_GATE_DONE", flush=True)
