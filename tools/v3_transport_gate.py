"""Compiled v3 eDPD/tDPD kernel device gate (VERDICT r4 item 5).

Runs the COMPILED Newton transport kernels against the dense O(N^2)
oracles on the r2 miscompile trigger shape classes (strict ncell 6^3,
spill, tea tier) plus a z-chunked shape. CPU interpret parity is already
locked by tests/unit/test_pallas_v3_transport.py — this gate checks the
Mosaic toolchain on the real chip before the kernels become defaults.

Run alone (ONE device client):
  nohup python tools/v3_transport_gate.py > /tmp/v3tg.log 2>&1 &
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
from meso_tpu.kernels.pair_dpd_v3 import (bucket_forces_pallas_v3_edpd,
                                          bucket_forces_pallas_v3_tdpd)
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.edpd import EDPDParams, dense_forces_edpd
from meso_tpu.ops.tdpd import TDPDParams, dense_forces_tdpd

failures = 0


def rel(a, b, m):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a[m] - b[m]).max() / max(np.abs(b).max(), 1e-9)


def check_edpd(l, n, skin, spill, rng, zc=0, tol=5e-4):
    global failures
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0,
                       with_energy=True)
    st = st.replace(T=1.0 + 0.3 * jnp.sin(st.x[:, 0]))
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l ** 3,
                             skin=skin, spill=spill)
    params = EDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kappa=1.5,
                              cv=10.0, seed=7)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(12)
    f_d, q_d, v_d = dense_forces_edpd(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step,
        params, 0.01, rng_mode=rng)
    f_p, q_p, v_p = bucket_forces_pallas_v3_edpd(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step,
        params, 0.01, cfg, rng_mode=rng, interpret=False, z_chunks=zc)
    m = np.asarray(bst.mask)
    ef, eq = rel(f_p, f_d, m), rel(q_p, q_d, m)
    ev = abs(float(v_p) - float(v_d)) / abs(float(v_d))
    ok = ef < tol and eq < tol and ev < 1e-3
    failures += 0 if ok else 1
    print(f"{'PASS' if ok else 'FAIL'} edpd l={l} ncell={cfg.ncell} "
          f"spill={spill} rng={rng} zc={zc}: f={ef:.2e} q={eq:.2e} "
          f"vir={ev:.2e}", flush=True)


def check_tdpd(l, n, skin, spill, rng, zc=0, tol=5e-4):
    global failures
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(4), n, box, kt=1.0, n_species=2)
    st = st.replace(
        C=jnp.stack([1.0 + 0.5 * jnp.cos(st.x[:, 0]),
                     0.5 + 0.2 * jnp.sin(st.x[:, 1])], -1))
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l ** 3,
                             skin=skin, spill=spill)
    params = TDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0,
                              kappa_c=[1.0, 0.5], eps_c=[0.1, 0.05],
                              rcc=0.8, s1=2.0, seed=5)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(4)
    f_d, q_d, v_d = dense_forces_tdpd(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step,
        params, 0.01, rng_mode=rng)
    f_p, q_p, v_p = bucket_forces_pallas_v3_tdpd(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step,
        params, 0.01, cfg, rng_mode=rng, interpret=False, z_chunks=zc)
    m = np.asarray(bst.mask)
    ef, eq = rel(f_p, f_d, m), rel(q_p, q_d, m)
    ev = abs(float(v_p) - float(v_d)) / abs(float(v_d))
    ok = ef < tol and eq < tol and ev < 1e-3
    failures += 0 if ok else 1
    print(f"{'PASS' if ok else 'FAIL'} tdpd l={l} ncell={cfg.ncell} "
          f"spill={spill} rng={rng} zc={zc}: f={ef:.2e} dC={eq:.2e} "
          f"vir={ev:.2e}", flush=True)


# the r2 strict small-shape trigger class (ncell 6^3)
check_edpd(8.0, 1536, 0.3, spill=False, rng="fast")
check_edpd(8.0, 1536, 0.3, spill=True, rng="fast")
check_edpd(8.0, 1536, 0.3, spill=True, rng="tea")
check_tdpd(8.0, 1536, 0.3, spill=False, rng="fast")
check_tdpd(8.0, 1536, 0.3, spill=True, rng="fast")
check_tdpd(8.0, 1536, 0.3, spill=True, rng="tea")
# mid shape + chunked z (the production shape class)
check_edpd(12.0, 5184, 0.4, spill=True, rng="fast", zc=2)
check_tdpd(12.0, 5184, 0.4, spill=True, rng="fast", zc=2)

print(f"V3_TRANSPORT_GATE {'ALL_PASS' if failures == 0 else 'FAILURES'}",
      flush=True)
