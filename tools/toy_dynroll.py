"""Toy-kernel device probes for the Mosaic features the v3 kernel uses
(CLAUDE.md discipline: validate kernel features on a toy BEFORE shipping a
production kernel that can poison the remote worker).

Probe 1: pltpu.roll with a TRACED shift (read from SMEM) — the v3
``dyn_roll`` fast path (PERF_NOTES r2 "dynamic pltpu.roll if Mosaic
supports traced shifts").
Probe 2: jax.lax.cond inside a kernel with a 7-tuple of (K, L) carries —
the v3 whole-group occupancy skip.

Run ON DEVICE via ``python tools/tpu_retry.py --timeout 600
tools/toy_dynroll.py``; one TPU client at a time.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("dev:", jax.devices(), flush=True)
L = 256


def k_dynroll(offs_ref, x_ref, out_ref):
    def body(i, acc):
        off = offs_ref[0, i]
        sh = jnp.remainder(-off, jnp.int32(L))
        acc = acc + pltpu.roll(x_ref[:], sh, 1)
        return acc
    out_ref[:] = jax.lax.fori_loop(0, 4, body,
                                   jnp.zeros((8, L), jnp.float32))


def run_dynroll():
    x = jnp.asarray(np.random.RandomState(0).rand(8, L), jnp.float32)
    offs = jnp.asarray([[1, -2, 5, 0]], jnp.int32)
    out = pl.pallas_call(
        k_dynroll,
        in_specs=[pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
    )(offs, x)
    ref = sum(jnp.roll(x, -o, 1) for o in [1, -2, 5, 0])
    err = float(jnp.abs(out - ref).max())
    print(f"dynroll max_abs_err={err:.3e}", flush=True)
    return err < 1e-6


def k_cond(jm_ref, x_ref, out_ref):
    acc = tuple(jnp.zeros((8, L), jnp.float32) for _ in range(7))

    def do(acc=acc):
        return tuple(a + x_ref[:] * (i + 1) for i, a in enumerate(acc))

    acc = jax.lax.cond(jm_ref[0, 0] > 4, do, lambda: acc)
    acc = jax.lax.cond(jm_ref[0, 1] > 4, do, lambda: acc)
    out_ref[:] = acc[0] + acc[6]


def run_cond():
    x = jnp.asarray(np.random.RandomState(1).rand(8, L), jnp.float32)
    jm = jnp.asarray([[9, 2]], jnp.int32)
    out = pl.pallas_call(
        k_cond,
        in_specs=[pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
    )(jm, x)
    ref = x * 1 + x * 7   # only the first cond fires
    err = float(jnp.abs(out - ref).max())
    print(f"cond max_abs_err={err:.3e}", flush=True)
    return err < 1e-6


if __name__ == "__main__":
    ok1 = run_dynroll()
    ok2 = run_cond()
    print(f"TOY_DYNROLL {'PASS' if ok1 else 'FAIL'} / "
          f"TOY_COND {'PASS' if ok2 else 'FAIL'}", flush=True)
