"""Device probe: Mosaic support for the Morton-block tile kernel's matmul
shapes (PERF_NOTES "Round-3 candidate-waste model", layout 1).

Probes, each compiled on the NATIVE axon path and checked exactly vs XLA:
  1. dot (128,8) @ (8,128) f32      — the r^2 / ev cross-term shape
  2. dot (128,128) @ (128,8) f32    — the force-reduction shape
  3. fused toy pair tile: r^2 via probe-1 matmul + broadcast norms,
     force via probe-2 matmul — the kernel's actual dataflow
  4. dot_general contraction on sublane dim: (8,128)^T-style ((0,),(0,))

Run ONLY when the worker is healthy (one client at a time; a failed
Mosaic compile wedges the worker — CLAUDE.md).
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("dev:", jax.devices(), flush=True)


def check(name, fn, *args, interpret_ref=True):
    try:
        out = jax.block_until_ready(fn(*args, interpret=False))
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return False
    ref = fn(*args, interpret=True)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    ok = err < 1e-5
    print(f"{'PASS' if ok else 'WRONG'} {name}: rel={err:.2e}", flush=True)
    return ok


# --- probe 1: (128,8) @ (8,128) ---
def k_dot_a(a_ref, b_ref, o_ref):
    o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                         preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames="interpret")
def dot_a(a, b, interpret=False):
    return pl.pallas_call(
        k_dot_a,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        interpret=interpret)(a, b)


# --- probe 2: (128,128) @ (128,8) ---
def k_dot_b(g_ref, x_ref, o_ref):
    o_ref[...] = jnp.dot(g_ref[...], x_ref[...],
                         preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames="interpret")
def dot_b(g, x, interpret=False):
    return pl.pallas_call(
        k_dot_b,
        out_shape=jax.ShapeDtypeStruct((128, 8), jnp.float32),
        interpret=interpret)(g, x)


# --- probe 3: fused toy pair tile ---
def k_tile(ai_ref, bj_ref, o_ref):
    ai = ai_ref[...]          # (128, 8): [x(3), |x|^2, pad]
    bj = bj_ref[...]          # (8, 128): [x(3); |x|^2; ones; pad]
    cross = jnp.dot(ai[:, :3], bj[:3, :],
                    preferred_element_type=jnp.float32)   # (128,128)
    r2 = ai[:, 3:4] + bj[3:4, :] - 2.0 * cross
    ok = (r2 < 1.0) & (r2 > 1e-12)
    r2s = jnp.where(ok, r2, 1.0)
    rinv = jax.lax.rsqrt(r2s)
    w = 1.0 - r2s * rinv
    g = jnp.where(ok, 25.0 * w * rinv, 0.0)               # fmag/r tile
    # F_i = rowsum(g) * x_i - g @ [x_j, ones]
    red = jnp.dot(g, bj[:5, :].T,
                  preferred_element_type=jnp.float32)     # (128, 5)
    o_ref[...] = ai[:, :3] * red[:, 4:5] - red[:, :3]


@partial(jax.jit, static_argnames="interpret")
def tile(ai, bj, interpret=False):
    return pl.pallas_call(
        k_tile,
        out_shape=jax.ShapeDtypeStruct((128, 3), jnp.float32),
        interpret=interpret)(ai, bj)


# --- probe 4: contraction on dim 0 of both (8,128) operands ---
def k_dot_c(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames="interpret")
def dot_c(a, b, interpret=False):
    return pl.pallas_call(
        k_dot_c,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        interpret=interpret)(a, b)


if __name__ == "__main__":
    kx = jax.random.PRNGKey(0)
    a8 = jax.random.normal(kx, (128, 8), jnp.float32)
    b8 = jax.random.normal(jax.random.PRNGKey(1), (8, 128), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (128, 128), jnp.float32)
    x8 = jax.random.normal(jax.random.PRNGKey(3), (128, 8), jnp.float32)

    r = []
    r.append(check("dot_128x8x128", dot_a, a8, b8))
    r.append(check("dot_128x128x8", dot_b, g, x8))
    x = jax.random.uniform(kx, (128, 3), jnp.float32) * 3.0
    xj = jax.random.uniform(jax.random.PRNGKey(5), (128, 3), jnp.float32) * 3.0
    ai = jnp.concatenate([x, jnp.sum(x * x, 1, keepdims=True),
                          jnp.zeros((128, 4), jnp.float32)], 1)
    bj = jnp.concatenate([xj.T, jnp.sum(xj * xj, 1)[None],
                          jnp.ones((1, 128), jnp.float32),
                          jnp.zeros((3, 128), jnp.float32)], 0)
    r.append(check("fused_tile", tile, ai, bj))
    r.append(check("dotgen_contract_dim0", dot_c, b8, b8))
    print("MXU_PROBE:", "ALL PASS" if all(r) else "FAILURES", flush=True)
