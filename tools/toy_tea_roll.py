"""Minimal device repro of the spill+TEA miscompile (VERDICT r2 item 2).

Both the v2 fused kernel and the v3 Newton kernel produce wrong forces on
the device toolchain when rng_mode="tea" rides a spill layout (r3 session:
rel ~0.9 at l=8), while the fast tier — same rolls, same bitcasts, same
uniform conversion, different integer mixer — is exact. This toy isolates
the construct: each variant runs the SAME pair-theta structure as the
production kernels (channel stack in VMEM -> static pltpu.roll ->
(1, L) row slice -> bitcast -> sorted-pair key -> integer mixer ->
symmetric uniform -> masked accumulate) and differs in ONE element:

  base      exact v3-tea structure (expect FAIL on device)
  fast      TEA replaced by combine_symmetric (expect PASS — prod fast tier)
  pre_bc    bitcast to int32 BEFORE the roll (roll int channels)
  no_minmax skip the sorted-pair min/max (lo=self, hi=row)
  const_key TEA keys as trace-time constants instead of SMEM reads
  rounds2   TEA with 2 rounds instead of 8
  scratch   rolled row staged through a VMEM scratch ref before TEA

Device results 2026-08-18: only pre_bc PASSED (bitcast-then-roll is the
safe order) — but porting that order into the full v3 kernel did NOT fix
it (tea still rel 0.9, tools/v3_lane_disc.py), so the production kernel
has a second trigger the toy lacks. Added variants to find it:

  grp8      pre_bc order but read as an aligned (8, L) slice bitcast to
            int, roll, then per-row [r:r+1] slices (v3's group read)
  cond      pre_bc wrapped in lax.cond on an SMEM-read bound (v3's
            group gating)
  vals      tags as exact f32 VALUES, min/max in f32, one f32->int32
            convert at the TEA input (the v3 value-tags design)

Each variant compares the compiled kernel against interpret mode on
identical inputs (interpret is the semantic reference; all variants are
exact there by construction). Run ON DEVICE (one client at a time):

    python tools/tpu_retry.py --timeout 1200 tools/toy_tea_roll.py

or in-process at the end of a device session. On CPU (sanity):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu MESO_TOY_INTERPRET_ONLY=1 \
        python tools/toy_tea_roll.py
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meso_tpu.core import rng as rngmod

K = 16          # sublane (slot) count, matches the l=8 spill shape
W = 10          # w_lane of the failing spill shape (nx=6, xr=2)
NZ = 6
L = NZ * W      # 60 lanes — the exact failing lane geometry
OFFS = [1, 2, W - 2, W - 1, W, W + 1, W + 2]   # v3 mid_half at xr=2


def _kernel(iscal_ref, stack_ref, out_ref, *, variant: str):
    step_u = iscal_ref[0, 0].astype(jnp.uint32)
    seed_u = iscal_ref[0, 1].astype(jnp.uint32)
    if variant == "const_key":
        step_u = jnp.uint32(42)
        seed_u = jnp.uint32(977)

    self_tag_f = stack_ref[1, 0]                 # (K, L) f32 view of tags
    self_tag = pltpu.bitcast(self_tag_f, jnp.int32)
    acc = jnp.zeros((K, L), jnp.float32)

    if variant in ("pre_bc", "cond"):
        tag_block_i = pltpu.bitcast(stack_ref[1, 0], jnp.int32)

    if variant == "vals":
        # stack plane 2 carries tags as exact f32 VALUES
        self_val = stack_ref[2, 0]

        def theta_one(off):
            sh = (-off) % L
            row_val = pltpu.roll(stack_ref[2, 0], sh, 1)[0:1, :]
            lo = jnp.minimum(self_val, row_val).astype(jnp.int32)
            hi = jnp.maximum(self_val, row_val).astype(jnp.int32)
            v0, _ = rngmod.tea(lo.astype(jnp.uint32), hi.astype(jnp.uint32),
                               step_u, seed_u, rounds=8)
            return rngmod._u32_to_symmetric_uniform(v0)

        for off in OFFS:
            sh = (-off) % L
            vmask = pltpu.roll(stack_ref[0, 0], sh, 1)[0:1, :]
            acc = acc + jnp.where(stack_ref[0, 0] * vmask > 0.5,
                                  theta_one(off), 0.0)
        out_ref[0, 0] = acc
        return

    if variant == "grp8":
        for g0 in range(0, K, 8):
            blk = pltpu.bitcast(stack_ref[1, 0, g0:g0 + 8, :], jnp.int32)
            mblk = stack_ref[0, 0, g0:g0 + 8, :]
            for off in OFFS:
                sh = (-off) % L
                rolled = pltpu.roll(blk, sh, 1)
                mrolled = pltpu.roll(mblk, sh, 1)
                for r in range(8):
                    row_tag = rolled[r:r + 1, :]
                    lo = jnp.minimum(self_tag, row_tag).astype(jnp.uint32)
                    hi = jnp.maximum(self_tag, row_tag).astype(jnp.uint32)
                    v0, _ = rngmod.tea(lo, hi, step_u, seed_u, rounds=8)
                    theta = rngmod._u32_to_symmetric_uniform(v0)
                    vmask = mrolled[r:r + 1, :]
                    acc = acc + jnp.where(
                        stack_ref[0, 0] * vmask > 0.5, theta, 0.0)
        out_ref[0, 0] = acc
        return

    for off in OFFS:
        sh = (-off) % L

        def contrib_of(off=off, sh=sh):
            if variant in ("pre_bc", "cond"):
                rolled_i = pltpu.roll(tag_block_i, sh, 1)
                row_tag = rolled_i[0:1, :]
            else:
                rolled = pltpu.roll(stack_ref[1, 0], sh, 1)
                row_f = rolled[0:1, :]
                row_tag = pltpu.bitcast(row_f, jnp.int32)
            if variant == "no_minmax":
                lo = self_tag.astype(jnp.uint32)
                hi = row_tag.astype(jnp.uint32)
            else:
                lo = jnp.minimum(self_tag, row_tag).astype(jnp.uint32)
                hi = jnp.maximum(self_tag, row_tag).astype(jnp.uint32)
            if variant == "fast":
                theta = rngmod.pair_uniform_fast(lo, hi)
            else:
                rounds = 2 if variant == "rounds2" else 8
                v0, _ = rngmod.tea(lo, hi, step_u, seed_u, rounds=rounds)
                theta = rngmod._u32_to_symmetric_uniform(v0)
            # mask rides a float compare like the production cutoff test
            vmask = pltpu.roll(stack_ref[0, 0], sh, 1)[0:1, :]
            return jnp.where(stack_ref[0, 0] * vmask > 0.5, theta, 0.0)

        if variant == "cond":
            # production group gating: the whole offset pass COMPUTES
            # under a lax.cond on an SMEM-read bound (always true here)
            contrib = jax.lax.cond(
                iscal_ref[0, 0] > 0, contrib_of,
                lambda: jnp.zeros((K, L), jnp.float32))
        else:
            contrib = contrib_of()
        acc = acc + contrib
    out_ref[0, 0] = acc


def _kernel_scratch(iscal_ref, stack_ref, out_ref, scratch, *, variant):
    step_u = iscal_ref[0, 0].astype(jnp.uint32)
    seed_u = iscal_ref[0, 1].astype(jnp.uint32)
    self_tag = pltpu.bitcast(stack_ref[1, 0], jnp.int32)
    acc = jnp.zeros((K, L), jnp.float32)
    for i, off in enumerate(OFFS):
        sh = (-off) % L
        rolled = pltpu.roll(stack_ref[1, 0], sh, 1)
        # materialize the rolled row through VMEM before the integer chain
        scratch[i:i + 1, :] = rolled[0:1, :]
        row_tag = pltpu.bitcast(scratch[i:i + 1, :], jnp.int32)
        lo = jnp.minimum(self_tag, row_tag).astype(jnp.uint32)
        hi = jnp.maximum(self_tag, row_tag).astype(jnp.uint32)
        v0, _ = rngmod.tea(lo, hi, step_u, seed_u, rounds=8)
        theta = rngmod._u32_to_symmetric_uniform(v0)
        vmask = pltpu.roll(stack_ref[0, 0], sh, 1)[0:1, :]
        acc = acc + jnp.where(stack_ref[0, 0] * vmask > 0.5, theta, 0.0)
    out_ref[0, 0] = acc


def run(variant: str, interpret: bool):
    rs = np.random.RandomState(7)
    tags = rs.permutation(2 * K * L)[:K * L].astype(np.int32).reshape(K, L)
    mask = (rs.rand(K, L) < 0.7).astype(np.float32)
    tag_f = jax.lax.bitcast_convert_type(jnp.asarray(tags), jnp.float32)
    tag_v = jnp.asarray(tags, jnp.float32)       # tags as exact f32 VALUES
    stack = jnp.stack([jnp.asarray(mask), tag_f, tag_v])[:, None]
    iscal = jnp.asarray([[42, 977]], jnp.int32)

    if variant == "scratch":
        fn = pl.pallas_call(
            partial(_kernel_scratch, variant=variant),
            in_specs=[pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1, K, L), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, L), jnp.float32)],
            interpret=interpret,
        )
    else:
        fn = pl.pallas_call(
            partial(_kernel, variant=variant),
            in_specs=[pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1, K, L), jnp.float32),
            interpret=interpret,
        )
    return np.asarray(jax.jit(fn)(iscal, stack))[0, 0]


VARIANTS = ["base", "fast", "pre_bc", "no_minmax", "const_key", "rounds2",
            "scratch", "grp8", "cond", "vals"]

if __name__ == "__main__":
    print("dev:", jax.devices(), flush=True)
    interp_only = os.environ.get("MESO_TOY_INTERPRET_ONLY") == "1"
    for v in VARIANTS:
        ref = run(v, interpret=True)
        if interp_only:
            print(f"INTERP-ONLY {v}: finite={np.isfinite(ref).all()} "
                  f"mean={ref.mean():+.4f}", flush=True)
            continue
        got = run(v, interpret=False)
        denom = max(np.abs(ref).max(), 1e-9)
        err = np.abs(got - ref).max() / denom
        frac_bad = float((np.abs(got - ref) > 1e-5 * denom).mean())
        print(f"{'PASS' if err < 1e-5 else 'FAIL'} tea-roll[{v}]: "
              f"rel={err:.2e} frac_rows_bad={frac_bad:.3f}", flush=True)
