"""Newton fused-lane Pallas DPD pair kernel — the single-chip hot path, v3.

Third-generation redesign of the reference's hottest CUDA kernel
(``pair_dpd_meso.cu``, SURVEY.md §2b rows 20-21, §3.3), built from the
round-2 fused-lane kernel (``pair_dpd_fused.py``) after the r2 verdict
quantified a ~45x pair-candidate waste. What changes (VERDICT r3 item 1):

* **Newton's third law** (the reference's half-list analog): each unordered
  pair is enumerated ONCE and both sides are accumulated. Grid step cy
  pairs its row against itself (half offset set) and against row cy+1
  (full offset set); reactions are accumulated into a second output plane
  that the XLA epilogue rolls one row down. ~2x fewer candidates.
* **Static source groups**: source slots are read as aligned (8, L) blocks
  with the 8 rows unrolled statically — no per-row dynamic sublane reads
  and ~13x fewer loop dispatches than v2 (the measured v2 overhead).
  Groups beyond a band's occupancy bound are skipped whole (lax.cond).
* **Per-(row, z-chunk) occupancy bounds** (jm tables) instead of v2's
  per-3-row-band bound.
* **Per-lane cutoff row**: pad target lanes carry rc^2 = -1, so the pad
  mask rides the cutoff compare with zero extra ops (single-type path).
* ``dyn_roll``: lane rolls by a *traced* offset read from an SMEM table
  (one pltpu.roll) instead of unrolled static-roll offsets. Device
  toolchain support is probed by tools/toy_dynroll.py before use.

Enumeration completeness (why each pair is counted exactly once): lanes
fuse (cz, cx) with circular x wrap-pads, so the half offset set
{dz=+1, any dx} + {dz=0, dx>0} + {(0,0) with slot_i < slot_j} covers every
same-row pair once; the full set vs row cy+1 covers every cross-row pair
once; a pair whose enumeration direction would start from a pad lane is
instead counted at the real twin lane (the padded lane structure is
periodic), and reactions that land ON pad lanes are harvested onto their
twins by the XLA epilogue.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meso_tpu.core import rng as rngmod
from meso_tpu.core.box import Box
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams

Array = jax.Array

# channel indices in the stacked plane tensor (_TAGV = tags as exact f32
# VALUES — both RNG tiers hash them in-kernel; no bitcast channels exist)
_SX, _SY, _SZ, _VX, _VY, _VZ, _TAGV, _VALID = range(8)

# x-coordinate poison for invalid slots under wrap_at_rebuild (no
# min-image): far outside any box, exact in f32, pairs of poisoned rows
# give dr = 0 and die on the self-pair test
_POISON = jnp.float32(4.0e4)


def _groups(k: int):
    """8-row source group starts covering slots [0, k); k must be a
    multiple of 8 (the wrapper pads capacity with VALID=0 slots), so every
    group is sublane-aligned — reaction blocks are then stored back with
    aligned (8, L) slice read-modify-writes on the output ref, the only
    construct this device toolchain reliably materializes (it rejects or
    mis-lowers tpu.concatenate of lazy-layout operands, CLAUDE.md r3)."""
    if k < 8 or k % 8:
        raise ValueError("v3 kernel requires capacity K >= 8, K % 8 == 0 "
                         "(the wrapper pads)")
    return list(range(0, k, 8))


def _v3_kernel(*refs, k: int, w_lane: int, l_lane: int, rng_mode: str,
               rng_rounds: int, n_chan: int, n_types: int, typ_chan: int,
               tag_chan: int, n_excl: int, ex_chan: int, s_exp: float,
               xr: int, dyn_roll: bool, nx: int, nzc: int, zc: int,
               z_halo: bool, debug_pairs: bool, min_image: bool,
               model: str = "dpd", ns: int = 0, mc_chan: int = -1,
               need_virial: bool = True):
    """One grid step = one (cy row, z-chunk).

    Inputs: scal, iscal, tab, jm, offs (SMEM); mid band block, down band
    block (VMEM (C, 1, 1, K, L)). The per-lane rc^2 row (pad lanes -> -1)
    is built in-kernel from iota: a (1, L) VMEM *input* would be an
    unaligned block (sublane dim < 8) — Mosaic rejects it.
    Output: (n_out, 2, 1, 1, K, L) — [:, 0] = contributions to row cy,
    [:, 1] = reactions onto row cy+1 (rolled down by the epilogue).
    n_out = 4 (fx, fy, fz, vir) + the model's extra flux channels (eDPD
    heat q, tDPD per-species dC — SURVEY rows 22-23): each extra is
    Newton-paired like the force, with the eDPD viscous part q^V counted
    symmetrically (both sides +q^V) and q^C/q^R antisymmetrically.
    """
    (scal_ref, iscal_ref, tab_ref, jm_ref, offs_ref, b_mid,
     b_down, out_ref) = refs
    a = scal_ref[0, 0]
    gamma = scal_ref[0, 1]
    sigma_dt = scal_ref[0, 2]     # sigma / sqrt(dt), pre-folded
    rc = scal_ref[0, 3]
    lx = scal_ref[0, 4]
    ly = scal_ref[0, 5]
    lz = scal_ref[0, 6]
    inv_lx = scal_ref[0, 7]
    inv_ly = scal_ref[0, 8]
    inv_lz = scal_ref[0, 9]
    excl_w = scal_ref[0, 10]
    inv_rc = scal_ref[0, 11]
    # models: the s_ij slot (scal[0,2] / tab row 2) carries kappa for
    # eDPD (per-pair sigma is derived from T_i, T_j in-kernel) and
    # sigma/sqrt(dt) otherwise, exactly as the v2 fused kernel
    n_extra = (1 if model == "edpd" else ns)
    if model == "edpd":
        dt_inv_sqrt = scal_ref[0, 12]
        inv_mass = scal_ref[0, 13]
    elif model == "tdpd":
        dt_inv_sqrt = scal_ref[0, 12]
        rcc = scal_ref[0, 13]
        s1 = scal_ref[0, 14]
    # both tiers derive their randoms in-kernel from tag VALUES
    step_u = iscal_ref[0, 0].astype(jnp.uint32)
    seed_u = iscal_ref[0, 1].astype(jnp.uint32)

    cy = pl.program_id(0)
    cb = pl.program_id(1)
    jm_mid = jm_ref[0, cy * pl.num_programs(1) + cb]
    jm_down = jm_ref[1, cy * pl.num_programs(1) + cb]

    # per-lane rc^2 row: rc^2 on real target lanes, -1 on x-wrap / z-chunk
    # pad lanes (the pad mask rides the cutoff compare for free)
    li = jax.lax.broadcasted_iota(jnp.int32, (1, l_lane), 1)
    zb = li // w_lane
    xw = li - zb * w_lane
    real = (xw >= xr) & (xw < xr + nx)
    if z_halo:
        # z-halo rows AND any 128-alignment pad lanes (zb >= nzc+2) are
        # non-targets; pad-lane sources carry VALID=0 zeros
        real = real & (zb >= 1) & (zb <= nzc)
    rc2lane = jnp.where(real, rc * rc, jnp.float32(-1.0))
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (k, l_lane), 0)

    # lane offsets (dz * w_lane + dx); (0,0) handled by center_pass
    mid_half = ([dx for dx in range(1, xr + 1)]
                + [w_lane + dx for dx in range(-xr, xr + 1)])
    down_full = [dz * w_lane + dx for dz in (-1, 0, 1)
                 for dx in range(-xr, xr + 1)]
    # SMEM table layout: [mid_half..., down_full...]
    mid_base, down_base = 0, len(mid_half)

    # NO integer bit patterns ride the f32 channel stack: tag / exclusion
    # channels are exact f32 VALUES (tags < 2^24), and the fast tier's
    # per-particle hash is computed IN-KERNEL from those values. Bitcast
    # integer channels are corrupted on device — value-dependently and
    # SHAPE-dependently — somewhere in the XLA prep + DMA + roll pipeline
    # (r3 root cause: v2 and v3 failed identically at the same shapes,
    # interpret always exact; tools/v3_lane_scan2.py: the value-carried
    # tea tier passes at the exact shapes the bitcast-hash fast tier
    # fails). Hash blocks computed here are int32 and only ever rolled as
    # int32 (the proven-safe order, tools/toy_tea_roll.py pre_bc).

    def hash_of(tag_f):
        """Per-particle TEA hash from a tag-value block — bit-identical to
        rng.particle_hash (the oracle's counter)."""
        t = tag_f.astype(jnp.int32).astype(jnp.uint32)
        v0, _ = rngmod.tea(t, t ^ jnp.uint32(0xDEADBEEF), step_u, seed_u,
                           rounds=rng_rounds)
        return v0.astype(jnp.int32)

    def selfc(c):  # (k, L)
        return b_mid[c, 0, 0]

    self_h = (hash_of(selfc(tag_chan))
              if rng_mode == "fast" or debug_pairs else None)

    def roll_fwd(blocks, off):
        """Roll each (8, L) block so lane t reads source lane t+off."""
        if isinstance(off, int):
            if off == 0:
                return blocks
            return tuple(pltpu.roll(p, (-off) % l_lane, 1) for p in blocks)
        sh = jnp.remainder(-off, jnp.int32(l_lane))
        return tuple(pltpu.roll(p, sh, 1) for p in blocks)

    def roll_back(block, off):
        """Inverse of roll_fwd for the reaction block."""
        if isinstance(off, int):
            if off == 0:
                return block
            return pltpu.roll(block, off % l_lane, 1)
        return pltpu.roll(block, jnp.remainder(off, jnp.int32(l_lane)), 1)

    def pair_rows(rows, r, center_j=None):
        """Force of the full (k, L) self tile against source row r of the
        rolled (8, L) channel blocks. Returns (dfx, dfy, dfz, dvir) plus
        (rfx, rfy, rfz) — the (1, L) reaction row (sum over targets)."""
        row = tuple(p[r:r + 1, :] for p in rows)          # (1, L) each
        if n_types > 1:
            code = selfc(typ_chan) * jnp.float32(n_types) + row[typ_chan]
            a_ij = tab_ref[0, 0]
            g_ij = tab_ref[1, 0]
            s_ij = tab_ref[2, 0]
            rc2_ij = tab_ref[3, 0]
            irc_ij = tab_ref[4, 0]
            for p_i in range(1, n_types * n_types):
                sel = code == jnp.float32(p_i)
                a_ij = jnp.where(sel, tab_ref[0, p_i], a_ij)
                g_ij = jnp.where(sel, tab_ref[1, p_i], g_ij)
                s_ij = jnp.where(sel, tab_ref[2, p_i], s_ij)
                rc2_ij = jnp.where(sel, tab_ref[3, p_i], rc2_ij)
                irc_ij = jnp.where(sel, tab_ref[4, p_i], irc_ij)
        else:
            a_ij, g_ij, s_ij, irc_ij = a, gamma, sigma_dt, inv_rc

        drx = selfc(_SX) - row[_SX]
        dry = selfc(_SY) - row[_SY]
        drz = selfc(_SZ) - row[_SZ]
        if min_image:
            # minimum image on ALL axes (mid-window global wrap,
            # PERF_NOTES.md). wrap_at_rebuild layouts skip this: the box
            # wrap is deferred to rebuild time and wrap pads carry
            # pre-shifted coordinates, so every intended pair has a small
            # direct dr (12 fewer VPU ops per candidate).
            drx = drx - jnp.round(drx * inv_lx) * lx
            dry = dry - jnp.round(dry * inv_ly) * ly
            drz = drz - jnp.round(drz * inv_lz) * lz
        r2 = drx * drx + dry * dry + drz * drz
        if n_types > 1:
            ok = (r2 < rc2_ij) & (rc2lane > 0.0)
        else:
            # pad-lane mask rides the cutoff compare (rc2lane = -1 on pads)
            ok = r2 < rc2lane
        if min_image:
            ok = ok & (selfc(_VALID) * row[_VALID] > 0.5)
        # else: invalid/pad slots carry poisoned x (4e4) — the cutoff
        # compare rejects them for free; invalid-invalid pairs have dr = 0
        # and die on the self-pair test below
        ok = ok & (r2 > 0.0)
        if center_j is not None:
            # (0,0) same-column Newton rule: only slots above the source
            ok = ok & (s_iota < center_j)
        r2s = jnp.where(ok, r2, 1.0)
        rinv = jax.lax.rsqrt(r2s)
        rr = r2s * rinv
        w = 1.0 - rr * irc_ij
        if s_exp == 1.0:
            wr = w
        else:
            wr = jnp.power(jnp.maximum(w, 0.0), jnp.float32(s_exp))
        dvx = selfc(_VX) - row[_VX]
        dvy = selfc(_VY) - row[_VY]
        dvz = selfc(_VZ) - row[_VZ]
        ev = (drx * dvx + dry * dvy + drz * dvz) * rinv
        if rng_mode == "tea":
            # tag channels are exact f32 values; min/max in f32, ONE
            # f32->int32 convert each at the TEA input
            tgs, tgj = selfc(tag_chan), row[tag_chan]
            lo = jnp.minimum(tgs, tgj).astype(jnp.int32).astype(jnp.uint32)
            hi = jnp.maximum(tgs, tgj).astype(jnp.int32).astype(jnp.uint32)
            hp, _ = rngmod.tea(lo, hi, step_u, seed_u, rounds=rng_rounds)
        else:
            # row[-1] = the group's in-kernel hash block (int32, rolled
            # as int32 — the proven-safe order)
            hp = rngmod.combine_symmetric(self_h, row[-1])
        if model != "dpd":
            # eDPD/tDPD (SURVEY A.2/A.3): symmetric pair hash -> several
            # independent noise streams; antisymmetric streams carry the
            # tag-order sign (exact f32 value compare) — the exact math
            # of the v2 fused/sweep paths (parity-tested). The Newton
            # reaction negates antisymmetric fluxes and keeps symmetric
            # ones, so BOTH q(i<-j) and q(j<-i) come from this one visit.
            theta = rngmod.uniform_stream(hp, 0)
            sign = jnp.where(selfc(tag_chan) < row[tag_chan], 1.0, -1.0)
            w2 = w * w
            if model == "edpd":
                ts = selfc(mc_chan)
                tj = row[mc_chan]
                sigma2 = 4.0 * g_ij * ts * tj / jnp.maximum(ts + tj, 1e-12)
                sigma = jnp.sqrt(jnp.maximum(sigma2, 0.0))
                fmag = (a_ij * w - g_ij * w2 * ev
                        + sigma * w * theta * dt_inv_sqrt)
                fmag = jnp.where(ok, fmag, 0.0)
                k_ij = s_ij * 0.25 * (ts + tj) ** 2   # s_ij = kappa here
                q_c = k_ij * w2 * (1.0 / jnp.maximum(ts, 1e-12)
                                   - 1.0 / jnp.maximum(tj, 1e-12))
                q_v = 0.5 * (w2 * (g_ij * ev * ev - sigma2 * inv_mass)
                             - sigma * w * ev * theta * dt_inv_sqrt)
                zeta = sign * rngmod.uniform_stream(hp, 1)
                beta = jnp.sqrt(jnp.maximum(2.0 * k_ij, 0.0))
                q_r = beta * w * zeta * dt_inv_sqrt
                q_asym = jnp.where(ok, q_c + q_r, 0.0)
                q_sym = jnp.where(ok, q_v, 0.0)
                # target side gets q_asym + q_sym; the reaction
                # accumulator SUBTRACTS, so hand it q_asym - q_sym
                d_extras = (q_asym + q_sym,)
                r_extras = (q_asym - q_sym,)
            else:  # tdpd
                fmag = (a_ij * w - g_ij * w2 * ev + s_ij * w * theta)
                fmag = jnp.where(ok, fmag, 0.0)
                inside_c = ok & (r2 < rcc * rcc)
                wdc_base = jnp.maximum(1.0 - rr / rcc, 0.0)
                wdc = jnp.where(s1 == 1.0, wdc_base,
                                jnp.power(wdc_base, s1))
                wrc = jnp.sqrt(wdc)
                d_extras = []
                for sp in range(ns):
                    kap_s = scal_ref[0, 15 + 2 * sp]
                    eps_s = scal_ref[0, 16 + 2 * sp]
                    ci = selfc(mc_chan + sp)
                    cj = row[mc_chan + sp]
                    xi = sign * rngmod.uniform_stream(hp, 2 + sp)
                    qd = -kap_s * wdc * (ci - cj)
                    qr = eps_s * wrc * xi * dt_inv_sqrt
                    d_extras.append(jnp.where(inside_c, qd + qr, 0.0))
                d_extras = tuple(d_extras)
                r_extras = d_extras          # purely antisymmetric
            fr = fmag * rinv
            dfx, dfy, dfz = fr * drx, fr * dry, fr * drz
            dvir = fmag * rr
            reacts = tuple(
                jnp.sum(p, axis=0, keepdims=True)
                for p in (dfx, dfy, dfz) + r_extras)
            return (dfx, dfy, dfz, dvir) + d_extras + reacts
        theta = rngmod._u32_to_symmetric_uniform(hp)
        if s_exp == 1.0:
            # factored form (wr == w): one fewer multiply chain
            fmag = w * (a_ij - (g_ij * w) * ev + s_ij * theta)
        else:
            fmag = a_ij * w - g_ij * (wr * wr) * ev + s_ij * wr * theta
        fmag = jnp.where(ok, fmag, 0.0)
        if n_excl:
            # exclusion tags and the tag channel are exact f32 values:
            # integer equality == f32 equality, no casts needed
            tgj_x = row[tag_chan]
            hit = selfc(ex_chan) == tgj_x
            for e in range(1, n_excl):
                hit = hit | (selfc(ex_chan + e) == tgj_x)
            fmag = fmag * jnp.where(hit, excl_w, 1.0)
        if debug_pairs:
            # pair-accounting mode: fx = pair count, fy = sum of partner
            # keys (top-23 bits of the hash channel — exact in f32).
            # Reactions land the TARGET keys on the source, so both sides
            # stay exactly comparable to the dense oracle's accounting.
            okf = ok.astype(jnp.float32)
            # 14-bit keys: row sums of ~30 keys stay exact in f32
            key_j = jax.lax.shift_right_logical(
                row[-1], 18).astype(jnp.float32)
            key_i = jax.lax.shift_right_logical(
                self_h, 18).astype(jnp.float32)
            dfx = okf
            dfy = okf * key_j
            dfz = jnp.zeros_like(okf)
            rfx = jnp.sum(okf, axis=0, keepdims=True)
            rfy = jnp.sum(okf * key_i, axis=0, keepdims=True)
            rfz = jnp.zeros((1, l_lane), jnp.float32)
            # reactions are SUBTRACTED by the caller; negate so counts add
            return dfx, dfy, dfz, jnp.zeros_like(okf), -rfx, -rfy, -rfz
        fr = fmag * rinv
        dfx = fr * drx
        dfy = fr * dry
        dfz = fr * drz
        rfx = jnp.sum(dfx, axis=0, keepdims=True)
        rfy = jnp.sum(dfy, axis=0, keepdims=True)
        rfz = jnp.sum(dfz, axis=0, keepdims=True)
        if not need_virial:
            # virial-free thermo-off path (r5): drops the dvir math and
            # one whole output channel; device-bitwise on f
            return dfx, dfy, dfz, rfx, rfy, rfz
        # Newton: pair visited once — full virial on the target side
        dvir = fmag * rr
        return dfx, dfy, dfz, dvir, rfx, rfy, rfz

    zero = jnp.zeros((k, l_lane), jnp.float32)
    groups = _groups(k)

    def read_group(band_ref, g0):
        blocks = tuple(band_ref[c, 0, 0, g0:g0 + 8, :]
                       for c in range(n_chan))
        if rng_mode == "fast" or debug_pairs:
            # hash the group's tag values ONCE (48 uint ops / element,
            # amortized over every offset pass); rolls see it as int32
            blocks = blocks + (hash_of(blocks[tag_chan]),)
        return blocks

    r_iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, l_lane), 0)

    if not need_virial:
        # only the classic-DPD production path runs virial-free; the
        # transport models and debug accounting always carry channel 3
        assert model == "dpd" and not debug_pairs
    vir_off = 1 if need_virial else 0
    n_tacc = 3 + vir_off + n_extra  # target accumulators (fx,fy,fz[,vir],+)
    n_react = 3 + n_extra           # reaction channels (no virial react)
    # out channels the reaction blocks land in (virial channel skipped)
    react_chans = [0, 1, 2] + [3 + vir_off + i for i in range(n_extra)]

    def run_rows(rows, off, acc, g0, center=False):
        """All 8 source rows of one rolled group vs the tile.

        Reaction rows are assembled into an (8, L) block with masked
        broadcast sums — NEVER by concatenating sliced/rolled values,
        which Mosaic mis-lowers or rejects ("result/input offset mismatch
        on non-concat dimension", CLAUDE.md r3) — then back-rolled once
        per offset into the group's (8, L) reaction accumulator.
        """
        tacc = list(acc[:n_tacc])
        gb = list(acc[n_tacc:])
        a8 = [jnp.zeros((8, l_lane), jnp.float32)] * n_react
        # center pass, group 0: slot 0 has no lower slot to pair with
        r_first = 1 if (center and g0 == 0) else 0
        for r in range(r_first, 8):
            res = pair_rows(rows, r,
                            center_j=(g0 + r) if center else None)
            sel = r_iota8 == r
            for i in range(n_tacc):
                tacc[i] = tacc[i] + res[i]
            for i in range(n_react):
                a8[i] = a8[i] + jnp.where(sel, res[n_tacc + i], 0.0)
        for i in range(n_react):
            gb[i] = gb[i] - roll_back(a8[i], off)
        return tuple(tacc) + tuple(gb)

    def band_pass(band_ref, offs, base, jm, acc, plane):
        """One band over its offset list (plane=0 adds the (0,0)
        same-column center pass in front, valid for the mid band only).

        Group reaction blocks land in out_ref[:, plane] via ALIGNED (8, L)
        slice read-modify-writes — the store relayouts the lazily-rolled
        accumulators; no in-kernel concatenate exists on any path."""
        center = plane == 0
        g8 = jnp.zeros((8, l_lane), jnp.float32)
        for g0 in groups:
            def do_group(acc=acc, g0=g0):
                acc2 = tuple(acc) + (g8,) * n_react
                raw = read_group(band_ref, g0)
                if center:
                    acc2 = run_rows(raw, 0, acc2, g0, center=True)
                if dyn_roll:
                    def obody(oi, acc3):
                        off = offs_ref[0, base + oi]
                        rows = roll_fwd(raw, off)
                        return run_rows(rows, off, acc3, g0)
                    acc2 = jax.lax.fori_loop(0, len(offs), obody, acc2)
                else:
                    for off in offs:
                        rows = roll_fwd(raw, off)
                        acc2 = run_rows(rows, off, acc2, g0)
                return acc2

            if g0 == 0 and center:
                accf = do_group()
            else:
                accf = jax.lax.cond(
                    jm > g0, do_group,
                    lambda acc=acc: tuple(acc) + (g8,) * n_react)
            acc = accf[:n_tacc]
            gb = accf[n_tacc:]
            # unconditional aligned store (skipped groups add zeros)
            sl = slice(g0, g0 + 8)
            for oc, gbi in zip(react_chans, gb):
                out_ref[oc, plane, 0, 0, sl, :] = (
                    out_ref[oc, plane, 0, 0, sl, :] + gbi)
        return acc

    # out_ref starts as the reaction accumulator: plane 0 collects the
    # same-row (mid band) reactions — they ARE row cy — and plane 1 the
    # down-band reactions (row cy+1, rolled down by the XLA epilogue);
    # the target-side register accumulators are added at the end.
    for c in range(n_tacc):
        out_ref[c, 0, 0, 0] = zero
        out_ref[c, 1, 0, 0] = zero
    acc = (zero,) * n_tacc
    acc = band_pass(b_mid, mid_half, mid_base, jm_mid, acc, plane=0)
    accf = band_pass(b_down, down_full, down_base, jm_down, acc, plane=1)

    out_ref[0, 0, 0, 0] = out_ref[0, 0, 0, 0] + accf[0]
    out_ref[1, 0, 0, 0] = out_ref[1, 0, 0, 0] + accf[1]
    out_ref[2, 0, 0, 0] = out_ref[2, 0, 0, 0] + accf[2]
    if need_virial:
        out_ref[3, 0, 0, 0] = accf[3]
    for i in range(n_extra):
        c = 3 + vir_off + i
        out_ref[c, 0, 0, 0] = out_ref[c, 0, 0, 0] + accf[c]


# Static-path lane-length rule (device toolchain bug, PERF_NOTES r3):
# every device-passing static shape has l_lane % 16 == 12 and every
# failing one % 16 == 0 (characterized by tools/v3_lane_disc.py). None =
# no padding (rule not yet confirmed); an int = pad l_lane up to this
# residue mod 16. Padding pad lanes are inert (VALID=0 / x-poisoned) and
# z periodicity moves to explicit halo rows (circular roll wrap cannot
# cross pads).
_LANE_RESIDUE: int | None = None


def _lane_rule(l: int) -> int:
    if _LANE_RESIDUE is None:
        return l
    return l + (_LANE_RESIDUE - l) % 16


# Row-width rule (the ACTUAL static-path miscompile axis per
# tools/v3_lane_scan.py: failures are determined by w_lane, not by the
# total lane length — w in {10, 11} pass while {8, 12, 13, 14, 18, 28,
# 29} fail, same L). When set, each z-row is padded with dead lanes
# (VALID=0 / x-poisoned) from its natural width nx+2*xr up to the next
# width whose residue mod 16 is in this set. Dead lanes are never targets
# (outside [xr, xr+nx)) and never valid sources; rolls keep the padded
# stride, so pair enumeration is unchanged.
_W_RESIDUES: frozenset[int] | None = None


def _w_rule(w: int) -> int:
    if _W_RESIDUES is None or (w % 16) in _W_RESIDUES:
        return w
    while (w % 16) not in _W_RESIDUES:
        w += 1
    return w


# Largest lane length the device toolchain is KNOWN to compile, per RNG
# tier (VERDICT r4 item 4 — auto-zc must never pick a non-compiling lane
# vector). Measured on the axon v5e: fast l_lane=648 compiles (the 1M
# zc=5 production record) while 1458 fails (auto zc=2 at 1M); tea
# l_lane=648 fails while 378 compiles (tools/tea1m.py zc=10). The true
# Mosaic threshold between those points is unprobed — raise these only
# with a new device compile record (tools/v3_compile_probe.py).
_MAX_L_LANE = {"fast": 648, "tea": 378}


def _auto_z_chunks(n_chan: int, k: int, nz: int, w_lane: int,
                   budget_bytes: int = 9 * 2 ** 20,
                   z_halo_always: bool = False,
                   max_lane: int | None = None) -> int:
    """Smallest divisor of nz keeping the kernel VMEM footprint in budget
    AND the physical lane length within the device-validated compile
    range: 2 band blocks + the double output block, double-buffered, plus
    working tiles for the unrolled 8-row group body."""
    k_phys = -(-k // 8) * 8
    for zc in range(1, nz + 1):
        if nz % zc:
            continue
        halo = 2 if (zc > 1 or z_halo_always) else 0
        l_log = (nz // zc + halo) * w_lane       # the actual l_lane
        if max_lane is not None and l_log > max_lane and zc < nz:
            continue
        l_phys = -(-l_log // 128) * 128
        per_block = k_phys * l_phys * 4
        total = (2 * 2 * n_chan + 2 * 8 + 24) * per_block
        if total <= budget_bytes:
            return zc
    return nz


def _v3_forces(x: Array, v: Array, typ: Array, tag: Array,
               mask: Array, box: Box, step: Array,
               pair_tab, seed, dt: float, cfg: CellConfig,
               rng_mode: str, rng_rounds: int,
               interpret: bool | None, s_exp: float, z_chunks: int,
               dyn_roll: bool, debug_pairs: bool, lane_pad: int,
               w_pad: int, model: str = "dpd", extras=(),
               scal_tail=(), excl=None, excl_w=None,
               need_virial: bool = True):
    """Shared Newton fused-lane driver for all three pair models.

    ``pair_tab`` = (a, gamma, s, rc) (T,T) tables with s = sigma/sqrt(dt)
    (dpd/tdpd) or kappa (eDPD); ``extras`` = per-particle scalar fields
    appended to the channel stack (eDPD T, tDPD C species) whose pair
    fluxes come back as extra output planes; ``scal_tail`` = model
    scalars appended after the 12 base SMEM entries. Returns
    (f (nr, 3), virial, extra_outs tuple of (nr,) arrays).
    """
    if interpret is None:
        interpret = os.environ.get("MESO_PALLAS_INTERPRET") == "1"
    a_t, g_t, s_t, rc_t = pair_tab
    ns = len(extras) if model == "tdpd" else 0
    n_extra = 1 if model == "edpd" else ns
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = x.shape[0]
    xr = 2 if cfg.spill else 1
    # wrap_at_rebuild layouts (System.wrap_mode="rebuild"): positions are
    # only box-wrapped at rebuild time, so no mid-window global-wrap
    # crossers exist; the kernel drops per-candidate min-image and the
    # validity product (pads pre-shifted by +-L, invalid slots x-poisoned)
    min_image = not getattr(cfg, "wrap_at_rebuild", False)
    if nx < 2 * xr + 1:
        raise ValueError(f"ncx={nx} too small for the +-{xr} circular "
                         "x-window (needs ncx >= 2*xr+1)")
    if ny < 2:
        raise ValueError("v3 kernel needs ncy >= 2 (row-pair Newton grid)")
    w_log = nx + 2 * xr                  # natural row width (wrap pads)
    w_lane = w_pad if w_pad else _w_rule(w_log)
    if w_lane < w_log:
        raise ValueError(f"w_pad={w_pad} below natural width {w_log}")

    shape = (ny, nz, k, nx)
    vmask = mask.astype(jnp.float32).reshape(shape)
    x0 = x[:, 0]
    if not min_image:
        # poison invalid slots: the cutoff compare masks them for free
        x0 = jnp.where(mask, x0, _POISON)
    # channel 6 (_TAGV): tags as exact f32 VALUES. NO integer bit pattern
    # ever rides the f32 stack as a bitcast — the device toolchain
    # corrupts bitcast channels value- and shape-dependently (r3 root
    # cause, PERF_NOTES); both RNG tiers hash tag values in-kernel.
    if nr >= (1 << 24):
        raise ValueError("v3 kernel carries tags as exact f32 values; "
                         "tag ids must stay below 2^24")
    tag_f = tag.astype(jnp.float32)
    chans = [
        x0.reshape(shape), x[:, 1].reshape(shape), x[:, 2].reshape(shape),
        v[:, 0].reshape(shape), v[:, 1].reshape(shape), v[:, 2].reshape(shape),
        tag_f.reshape(shape), vmask,
    ]
    n_types = a_t.shape[0]
    typ_chan = ex_chan = mc_chan = -1
    tag_chan = _TAGV
    n_excl = 0
    if rng_mode not in ("tea", "fast"):
        raise ValueError(f"unknown rng_mode {rng_mode!r}")
    if n_types > 1:
        typ_chan = len(chans)
        chans.append(typ.astype(jnp.float32).reshape(shape))
    if extras:
        mc_chan = len(chans)
        for fld in extras:
            chans.append(fld.reshape(shape))
    if excl is not None:
        n_excl = excl.shape[1]
        ex_chan = len(chans)
        ex = excl[tag]                               # (nr, E) gather
        for e in range(n_excl):
            chans.append(ex[:, e].astype(jnp.float32).reshape(shape))
    n_chan = len(chans)

    zc = z_chunks
    if zc <= 0:
        zc = _auto_z_chunks(n_chan, k, nz, w_lane,
                            z_halo_always=dyn_roll or not min_image,
                            max_lane=None if interpret
                            else _MAX_L_LANE[rng_mode])
    if nz % zc:
        raise ValueError(f"z_chunks={zc} must divide ncz={nz}")
    nzc = nz // zc
    # dyn_roll: tpu.dynamic_rotate needs a 128-aligned lane dim, so the
    # lane row is zero-padded up to a 128 multiple — which forbids relying
    # on circular roll wrap for z periodicity, hence z halos always.
    # no-min-image mode likewise: z periodicity must come from shifted
    # halo copies, not circular roll wrap + coordinate re-imaging
    z_halo = (zc > 1) or dyn_roll or not min_image
    body_z = (nzc + 2) if z_halo else nz
    l_log = body_z * w_lane
    if dyn_roll:
        l_lane = -(-l_log // 128) * 128
    else:
        want = lane_pad if lane_pad else _lane_rule(l_log)
        if want != l_log and not z_halo:
            # pad lanes break circular-roll z periodicity: switch to
            # explicit z halo rows (source-only copies), then re-derive
            # the pad target for the halo'd length
            z_halo = True
            body_z = nzc + 2
            l_log = body_z * w_lane
            want = lane_pad if lane_pad else _lane_rule(l_log)
        l_lane = max(want, l_log)

    # pad capacity to a multiple of 8: every kernel source group is then
    # sublane-aligned (see _groups); pad slots carry VALID=0 zeros
    kp = -(-k // 8) * 8

    lens = box.lengths

    def prep(stack):
        """(C, ny, nz, k, nx) -> cy-padded (C, ny+2, zc, kp, L) view.

        Without min-image (wrap_at_rebuild), wrap-pad copies carry
        pre-shifted coordinates (+-L on their own axis channel) and pad
        slots are x-poisoned, so the kernel needs no re-imaging."""
        c_dim = stack.shape[0]

        def shifted(sl, chan, delta):
            if min_image:
                return sl
            # shift ONLY the coordinate channel: arithmetic on the other
            # channels (even + 0.0) canonicalizes NaN bit patterns and
            # flushes denormals in the bitcast hash/tag channels, silently
            # changing theta for wrapped pairs
            return sl.at[chan].add(delta)

        if kp > k:
            stack = jnp.pad(
                stack, [(0, 0), (0, 0), (0, 0), (0, kp - k), (0, 0)])
            if not min_image:
                stack = stack.at[_SX, :, :, k:, :].set(_POISON)
        planes = stack.transpose(0, 1, 3, 2, 4)     # (C, ny, kp, nz, nx)
        if z_halo:
            zpad = jnp.concatenate(
                [shifted(planes[..., -1:, :], _SZ, -lens[2]), planes,
                 shifted(planes[..., :1, :], _SZ, lens[2])], axis=3)
            chunks = jnp.stack(
                [zpad[..., i * nzc:i * nzc + nzc + 2, :]
                 for i in range(zc)], axis=2)
        else:
            chunks = planes[:, :, None]             # (C, ny, 1, k, nz, nx)
        chunks = jnp.concatenate(
            [shifted(chunks[..., -xr:], _SX, -lens[0]), chunks,
             shifted(chunks[..., :xr], _SX, lens[0])], axis=-1)
        if w_lane > w_log:
            # dead per-row pad lanes (_W_RESIDUES / w_pad): inert sources
            # (VALID=0 zeros / poisoned x), never targets
            chunks = jnp.pad(
                chunks, [(0, 0)] * (chunks.ndim - 1) + [(0, w_lane - w_log)])
            if not min_image:
                chunks = chunks.at[_SX, ..., w_log:].set(_POISON)
        vw = chunks.reshape(c_dim, ny, zc, kp, l_log)
        if l_lane > l_log:
            vw = jnp.pad(vw, [(0, 0)] * 4 + [(0, l_lane - l_log)])
            if not min_image:
                vw = vw.at[_SX, ..., l_log:].set(_POISON)
        return jnp.concatenate(
            [shifted(vw[:, -1:], _SY, -lens[1]), vw,
             shifted(vw[:, :1], _SY, lens[1])], axis=1)

    view = prep(jnp.stack(chans))

    scal = jnp.stack([
        a_t[0, 0], g_t[0, 0], s_t[0, 0], rc_t[0, 0],
        lens[0], lens[1], lens[2],
        1.0 / lens[0], 1.0 / lens[1], 1.0 / lens[2],
        jnp.float32(1.0) if excl_w is None else excl_w,
        1.0 / rc_t[0, 0]]
        + [jnp.asarray(sv, jnp.float32) for sv in scal_tail]
    ).reshape(1, 12 + len(scal_tail))
    iscal = jnp.stack([jnp.asarray(step, jnp.int32),
                       jnp.asarray(seed).astype(jnp.int32)]).reshape(1, 2)
    if n_types > 1:
        tab = jnp.stack([a_t.reshape(-1), g_t.reshape(-1),
                         s_t.reshape(-1),
                         (rc_t * rc_t).reshape(-1),
                         (1.0 / rc_t).reshape(-1)])
    else:
        tab = jnp.zeros((5, 1), jnp.float32)

    # per-(cy, chunk) occupancy bounds for the mid and down bands: max
    # occupied slot (+1) over the chunk's z-range +-1 (rolled sources mix
    # the chunk pads)
    occ_slot = jnp.where(vmask > 0.5,
                         jnp.arange(1, k + 1, dtype=jnp.int32)[None, None,
                                                               :, None], 0)
    occ_yz = jnp.max(occ_slot, axis=(2, 3))         # (ny, nz)
    occ_pad = jnp.concatenate(
        [occ_yz[:, -1:], occ_yz, occ_yz[:, :1]], axis=1)
    jm_rows = jnp.stack(
        [jnp.max(occ_pad[:, i * nzc:i * nzc + nzc + 2], axis=1)
         for i in range(zc)], axis=1)               # (ny, zc)
    jm_mid = jnp.maximum(jm_rows, 1)
    jm_down = jnp.roll(jm_mid, -1, axis=0)
    jm = jnp.stack([jm_mid.reshape(-1), jm_down.reshape(-1)])  # (2, ny*zc)

    # offset table (only read when dyn_roll)
    mid_half = ([dx for dx in range(1, xr + 1)]
                + [w_lane + dx for dx in range(-xr, xr + 1)])
    down_full = [dz * w_lane + dx for dz in (-1, 0, 1)
                 for dx in range(-xr, xr + 1)]
    offs = jnp.asarray([mid_half + down_full], jnp.int32)

    def band_spec(dy):
        return pl.BlockSpec(
            (n_chan, 1, 1, kp, l_lane),
            index_map=lambda cy, cb: (0, cy + dy, cb, 0, 0),
            memory_space=pltpu.VMEM)

    vir_off = 1 if need_virial else 0
    n_out = 3 + vir_off + n_extra
    in_specs = [
        pl.BlockSpec((1, 12 + len(scal_tail)), lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda cy, cb: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(tab.shape, lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((2, ny * zc), lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, offs.shape[1]), lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        band_spec(1), band_spec(2),
    ]

    out = pl.pallas_call(
        partial(_v3_kernel, k=kp, w_lane=w_lane, l_lane=l_lane,
                rng_mode=rng_mode, rng_rounds=rng_rounds, n_chan=n_chan,
                n_types=n_types, typ_chan=typ_chan, tag_chan=tag_chan,
                n_excl=n_excl, ex_chan=ex_chan, s_exp=s_exp, xr=xr,
                dyn_roll=dyn_roll, nx=nx, nzc=nzc, zc=zc, z_halo=z_halo,
                debug_pairs=debug_pairs, min_image=min_image,
                model=model, ns=ns, mc_chan=mc_chan,
                need_virial=need_virial),
        grid=(ny, zc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n_out, 2, 1, 1, kp, l_lane),
            index_map=lambda cy, cb: (0, 0, cy, cb, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, 2, ny, zc, kp, l_lane),
                                       jnp.float32),
        interpret=interpret,
    )(scal, iscal, tab, jm, offs, view, view)

    # epilogue: combine the reaction plane (targets row cy+1) into its row,
    # then harvest reactions that landed on pad lanes onto the real twins
    combined = out[:, 0] + jnp.roll(out[:, 1], 1, axis=1)
    arr = combined[..., :l_log].reshape(n_out, ny, zc, kp, body_z, w_lane)
    core = arr[..., xr:xr + nx]
    # x wrap pads: left pads are twins of the LAST xr columns, right pads
    # of the first xr (any dead w_pad lanes beyond nx+2*xr carry zeros)
    core = core.at[..., nx - xr:].add(arr[..., :xr])
    core = core.at[..., :xr].add(arr[..., nx + xr:nx + 2 * xr])
    if z_halo:
        zcore = core[..., 1:-1, :]
        # left z pad of chunk cb = last real z of chunk cb-1 (wraps)
        zcore = zcore.at[:, :, :, :, -1, :].add(
            jnp.roll(core[:, :, :, :, 0, :], -1, axis=2))
        zcore = zcore.at[:, :, :, :, 0, :].add(
            jnp.roll(core[:, :, :, :, -1, :], 1, axis=2))
        core = zcore
    # (n_out, ny, zc, kp, nzc, nx) -> (n_out, ny, nz, kp, nx) -> drop pads
    outp = core.transpose(0, 1, 2, 4, 3, 5).reshape(n_out, ny, nz, kp, nx)
    outp = outp[:, :, :, :k]
    f = jnp.stack([outp[0].reshape(nr), outp[1].reshape(nr),
                   outp[2].reshape(nr)], axis=-1)
    extra_outs = tuple(outp[3 + vir_off + i].reshape(nr)
                       for i in range(n_extra))
    vir = jnp.sum(outp[3]) if need_virial else jnp.float32(0.0)
    return f, vir, extra_outs


@partial(jax.jit, static_argnames=("dt", "cfg", "rng_mode", "rng_rounds",
                                   "interpret", "s_exp", "z_chunks",
                                   "dyn_roll", "debug_pairs", "lane_pad",
                                   "w_pad", "need_virial"))
def bucket_forces_pallas_v3(x: Array, v: Array, typ: Array, tag: Array,
                            mask: Array, box: Box, step: Array,
                            params: DPDParams, dt: float, cfg: CellConfig,
                            rng_mode: str = "fast", rng_rounds: int = 8,
                            interpret: bool | None = None,
                            s_exp: float = 1.0, z_chunks: int = 0,
                            dyn_roll: bool = False,
                            debug_pairs: bool = False, lane_pad: int = 0,
                            w_pad: int = 0, need_virial: bool = True):
    """Classic-DPD forces via the Newton fused-lane kernel.

    Interface matches ``bucket_forces_pallas_fused`` (its bit-reference up
    to fp addition order). Returns (f (nr, 3), virial).
    need_virial=False (the thermo-off production loop) drops the virial
    math and its whole output channel; the returned virial is 0.0 and f
    is device-bitwise vs the default path (tools/r5b_gate.py NV_BITWISE).
    """
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    f, vir, _ = _v3_forces(
        x, v, typ, tag, mask, box, step,
        (params.a, params.gamma, params.sigma * dt_inv_sqrt, params.rc),
        params.seed, dt, cfg, rng_mode, rng_rounds, interpret, s_exp,
        z_chunks, dyn_roll, debug_pairs, lane_pad, w_pad,
        excl=params.excl, excl_w=params.excl_w,
        need_virial=need_virial or debug_pairs)
    return f, vir


@partial(jax.jit, static_argnames=("dt", "cfg", "rng_mode", "rng_rounds",
                                   "interpret", "z_chunks", "lane_pad",
                                   "w_pad"))
def bucket_forces_pallas_v3_edpd(x: Array, v: Array, t: Array, typ: Array,
                                 tag: Array, mask: Array, box: Box,
                                 step: Array, params, dt: float,
                                 cfg: CellConfig, rng_mode: str = "fast",
                                 rng_rounds: int = 8,
                                 interpret: bool | None = None,
                                 z_chunks: int = 0, lane_pad: int = 0,
                                 w_pad: int = 0):
    """eDPD forces + heat via the Newton kernel (SURVEY rows 22/A.2, r4
    port of the v2 ``bucket_forces_pallas_edpd_fused`` — same math, half
    the candidates). Returns (f, dTdt, virial)."""
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    f, vir, (q,) = _v3_forces(
        x, v, typ, tag, mask, box, step,
        (params.a, params.gamma, params.kappa, params.rc),
        params.seed, dt, cfg, rng_mode, rng_rounds, interpret, 1.0,
        z_chunks, False, False, lane_pad, w_pad,
        model="edpd", extras=(t,),
        scal_tail=(dt_inv_sqrt, 1.0 / params.mass))
    return f, q / params.cv, vir


@partial(jax.jit, static_argnames=("dt", "cfg", "rng_mode", "rng_rounds",
                                   "interpret", "z_chunks", "lane_pad",
                                   "w_pad"))
def bucket_forces_pallas_v3_tdpd(x: Array, v: Array, c: Array, typ: Array,
                                 tag: Array, mask: Array, box: Box,
                                 step: Array, params, dt: float,
                                 cfg: CellConfig, rng_mode: str = "fast",
                                 rng_rounds: int = 8,
                                 interpret: bool | None = None,
                                 z_chunks: int = 0, lane_pad: int = 0,
                                 w_pad: int = 0):
    """tDPD forces + per-species fluxes via the Newton kernel (SURVEY rows
    23/A.3, r4 port of ``bucket_forces_pallas_tdpd_fused``).
    Returns (f, dCdt (nr, S), virial)."""
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    ns = params.n_species
    tail = [dt_inv_sqrt, params.rcc, params.s1]
    for sp in range(ns):
        tail += [params.kappa_c[sp], params.eps_c[sp]]
    f, vir, extra = _v3_forces(
        x, v, typ, tag, mask, box, step,
        (params.a, params.gamma, params.sigma * dt_inv_sqrt, params.rc),
        params.seed, dt, cfg, rng_mode, rng_rounds, interpret, 1.0,
        z_chunks, False, False, lane_pad, w_pad,
        model="tdpd", extras=tuple(c[:, sp] for sp in range(ns)),
        scal_tail=tuple(tail))
    dcdt = jnp.stack(extra, axis=-1)
    return f, dcdt, vir
