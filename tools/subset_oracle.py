"""Exact subset force oracle — correctness gate at shapes where the full
dense O(N^2) oracle is infeasible (e.g. the 1M production config).

For M sampled valid rows, computes the EXACT DPD force (conservative +
dissipative + random, fast or tea tier, full minimum image) against ALL
sources in numpy float32 with the same pair math as ops/dpd.dense_forces,
then compares against a kernel-produced force array. O(M*N) with
vectorized numpy — ~1 GB peak and a few minutes at M=512, N=2M rows.

The r2/r3 device campaigns validated kernels only at small shapes where
the dense oracle fits; the width-rule miscompile (PERF_NOTES r3) showed
shape-dependent corruption that small-shape gates CANNOT catch — this
closes that hole for any shape.

Usage (library):
    from tools.subset_oracle import subset_check
    rep = subset_check(bst, box, step, params, dt, rng_mode, f_kernel,
                       m=512, seed=0)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

_DELTA = np.uint32(0x9E3779B9)
_K2 = np.uint32(0xC2B2AE35)
_K3 = np.uint32(0x27D4EB2F)
_U23 = np.float32(1.1920928955078125e-07)
_SQRT12 = np.float32(3.4641016151377544)


def _tea_np(v0, v1, k0, k1, rounds=8):
    v0 = v0.astype(np.uint32).copy()
    v1 = v1.astype(np.uint32).copy()
    s = np.uint32(0)
    with np.errstate(over="ignore"):
        for _ in range(rounds):
            s = np.uint32(s + _DELTA)
            v0 += ((v1 << np.uint32(4)) + k0) ^ (v1 + s) ^ \
                ((v1 >> np.uint32(5)) + k1)
            v1 += ((v0 << np.uint32(4)) + _K2) ^ (v0 + s) ^ \
                ((v0 >> np.uint32(5)) + _K3)
    return v0, v1


def _sym_uniform(u):
    unit = (u >> np.uint32(9)).astype(np.float32) * _U23
    return (unit - np.float32(0.5)) * _SQRT12


def _combine_np(a, b):
    with np.errstate(over="ignore"):
        s = a + b
        x = a ^ b
        s = s ^ (s >> np.uint32(16))
        s = (s * np.uint32(0x7FEB352D)).astype(np.uint32)
        s = s ^ x
        s = s ^ (s >> np.uint32(15))
        s = (s * np.uint32(0x846CA68B)).astype(np.uint32)
        s = s ^ (s >> np.uint32(16))
    return s


def subset_forces(x, v, tag, mask, lens, step, params, dt, rng_mode, rows):
    """Exact forces on `rows` (indices) vs all valid sources. Single-type."""
    a = float(np.asarray(params.a)[0, 0])
    gamma = float(np.asarray(params.gamma)[0, 0])
    sigma = float(np.asarray(params.sigma)[0, 0])
    rc = float(np.asarray(params.rc)[0, 0])
    seed = np.uint32(int(np.asarray(params.seed)))
    stepu = np.uint32(int(step))
    sdt = np.float32(sigma / np.sqrt(dt))

    xs = x[rows].astype(np.float32)          # (M, 3)
    vs = v[rows].astype(np.float32)
    ts = tag[rows].astype(np.int64)
    f = np.zeros((len(rows), 3), np.float32)

    if rng_mode == "fast":
        hall, _ = _tea_np(tag.astype(np.uint32),
                          tag.astype(np.uint32) ^ np.uint32(0xDEADBEEF),
                          stepu, seed)

    lens = np.asarray(lens, np.float32)
    valid = mask.astype(bool)
    for i in range(len(rows)):
        dr = (xs[i] - x).astype(np.float32)
        dr -= np.round(dr / lens).astype(np.float32) * lens
        r2 = np.sum(dr * dr, axis=1)
        ok = valid & (r2 < rc * rc) & (r2 > 0.0)
        ok[rows[i]] = False
        j = np.nonzero(ok)[0]
        drj = dr[j]
        r = np.sqrt(r2[j]).astype(np.float32)
        e = drj / r[:, None]
        w = (np.float32(1.0) - r / np.float32(rc)).astype(np.float32)
        dv = (vs[i] - v[j]).astype(np.float32)
        ev = np.sum(e * dv, axis=1).astype(np.float32)
        if rng_mode == "tea":
            lo = np.minimum(ts[i], tag[j]).astype(np.uint32)
            hi = np.maximum(ts[i], tag[j]).astype(np.uint32)
            t0, _ = _tea_np(lo, hi, stepu, seed)
            theta = _sym_uniform(t0)
        else:
            theta = _sym_uniform(_combine_np(hall[rows[i]], hall[j]))
        fmag = (np.float32(a) * w - np.float32(gamma) * (w * w) * ev
                + sdt * w * theta).astype(np.float32)
        f[i] = np.sum(fmag[:, None] * e, axis=0)
    return f


def subset_check(x, v, tag, mask, lens, step, params, dt, rng_mode,
                 f_kernel, m=512, seed=0, label=""):
    """Compare kernel forces against the exact subset oracle."""
    rs = np.random.RandomState(seed)
    valid_rows = np.nonzero(np.asarray(mask))[0]
    rows = rs.choice(valid_rows, size=min(m, len(valid_rows)),
                     replace=False)
    f_o = subset_forces(np.asarray(x), np.asarray(v), np.asarray(tag),
                        np.asarray(mask), lens, step, params, dt,
                        rng_mode, rows)
    fk = np.asarray(f_kernel)[rows]
    scale = max(np.abs(f_o).max(), 1e-9)
    err = np.abs(fk - f_o).max() / scale
    ok = err < 5e-4          # fp32 addition-order slack over ~40 pairs
    print(f"{'PASS' if ok else 'FAIL'} subset-oracle {label} m={len(rows)} "
          f"rel={err:.2e}", flush=True)
    return ok, err
