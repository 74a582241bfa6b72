"""Stage-level breakdown of the 1M rebuild engines (r3, VERDICT item 5).

Device facts: gather engine 169.8 ms, sort engine 128.3 ms at 2M rows —
yet the raw ingredients measure far cheaper (multi-operand 2M lax.sort
~13 ms, (2M,16) wide gather ~51 ms, r2 PERF_NOTES). This probe times
cumulative prefixes of the sort engine to find where the rest goes, then
times candidate primitives for an incremental/hybrid engine:

  prefixes: pack | +key | +sort1 | +assign | +dummy-slot keying | +sort2
            | +unpack (= full)
  primitives: 1-col int32 scatter @2M | (256k,17) scatter (mover-sized)
            | (256k,17) gather | nonzero-compaction @2M | cumsum @2M

Run alone: nohup python tools/rebuild_breakdown.py > /tmp/rbk.log 2>&1 &
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

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.neighbor.bucket_layout import (_pack_rows, _unpack_rows,
                                             cell_coords, n_rows,
                                             rebuild_buckets_sort,
                                             spill_assign, to_bucket_state)
from meso_tpu.neighbor.cells import CellConfig


def bench(fn, *args, reps=5, label=""):
    jf = jax.jit(fn)
    out = jf(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = jf(*args)
    jax.block_until_ready(out)
    print(f"{label}: {(time.time() - t0) / reps * 1e3:.1f} ms", flush=True)
    return out


def main(l=70.0, skin=0.4):
    n = int(round(3.0 * l ** 3))
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(1), n, box, kt=1.0)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=3.0, skin=skin,
                             spill=True)
    bst = to_bucket_state(st, cfg)
    bst = bst.replace(x=box.wrap(bst.x + 0.05 * bst.v)[0])
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = n_rows(cfg)
    print(f"rows={bst.n} ncell={cfg.ncell} K={k}", flush=True)

    state = bst

    def stage_pack(s):
        packed, _ = _pack_rows(s)
        return packed

    def stage_key(s):
        cx, cy, cz = cell_coords(s.x, s.mask, s.box, cfg)
        key = (cy * nz + cz) * nx + cx
        return jnp.where(s.mask, key, nx * ny * nz)

    def stage_sort1(s):
        packed, _ = _pack_rows(s)
        key = stage_key(s)
        w = packed.shape[1]
        cols = [packed[:, i] for i in range(w)]
        sorted1 = jax.lax.sort([key] + cols, num_keys=1, is_stable=True)
        return sorted1[0]

    def run_assign(key_s, n_in):
        valid_s = key_s < nx * ny * nz
        base = key_s // nx
        cxs = key_s - base * nx
        return spill_assign(base, cxs, valid_s, n_in, nx, k, ny * nz,
                            wrap=True)

    def stage_assign(s):
        packed, _ = _pack_rows(s)
        key = stage_key(s)
        w = packed.shape[1]
        cols = [packed[:, i] for i in range(w)]
        sorted1 = jax.lax.sort([key] + cols, num_keys=1, is_stable=True)
        key_s = sorted1[0]
        target, fits, overflow = run_assign(key_s, s.n)
        return target, fits

    def stage_dummy(s):
        target, fits = stage_assign(s)
        used = jnp.zeros((nr,), jnp.int32).at[target].set(
            jnp.ones((s.n,), jnp.int32), mode="drop")
        unused_idx = jnp.argsort(used, stable=True)
        miss_rank = jnp.cumsum((~fits).astype(jnp.int32)) - 1
        t_dummy = unused_idx[jnp.minimum(miss_rank, nr - 1)]
        return jnp.where(fits, target, t_dummy).astype(jnp.int32)

    def stage_full(s):
        new, of = rebuild_buckets_sort(s, cfg)
        return new.x

    bench(stage_pack, state, label="pack (2Mx17 materialize)")
    bench(stage_key, state, label="key only")
    bench(stage_sort1, state, label="pack+key+sort1")
    bench(stage_assign, state, label="+spill assign (scans)")
    bench(stage_dummy, state, label="+used scatter+argsort (dummy keys)")
    bench(stage_full, state, label="FULL sort engine")

    # --- primitives for an incremental engine ---
    key = jax.random.PRNGKey(0)
    m = nr // 8
    idx = jax.random.permutation(key, nr)[:m]
    pay = jax.random.normal(key, (m, 17), jnp.float32)
    big = jnp.zeros((nr, 17), jnp.float32)
    vec = jnp.zeros((nr,), jnp.int32)
    src = jax.random.permutation(key, nr)

    bench(lambda v, i: v.at[i].set(1, mode="drop", unique_indices=True),
          vec, idx, label=f"1-col int32 scatter @{m} into {nr}")
    bench(lambda b, i, p: b.at[i].set(p, mode="drop", unique_indices=True),
          big, idx, pay, label=f"({m},17) row scatter")
    bench(lambda b, i: jnp.take(b, i, axis=0), big, idx,
          label=f"({m},17) row gather from {nr}")
    bench(lambda b, i: jnp.take(b, i, axis=0), big, src,
          label=f"({nr},17) full row gather")
    mask = jax.random.bernoulli(key, 0.1, (nr,))
    bench(lambda mk: jnp.nonzero(mk, size=m, fill_value=nr - 1)[0], mask,
          label=f"nonzero compaction @{nr} -> {m}")
    bench(lambda mk: jnp.cumsum(mk.astype(jnp.int32)), mask,
          label=f"cumsum @{nr}")
    two_col = [jax.random.randint(key, (nr,), 0, nr), src]
    bench(lambda a, b: jax.lax.sort([a, b], num_keys=1, is_stable=True)[1],
          *two_col, label=f"2-operand int sort @{nr}")
    print("RBK_DONE", flush=True)


if __name__ == "__main__":
    main()
