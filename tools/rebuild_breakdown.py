"""Stage-level breakdown of the 1M rebuild engines (VERDICT r4 item 1).

Times cumulative prefixes of the sort engine at the production shape to
attribute cost per pass, then candidate primitives. Measured history
(PERF_NOTES.md): r3 engine 128 ms (assign scans 58, dummy 29 on a 9 ms
sort floor); r4.1 table rewrite REGRESSED to 348 ms (2M-needle
searchsorted lowers to ~17 chained 2M gathers); r4.2 = plain-cummax
assign + r3-style dummy keying + native-dtype columns.

Harness rule: pass arrays as ARGUMENTS to the jitted fn — a closure-
captured array is a constant in the jaxpr and XLA folds the whole probe
at compile time (the r4 probe1 read 0.0 ms for every op this way).

Run alone (ONE device client):
  nohup python tools/rebuild_breakdown.py > /tmp/rbk.log 2>&1 &
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
from meso_tpu.neighbor.bucket_layout import (_dummy_targets, _state_cols,
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

    def stage_key(s):
        cx, cy, cz = cell_coords(s.x, s.mask, s.box, cfg)
        key = (cy * nz + cz) * nx + cx
        return jnp.where(s.mask, key, nx * ny * nz)

    def stage_sort1(s):
        cols, _ = _state_cols(s)
        key = stage_key(s)
        sorted1 = jax.lax.sort([key] + cols, num_keys=1, is_stable=True)
        return sorted1[0]

    def run_assign(key_s, n_in):
        valid_s = key_s < nx * ny * nz
        base = key_s // nx
        cxs = key_s - base * nx
        return spill_assign(base, cxs, valid_s, n_in, nx, k, ny * nz,
                            wrap=True)

    def stage_assign(s):
        key_s = stage_sort1(s)
        target, fits, of = run_assign(key_s, s.n)
        return target, fits

    def stage_dummy(s):
        target, fits = stage_assign(s)
        t_dummy = _dummy_targets(target, fits, nr)
        return jnp.where(fits, target, t_dummy).astype(jnp.int32)

    def stage_full(s):
        new, of = rebuild_buckets_sort(s, cfg)
        return new.x

    bench(stage_key, state, label="key only")
    bench(stage_sort1, state, label="key+cols+sort1 (r4.2 native cols)")
    bench(stage_assign, state, label="+spill assign (plain cummaxes, r4.2)")
    bench(stage_dummy, state, label="+dummy keys (scatter+sort+gather)")
    bench(stage_full, state, label="FULL sort engine (r4.2)")

    # --- primitives ---
    key = jax.random.PRNGKey(0)
    m = nr // 8
    idx = jax.random.permutation(key, nr)[:m]
    vec = jnp.zeros((nr,), jnp.int32)
    src = jax.random.permutation(key, nr)

    bench(lambda v, i: v.at[i].set(1, mode="drop", unique_indices=True),
          vec, idx, label=f"1-col int32 scatter @{m} into {nr}")
    bench(lambda v, i: v.at[i].set(1, mode="drop", unique_indices=True),
          vec, src, label=f"1-col int32 scatter @{nr} into {nr}")
    bench(lambda a: jax.lax.cummax(a), src, label=f"plain cummax @{nr}")
    bench(lambda a: jnp.cumsum(a), src, label=f"cumsum @{nr}")
    bench(lambda t, i: t[i], src, idx, label=f"1-col gather @{m} from {nr}")
    bench(lambda t, i: t[i], src, src, label=f"1-col gather @{nr} from {nr}")
    two_col = [jax.random.randint(key, (nr,), 0, nr), src]
    bench(lambda a, b: jax.lax.sort([a, b], num_keys=1, is_stable=True)[1],
          *two_col, label=f"2-operand int sort @{nr}")
    print("RBK_DONE", flush=True)


if __name__ == "__main__":
    main()
