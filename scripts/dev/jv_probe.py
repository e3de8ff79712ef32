"""Probe: JV assignment latency on TPU — scatter-based (current) vs where-based body.

The solver is pure serialized lax.while_loop latency; each iteration's cost is
op-count x tiny-op latency. Hypothesis: the at[].set dynamic-update-slices and
dynamic gathers in the body dominate; masked `where` updates over the full [n]
vector should be cheaper on the VPU.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.objfield.hungarian import masked_assignment

_INF = jnp.inf


def _aps_where(cost, u, v, row4col, col4row, cur_row):
    n = cost.shape[0]
    ar = jnp.arange(n)

    def dij_cond(s):
        return (s[6] < 0) & (s[7] <= n)

    def dij_body(s):
        i, min_val, remaining, sr, shortest, path, _sink, it = s
        sr = sr | (ar == i)
        ci = jnp.sum(jnp.where((ar == i)[:, None], cost, 0.0), axis=0)
        ui = jnp.sum(jnp.where(ar == i, u, 0.0))
        r = min_val + ci - ui - v
        upd = (r < shortest) & remaining
        path = jnp.where(upd, i, path)
        shortest = jnp.where(upd, r, shortest)
        masked = jnp.where(remaining, shortest, _INF)
        j = jnp.argmin(masked)
        min_val = masked[j]
        # row4col[j] without gather:
        rj = jnp.sum(jnp.where(ar == j, row4col, 0))
        hit_free = rj < 0
        sink = jnp.where(hit_free, j, -1)
        i = jnp.where(hit_free, i, rj)
        remaining = remaining & (ar != j)
        return (i, min_val, remaining, sr, shortest, path, sink, it + 1)

    init = (
        cur_row,
        jnp.asarray(0.0, cost.dtype),
        jnp.ones((n,), bool),
        jnp.zeros((n,), bool),
        jnp.full((n,), _INF, cost.dtype),
        jnp.full((n,), -1, jnp.int32),
        jnp.asarray(-1, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    _, min_val, remaining, sr, shortest, path, sink, _ = jax.lax.while_loop(
        dij_cond, dij_body, init)
    sink = jnp.maximum(sink, 0)

    u = u + jnp.where(ar == cur_row, min_val, 0.0)
    sr_other = sr & (ar != cur_row)
    shortest_at_rowcol = shortest[jnp.maximum(col4row, 0)]
    u = u + jnp.where(sr_other, min_val - shortest_at_rowcol, 0.0)
    scanned_cols = ~remaining
    v = v - jnp.where(scanned_cols, min_val - shortest, 0.0)

    def aug_cond(s):
        return (~s[3]) & (s[4] <= n)

    def aug_body(s):
        j, r4c, c4r, _done, it = s
        i = jnp.maximum(jnp.sum(jnp.where(ar == j, path, 0)), 0)
        r4c = jnp.where(ar == j, i, r4c)
        nj = jnp.sum(jnp.where(ar == i, c4r, 0))
        c4r = jnp.where(ar == i, j, c4r)
        return (nj, r4c, c4r, i == cur_row, it + 1)

    _, row4col, col4row, _, _ = jax.lax.while_loop(
        aug_cond, aug_body,
        (sink, row4col, col4row, jnp.asarray(False), jnp.asarray(0, jnp.int32)))
    return u, v, row4col, col4row


def masked_assignment_where(cost, valid_rows):
    n = cost.shape[0]
    ar = jnp.arange(n)
    cost = jax.lax.stop_gradient(jnp.asarray(cost, jnp.float32))
    cost = jnp.nan_to_num(cost, nan=1e9, posinf=1e9, neginf=-1e9)
    u = jnp.zeros((n,), cost.dtype)
    v = jnp.zeros((n,), cost.dtype)
    row4col = jnp.full((n,), -1, jnp.int32)
    col4row = jnp.full((n,), -1, jnp.int32)

    def body(cur_row, carry):
        return _aps_where(cost, *carry, cur_row)

    valid = jnp.clip(valid_rows.astype(jnp.int32), 0, n)
    _, _, row4col, col4row = jax.lax.fori_loop(0, valid, body,
                                               (u, v, row4col, col4row))
    free_col = row4col < 0
    rank = jnp.cumsum(free_col.astype(jnp.int32)) - 1
    col_for_rank = jnp.zeros((n,), jnp.int32).at[
        jnp.where(free_col, rank, n)].set(ar, mode="drop")
    pad_cols = col_for_rank[jnp.clip(ar - valid, 0, n - 1)]
    return jnp.where(ar < valid, col4row, pad_cols)


def timeit(f, *a, iters=50):
    out = f(*a)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    n = 33
    key = jax.random.PRNGKey(0)
    costs = jax.random.uniform(key, (2, n, n), jnp.float32)
    for valid in (8, 16, 33):
        vv = jnp.full((2,), valid, jnp.int32)
        cur = jax.jit(jax.vmap(masked_assignment))
        new = jax.jit(jax.vmap(masked_assignment_where))
        a = np.asarray(cur(costs, vv))
        b = np.asarray(new(costs, vv))
        # compare costs (tie-breaking may differ)
        ca = sum(float(costs[k, i, a[k, i]]) for k in range(2) for i in range(valid))
        cb = sum(float(costs[k, i, b[k, i]]) for k in range(2) for i in range(valid))
        t_cur = timeit(cur, costs, vv)
        t_new = timeit(new, costs, vv)
        print(f"valid={valid:2d}  cost cur={ca:.4f} new={cb:.4f} "
              f"match={abs(ca-cb) < 1e-4}  time cur={t_cur:.3f} ms  new={t_new:.3f} ms")


if __name__ == "__main__":
    main()
