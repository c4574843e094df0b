"""Jittable minimum-cost bipartite assignment (Hungarian algorithm).

Replaces the reference's host-side ``scipy.optimize.linear_sum_assignment``
call in the cross-phase instance matcher (reference:
mass/utils/experimentation.py:284-287).  Problem sizes are tiny (a few
instances per class), so an exact O(n^3) shortest-augmenting-path
formulation with dual potentials runs entirely under ``jit`` with
fixed shapes — the inner relaxation is vectorized over columns and the
augmentation is a ``lax.while_loop``.

Rectangular costs are padded to square with a constant (any constant
yields the same optimum over the real cells, matching scipy's
rectangular semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as _np

# a numpy scalar, NOT jnp: module-level device ops initialize the
# default backend at import, before any runtime platform selection
_INF = _np.float32(1e30)


def _solve_square(cost: jax.Array) -> jax.Array:
    """``col_of_row [n]`` minimizing ``sum cost[i, col_of_row[i]]`` over
    permutations, for a square ``[n, n]`` cost matrix."""
    n = cost.shape[0]
    # p[j] = row currently assigned to column j (-1 free); column 0 is a
    # virtual column holding the row being inserted
    cost = cost.astype(jnp.float32)

    def insert_row(carry, i):
        u, v, p = carry  # duals [n+1], [n+1], assignment p [n+1]
        p = p.at[0].set(i)
        minv = jnp.full(n + 1, _INF).at[0].set(-_INF)
        used = jnp.zeros(n + 1, jnp.bool_)
        way = jnp.zeros(n + 1, jnp.int32)

        def aug_cond(s):
            _, _, _, _, j0, done = s
            return ~done

        def aug_body(s):
            minv, used, way, (u, v, p), j0, _ = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0, :] - u[i0] - v[1:]
            cur = jnp.concatenate([jnp.array([_INF]), cur])
            better = (~used) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, _INF, minv)
            j1 = jnp.argmin(masked)
            delta = masked[j1]
            # update duals: used columns' rows gain delta, free shrink
            u = u.at[jnp.where(p >= 0, p, n + 1)].add(
                jnp.where(used, delta, 0.0), mode="drop")
            v = v - jnp.where(used, delta, 0.0)
            minv = jnp.where(used, minv, minv - delta)
            done = p[j1] < 0
            return minv, used, way, (u, v, p), j1, done

        minv, used, way, (u, v, p), j0, _ = jax.lax.while_loop(
            aug_cond, aug_body,
            (minv, used, way, (u, v, p), jnp.int32(0),
             jnp.asarray(False)))

        # walk the augmenting path backwards, reassigning columns
        def walk_cond(s):
            _, j0 = s
            return j0 != 0

        def walk_body(s):
            p, j0 = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = jax.lax.while_loop(walk_cond, walk_body, (p, j0))
        return (u, v, p), None

    u0 = jnp.zeros(n + 1, jnp.float32)
    v0 = jnp.zeros(n + 1, jnp.float32)
    p0 = jnp.full(n + 1, -1, jnp.int32)
    (_, _, p), _ = jax.lax.scan(insert_row, (u0, v0, p0),
                                jnp.arange(n, dtype=jnp.int32))

    col_of_row = jnp.full(n, -1, jnp.int32)
    rows_at_cols = jnp.where(p[1:] >= 0, p[1:], n + 1)
    col_of_row = col_of_row.at[rows_at_cols].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return col_of_row


def linear_sum_assignment(cost: jax.Array,
                          num_rows=None, num_cols=None):
    """Minimum-cost assignment of a (possibly rectangular, possibly
    padded) cost matrix.

    Args:
      cost: ``[R, C]`` costs.  Entries beyond ``num_rows``/``num_cols``
        (dynamic sizes for statically padded matrices) are ignored.

    Returns:
      ``col_of_row [R]`` int32 — assigned column per row, -1 where the
      row is unmatched (rectangular case / beyond ``num_rows``).
    """
    r, c = cost.shape
    n = max(r, c)
    num_rows = r if num_rows is None else num_rows
    num_cols = c if num_cols is None else num_cols

    rows_real = jnp.arange(n) < num_rows
    cols_real = jnp.arange(n) < num_cols
    sq = jnp.zeros((n, n), jnp.float32)
    sq = sq.at[:r, :c].set(cost.astype(jnp.float32))
    # real rows must prefer real columns: escaping to a padded column
    # costs a uniform LARGE (so when rows outnumber columns, the set of
    # escapees is exactly the one minimizing the real matched sum,
    # matching scipy's rectangular semantics); padded rows mop up
    # leftover columns for free
    large = jnp.float32(1e6)
    sq = jnp.where(rows_real[:, None] & ~cols_real[None, :], large, sq)
    sq = jnp.where(~rows_real[:, None], 0.0, sq)

    col_of_row = _solve_square(sq)[:r]
    matched = (jnp.arange(r) < num_rows) & (col_of_row < num_cols)
    return jnp.where(matched, col_of_row, -1)
