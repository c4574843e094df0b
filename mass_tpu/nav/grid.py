"""Grid navigation mesh as device masks + BFS distance fields.

TPU-native redesign of the reference's networkx navmesh (reference:
mass/navigation_policy.py:223-486): nodes sit every ``step`` cells of
the occupancy map (offset so the map origin's cell gets a node), an
edge exists when the 1-cell-wide corridor between two adjacent nodes is
fully navigable, and planning is breadth-first search.  Instead of a
host graph object, the mesh is three boolean masks (node alive, edge
right, edge down) living on device; reachability and shortest paths
come from a min-plus BFS relaxation under ``lax.while_loop``; path
extraction backtracks the distance field (host-side, tiny).

Graph surgery: the reference's mesh is monotone (nodes/edges only
ever removed between resets — mass/navigation_policy.py:296-341,
607-648).  Here map-derived state recomputes from the CURRENT
navigable mask on refresh (the EMA occupancy can clear; monotone
meshes swiss-cheese over long multi-room episodes) while
failed-action prunes stay sticky in ``NavGrid.pruned``;
``monotone=True`` restores the reference rule for --reference-compat.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mass_tpu.core.voxelmap import VoxelMap
from mass_tpu.ops.pool import max_pool2d_same

# a numpy scalar, NOT jnp: module-level device ops initialize the
# default backend at import, before any runtime platform selection
INF = np.int32(1 << 28)


@functools.partial(jax.jit, static_argnames=("padding", "z_start",
                                              "z_stop"))
def navigable_area(vm: VoxelMap, padding: int = 3, z_start: int = 0,
                   z_stop: int = 32,
                   obstacle_threshold: float = 0.0,
                   blocked: jax.Array = None) -> jax.Array:
    """[H, W] bool — cells with no occupied voxel in the z slice, eroded
    by ``padding`` cells around obstacles (reference:
    mass/navigation_policy.py:173-221).

    Jitted at this level because the controller calls it EAGERLY once
    per construction (reset_navigation_grid); un-jitted, the cmajor
    occupancy_mask's ``data[:F]`` slice would materialize a ~3 GB slab
    copy at production geometry next to two live semantic slabs
    (the same eager-slab-read OOM class as max_over_depth —
    docs/performance.md)."""
    occ = vm.occupancy_mask(z_start, z_stop, obstacle_threshold)
    if blocked is not None:
        # collision evidence (nav/controller.failed_action): obstacles
        # the frozen nav map cannot see (phase-two movers, unmapped
        # walls) erode exactly like mapped ones
        occ = occ | blocked
    if padding > 0:
        occ = max_pool2d_same(occ, padding)
    return ~occ


def _box_sum(x: jax.Array, r: int) -> jax.Array:
    """(2r+1)^2 sliding-window sum with zero padding, via the integral
    image (two cumsums) — O(H*W) regardless of the window size."""
    k = 2 * r + 1
    c = jnp.cumsum(jnp.cumsum(
        jnp.pad(x, ((r + 1, r), (r + 1, r))), axis=0), axis=1)
    return c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]


@functools.partial(jax.jit, static_argnames=("radius_cells", "padding",
                                             "z_start", "z_stop"))
def frontier_mass(vm: VoxelMap, radius_cells: int, padding: int = 3,
                  z_start: int = 0, z_stop: int = 32,
                  obstacle_threshold: float = 0.0,
                  blocked: jax.Array = None) -> jax.Array:
    """[H, W] float — the number of FRONTIER cells within a
    ``radius_cells`` Chebyshev window of each map cell.

    Frontier = unobserved cells bordering observed navigable space (the
    classic exploration-frontier definition).  Unknown space behind
    walls does NOT count — its border cells are obstacles, not free —
    so out-of-scene map area and sealed rooms score zero while doorways
    into unexplored rooms score high.  Beyond the reference: its goal
    heads are uniform-random / GT / a learned CNN
    (agent.py:389-425, 744-770); this is the oracle-free directed-
    exploration head the same top-down maps support.
    """
    observed = vm.max_over_depth().max(-1) > 0          # any splat
    nav = navigable_area(vm, padding, z_start, z_stop,
                         obstacle_threshold, blocked=blocked)
    free = observed & nav
    near_free = (free
                 | jnp.pad(free[1:], ((0, 1), (0, 0)))
                 | jnp.pad(free[:-1], ((1, 0), (0, 0)))
                 | jnp.pad(free[:, 1:], ((0, 0), (0, 1)))
                 | jnp.pad(free[:, :-1], ((0, 0), (1, 0))))
    frontier = (~observed) & near_free
    return _box_sum(frontier.astype(jnp.float32), radius_cells)


class NavGrid(NamedTuple):
    """Navigation mesh state (all device arrays).

    Node ``(i, j)`` sits at map cell ``(y, x) = (off_y + i*step,
    off_x + j*step)``.  ``edge_right[i, j]`` connects nodes (i, j) and
    (i, j+1); ``edge_down[i, j]`` connects (i, j) and (i+1, j).
    """

    alive: jax.Array       # [ny, nx] bool
    edge_right: jax.Array  # [ny, nx] bool
    edge_down: jax.Array   # [ny, nx] bool
    off_x: jax.Array       # scalar int32
    off_y: jax.Array       # scalar int32
    # failed-action prunes: STICKY node removals (a node the simulator
    # refused to enter stays dead), unlike map-derived removals which
    # recompute per refresh — see refresh_nav_grid
    pruned: jax.Array      # [ny, nx] bool


def _node_cells(nav_h: int, nav_w: int, ny: int, nx: int, off_x, off_y,
                step: int):
    ys = off_y + jnp.arange(ny, dtype=jnp.int32) * step
    xs = off_x + jnp.arange(nx, dtype=jnp.int32) * step
    in_bounds = (ys[:, None] < nav_h) & (xs[None, :] < nav_w)
    return ys, xs, in_bounds


def _corridor_masks(navigable: jax.Array, ys, xs, in_bounds, step: int):
    """Edge masks: the (step+1)-cell corridor between adjacent nodes must
    be fully navigable (reference checks the spanned rectangle,
    mass/navigation_policy.py:282-294)."""
    nav = navigable.astype(jnp.float32)
    h, w = navigable.shape
    # window-all tests via cumulative sums
    cs_x = jnp.cumsum(nav, axis=1)
    cs_x = jnp.concatenate([jnp.zeros((h, 1)), cs_x], axis=1)
    cs_y = jnp.cumsum(nav, axis=0)
    cs_y = jnp.concatenate([jnp.zeros((1, w)), cs_y], axis=0)

    def window_all_x(y_idx, x_idx):  # [ny], [nx] -> [ny, nx]
        x0 = x_idx[None, :]
        hi = jnp.clip(x0 + step + 1, 0, w)
        lo = jnp.clip(x0, 0, w)
        length = (hi - lo).astype(jnp.float32)
        total = cs_x[y_idx[:, None], hi] - cs_x[y_idx[:, None], lo]
        return total >= length - 0.5

    def window_all_y(y_idx, x_idx):
        y0 = y_idx[:, None]
        hi = jnp.clip(y0 + step + 1, 0, h)
        lo = jnp.clip(y0, 0, h)
        length = (hi - lo).astype(jnp.float32)
        total = cs_y[hi, x_idx[None, :]] - cs_y[lo, x_idx[None, :]]
        return total >= length - 0.5

    ny, nx = ys.shape[0], xs.shape[0]
    right_ok = window_all_x(jnp.clip(ys, 0, h - 1), xs)
    down_ok = window_all_y(ys, jnp.clip(xs, 0, w - 1))
    has_right = in_bounds & jnp.roll(in_bounds, -1, axis=1)
    has_right = has_right.at[:, nx - 1].set(False)
    has_down = in_bounds & jnp.roll(in_bounds, -1, axis=0)
    has_down = has_down.at[ny - 1, :].set(False)
    return right_ok & has_right, down_ok & has_down


def grid_shape(map_height: int, map_width: int,
               step: int) -> Tuple[int, int]:
    return (map_height + step - 1) // step, \
        (map_width + step - 1) // step


@functools.partial(jax.jit, static_argnames=("step",))
def build_nav_grid(navigable: jax.Array, off_x, off_y,
                   step: int = 5) -> NavGrid:
    """Fresh mesh from a navigable-area mask (reference
    reset_navigation_graph, mass/navigation_policy.py:223-294).

    Reference parity note: the reference only instantiates nodes that
    have at least one clear corridor; isolated nodes simply become
    unreachable here, which is equivalent for planning.
    """
    h, w = navigable.shape
    ny, nx = grid_shape(h, w, step)
    ys, xs, in_bounds = _node_cells(h, w, ny, nx, off_x, off_y, step)
    er, ed = _corridor_masks(navigable, ys, xs, in_bounds, step)
    return NavGrid(alive=in_bounds, edge_right=er, edge_down=ed,
                   off_x=jnp.asarray(off_x, jnp.int32),
                   off_y=jnp.asarray(off_y, jnp.int32),
                   pruned=jnp.zeros_like(in_bounds))


@functools.partial(jax.jit, static_argnames=("step", "monotone"))
def refresh_nav_grid(grid: NavGrid, navigable: jax.Array,
                     step: int = 5, monotone: bool = False) -> NavGrid:
    """Refresh the mesh from the CURRENT navigable mask.

    Default: map-derived state (node cells, corridors) recomputes fresh
    each refresh — the EMA occupancy can legitimately CLEAR (an object
    was picked up, a phantom obstacle decayed), and long multi-room
    episodes otherwise swiss-cheese the mesh until doors seal (measured
    in the round-4 multi-room sweeps).  Only failed-action prunes stay
    sticky (``grid.pruned``).

    ``monotone=True`` keeps the reference's rule instead — nodes/edges
    only ever removed (reference update_navigation_graph,
    mass/navigation_policy.py:296-341; used by --reference-compat)."""
    h, w = navigable.shape
    ny, nx = grid.alive.shape
    ys, xs, in_bounds = _node_cells(h, w, ny, nx, grid.off_x,
                                    grid.off_y, step)
    node_ok = navigable[jnp.clip(ys[:, None], 0, h - 1),
                        jnp.clip(xs[None, :], 0, w - 1)] & in_bounds
    er, ed = _corridor_masks(navigable, ys, xs, in_bounds, step)
    if monotone:
        return grid._replace(alive=grid.alive & node_ok,
                             edge_right=grid.edge_right & er,
                             edge_down=grid.edge_down & ed)
    return grid._replace(alive=node_ok & ~grid.pruned,
                         edge_right=er, edge_down=ed)


@jax.jit
def distance_field_from_seeds(grid: NavGrid,
                              seeds: jax.Array) -> jax.Array:
    """BFS hop distances from a seed node set over alive nodes and
    intact edges; INF where unreachable.  Multiple seeds make planning
    robust when the agent's own node has been pruned/isolated (e.g.
    standing inside an obstacle's padding while manipulating it)."""
    ny, nx = grid.alive.shape
    alive = grid.alive
    er = grid.edge_right & alive & jnp.roll(alive, -1, axis=1)
    ed = grid.edge_down & alive & jnp.roll(alive, -1, axis=0)
    # loop-invariant shifted edge masks, hoisted out of the relaxation
    # (each while_loop op costs fixed dispatch overhead on CPU hosts)
    er_l = jnp.roll(er, 1, axis=1).at[:, 0].set(False)
    ed_u = jnp.roll(ed, 1, axis=0).at[0, :].set(False)

    start = jnp.where(seeds & alive, 0, INF).astype(jnp.int32)

    def relax(dist):
        from_left = jnp.where(er_l, jnp.roll(dist, 1, axis=1) + 1, INF)
        from_right = jnp.where(er, jnp.roll(dist, -1, axis=1) + 1, INF)
        from_up = jnp.where(ed_u, jnp.roll(dist, 1, axis=0) + 1, INF)
        from_down = jnp.where(ed, jnp.roll(dist, -1, axis=0) + 1, INF)
        best = jnp.minimum(jnp.minimum(from_left, from_right),
                           jnp.minimum(from_up, from_down))
        return jnp.where(alive, jnp.minimum(dist, best), INF)

    def cond(state):
        dist, changed = state
        return changed

    def body(state):
        dist, _ = state
        # several hops per convergence check: while_loop iterations pay
        # fixed per-step overhead (dominant on CPU hosts; the same
        # batching sped the map-diff labeller 8.6x) and relaxation is
        # monotone, so extra hops past the fixpoint are no-ops
        new = dist
        for _ in range(8):
            new = relax(new)
        return new, jnp.any(new != dist)

    dist, _ = jax.lax.while_loop(cond, body,
                                 (relax(start), jnp.asarray(True)))
    return dist


@jax.jit
def distance_field(grid: NavGrid, src_j, src_i) -> jax.Array:
    """BFS hop distances from one node (src_j, src_i)."""
    ny, nx = grid.alive.shape
    seeds = jnp.zeros((ny, nx), jnp.bool_).at[src_i, src_j].set(True)
    return distance_field_from_seeds(grid, seeds)


@functools.partial(jax.jit, static_argnames=(
    "step", "padding", "z_start", "z_stop", "refresh", "monotone"))
def plan(grid: NavGrid, occ_vm, agent_world, goal_world, *, step: int,
         padding: int, z_start: int, z_stop: int, threshold: float,
         refresh: bool, monotone: bool = False, blocked=None):
    """One-dispatch planning step: (optionally) refresh the mesh from
    the occupancy map, seed a BFS around the agent (with a nearest-node
    fallback if its neighborhood was pruned), and snap the goal to the
    nearest reachable node.

    Returns ``(grid, dist, target_ji, agent_cell, goal_cell)``.  Fusing
    these keeps the live agent loop at ~2 host-device round trips per
    simulator step instead of ~6.
    """
    if refresh:
        nav = navigable_area(occ_vm, padding, z_start, z_stop,
                             threshold, blocked=blocked)
        grid = refresh_nav_grid(grid, nav, step=step,
                                monotone=monotone)
    agent_cell = occ_vm.world_to_map(agent_world[:2])
    goal_cell = occ_vm.world_to_map(goal_world[:2])
    seeds = seeds_near_cell(grid, agent_cell, step, radius_cells=2 * step)
    src = nearest_node(grid, jnp.zeros(grid.alive.shape, jnp.int32),
                       agent_cell, step, reachable_only=False)
    fallback = jnp.zeros(grid.alive.shape, jnp.bool_).at[
        src[1], src[0]].set(True)
    seeds = jnp.where(jnp.any(seeds), seeds, fallback)
    dist = distance_field_from_seeds(grid, seeds)
    tgt = nearest_node(grid, dist, goal_cell, step, reachable_only=True)
    return grid, dist, tgt, agent_cell, goal_cell


@functools.partial(jax.jit, static_argnames=(
    "step", "padding", "z_start", "z_stop", "refresh"))
def plan_batch(grids: NavGrid, occ_vms, agent_worlds, goal_worlds, *,
               step: int, padding: int, z_start: int, z_stop: int,
               threshold: float, refresh: bool):
    """Fleet planning: :func:`plan` vmapped over a batch of episodes —
    ONE dispatch plans every episode of an evaluation fleet
    (parallel/fleet.py pairs with this; the BFS ``while_loop`` runs
    until the slowest episode converges).

    Args are the per-episode pytrees stacked on a leading ``[B]`` axis:
    ``grids`` a NavGrid of ``[B, ny, nx]`` masks (+ ``[B]`` offsets),
    ``occ_vms`` a VoxelMap with ``[B, ...]`` data/bins and shared
    static geometry, ``agent_worlds`` / ``goal_worlds`` ``[B, 3]``.
    Returns the same tuple as :func:`plan`, batch-stacked.
    """
    def one(grid, vm, agent, goal):
        return plan(grid, vm, agent, goal, step=step, padding=padding,
                    z_start=z_start, z_stop=z_stop, threshold=threshold,
                    refresh=refresh)

    return jax.vmap(one)(grids, occ_vms, agent_worlds, goal_worlds)


@functools.partial(jax.jit, static_argnames=("step", "radius_cells"))
def seeds_near_cell(grid: NavGrid, cell_xy, step: int,
                    radius_cells: int) -> jax.Array:
    """Alive nodes within a Chebyshev map-cell radius of (x, y)."""
    ny, nx = grid.alive.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    node_x = grid.off_x + jj * step
    node_y = grid.off_y + ii * step
    near = (jnp.abs(node_x - cell_xy[0]) <= radius_cells) & \
           (jnp.abs(node_y - cell_xy[1]) <= radius_cells)
    return near & grid.alive


@functools.partial(jax.jit, static_argnames=("step", "reachable_only"))
def nearest_node(grid: NavGrid, dist: jax.Array, cell_xy, step: int,
                 reachable_only: bool = True) -> jax.Array:
    """Index (j, i) of the nearest (euclidean, in map cells) node to map
    cell (x, y), restricted to BFS-reachable nodes when asked
    (reference navigable_points + argmin, mass/navigation_policy.py:
    343-387, 454-467)."""
    ny, nx = grid.alive.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    node_x = grid.off_x + jj * step
    node_y = grid.off_y + ii * step
    d2 = ((node_x - cell_xy[0]) ** 2 +
          (node_y - cell_xy[1]) ** 2).astype(jnp.float32)
    ok = grid.alive & ((dist < INF) if reachable_only else True)
    d2 = jnp.where(ok, d2, jnp.inf)
    k = jnp.argmin(d2.reshape(-1))
    return jnp.stack([k % nx, k // nx]).astype(jnp.int32)


def extract_path(grid: NavGrid, dist: np.ndarray, target_ji,
                 step: int) -> np.ndarray:
    """Backtrack a shortest node path target -> source from a BFS
    distance field (host-side; paths are tens of nodes).  Returns
    ``[L, 2]`` (x, y) map-cell coordinates source-first."""
    er = np.asarray(grid.edge_right)
    ed = np.asarray(grid.edge_down)
    off_x = int(grid.off_x)
    off_y = int(grid.off_y)
    j, i = int(target_ji[0]), int(target_ji[1])
    ny, nx = dist.shape
    if dist[i, j] >= int(INF):
        return np.zeros((0, 2), np.int32)
    path = [(j, i)]
    while dist[i, j] > 0:
        d = dist[i, j]
        moved = False
        for (dj, di, ok) in (
                (-1, 0, j > 0 and er[i, j - 1]),
                (1, 0, j < nx - 1 and er[i, j]),
                (0, -1, i > 0 and ed[i - 1, j]),
                (0, 1, i < ny - 1 and ed[i, j])):
            if ok and dist[i + di, j + dj] == d - 1:
                j, i = j + dj, i + di
                path.append((j, i))
                moved = True
                break
        if not moved:  # defensive: inconsistent field
            break
    path.reverse()
    cells = np.asarray(
        [(off_x + j * step, off_y + i * step) for j, i in path],
        np.int32)
    return cells
