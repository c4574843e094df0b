"""Navigation mesh + planner tests on synthetic occupancy."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mass_tpu.config import MapGeometry
from mass_tpu.core.voxelmap import VoxelMap
from mass_tpu.nav import grid as NG


def _grid_from_navigable(nav, step=2, off=(0, 0)):
    return NG.build_nav_grid(jnp.asarray(nav), off[0], off[1], step=step)


def test_open_room_all_connected():
    nav = np.ones((11, 11), bool)
    g = _grid_from_navigable(nav, step=2)
    dist = np.asarray(NG.distance_field(g, jnp.int32(0), jnp.int32(0)))
    ny, nx = np.asarray(g.alive).shape
    assert (dist < int(NG.INF)).all()
    # manhattan hops from node (0,0)
    assert dist[3, 4] == 7
    assert dist[ny - 1, nx - 1] == (ny - 1) + (nx - 1)


def test_wall_blocks_and_door_connects():
    nav = np.ones((11, 11), bool)
    nav[:, 5] = False          # full wall across column 5
    g = _grid_from_navigable(nav, step=2)
    dist = np.asarray(NG.distance_field(g, jnp.int32(0), jnp.int32(0)))
    # right side unreachable
    assert (dist[:, 3:] >= int(NG.INF)).all()

    nav[8, 5] = True           # door at row 8 (a node row: 8 = 4*2)
    g2 = _grid_from_navigable(nav, step=2)
    dist2 = np.asarray(NG.distance_field(g2, jnp.int32(0),
                                         jnp.int32(0)))
    assert dist2[0, 5] < int(NG.INF)
    # path must route through the door row
    path = NG.extract_path(g2, dist2, (5, 0), step=2)
    assert path.shape[0] == dist2[0, 5] + 1
    xs, ys = path[:, 0], path[:, 1]
    crossing = ys[np.nonzero(np.diff(xs // 2 >= 3).astype(int))[0]]
    assert (crossing == 8).all()


def test_refresh_removes_blocked_nodes():
    nav = np.ones((11, 11), bool)
    g = _grid_from_navigable(nav, step=2)
    nav[4, 4] = False   # node (2,2) cell becomes blocked
    g2 = NG.refresh_nav_grid(g, jnp.asarray(nav), step=2)
    assert not bool(g2.alive[2, 2])
    dist = np.asarray(NG.distance_field(g2, jnp.int32(0), jnp.int32(0)))
    assert dist[2, 2] >= int(NG.INF)
    # others still reachable (detour around)
    assert dist[2, 3] < int(NG.INF)


def test_offset_grid_nodes():
    nav = np.ones((12, 12), bool)
    g = NG.build_nav_grid(jnp.asarray(nav), 1, 2, step=3)
    dist = np.asarray(NG.distance_field(g, jnp.int32(0), jnp.int32(0)))
    path = NG.extract_path(g, dist, (2, 1), step=3)
    # cells respect the offsets: x = 1 + 3j, y = 2 + 3i
    assert ((path[:, 0] - 1) % 3 == 0).all()
    assert ((path[:, 1] - 2) % 3 == 0).all()


def _vm_from_grid(grid):
    h, w, d, f = grid.shape
    g = MapGeometry(map_height=h, map_width=w, map_depth=d,
                    feature_size=f, grid_resolution=0.25)
    vm = VoxelMap.create(g)
    return dataclasses.replace(
        vm, data=jnp.asarray(grid.reshape(h * w * d, f)))


def test_frontier_mass_concentrates_at_doorway():
    grid = np.zeros((16, 16, 4, 1), np.float32)
    grid[:, :8, 0, 0] = 1.0        # left half observed (floor voxel)
    grid[:12, 8, 1, 0] = 1.0       # wall at x=8 with a door at rows 12+
    vm = _vm_from_grid(grid)
    mass = np.asarray(NG.frontier_mass(vm, 2, padding=0,
                                       z_start=1, z_stop=4))
    assert mass.shape == (16, 16)
    # the only frontier cells are the unobserved doorway column (x=8,
    # rows 12-15): positive mass only within the radius-2 window there
    pos = mass > 0
    assert pos[12:, 7].all() and pos[12:, 9].all()
    # sealed space behind the wall does NOT count as frontier
    assert not pos[:8, 10:].any()
    # nor does the observed interior far from the doorway
    assert not pos[:8, :6].any()


def test_frontier_mass_zero_when_fully_explored():
    grid = np.zeros((16, 16, 4, 1), np.float32)
    grid[:, :, 0, 0] = 1.0         # everything observed free
    vm = _vm_from_grid(grid)
    mass = np.asarray(NG.frontier_mass(vm, 3, padding=0,
                                       z_start=1, z_stop=4))
    assert (mass == 0).all()


def test_frontier_box_sum_matches_naive():
    rng = np.random.RandomState(0)
    x = rng.rand(13, 17).astype(np.float32)
    for r in (1, 2, 4):
        got = np.asarray(NG._box_sum(jnp.asarray(x), r))
        k = 2 * r + 1
        pad = np.pad(x, r)
        want = np.zeros_like(x)
        for i in range(x.shape[0]):
            for j in range(x.shape[1]):
                want[i, j] = pad[i:i + k, j:j + k].sum()
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_nearest_node_reachability_filter():
    nav = np.ones((11, 11), bool)
    nav[:, 5] = False
    g = _grid_from_navigable(nav, step=2)
    dist = NG.distance_field(g, jnp.int32(0), jnp.int32(0))
    # target cell on the unreachable side snaps to a reachable node
    tgt = NG.nearest_node(g, dist, jnp.asarray([10, 4]), 2,
                          reachable_only=True)
    assert int(tgt[0]) <= 2  # stays on the left of the wall
