"""Point-goal navigation controller over the voxel maps.

Host-side orchestration mirroring the reference NavigationPolicy
(reference: mass/navigation_policy.py): per step it folds the latest
RGB-D observation into the selected voxel maps (jitted device work),
plans on the nav grid (device BFS + host backtrack), and emits discrete
actions from a deterministic heading rule.  Failed simulator actions
prune the nav grid and trigger replanning.

Pose conventions (reference: mass/navigation_policy.py:78-132): world =
(x, z_sim, y_sim - crouch offset); yaw = pi/2 - rotation; elevation =
-horizon; a crouching agent's camera sits 0.675 m lower.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mass_tpu.config import NavConfig
from mass_tpu.core.voxelmap import HostMapToWorld
from mass_tpu.env.protocol import Task
from mass_tpu.nav import grid as NG
from mass_tpu.utils.profiling import StageTimer

CROUCH_HEIGHT_OFFSET = 0.675


class NavigationController:
    """Wraps a task + named voxel maps; provides ``navigate_to``.

    ``maps`` values are objects exposing ``update_from_observation(obs)``
    and the VoxelMap read API (see mass_tpu.maps); ``navigation_map``
    names the occupancy entry used for traversability.
    """

    def __init__(self, task: Task, navigation_map: str,
                 maps: Dict[str, object], config: NavConfig = NavConfig(),
                 rng: Optional[np.random.RandomState] = None,
                 timer: Optional[StageTimer] = None):
        self.task = task
        self.maps = maps
        self.navigation_map = navigation_map
        self.config = config
        self.rng = rng or np.random.RandomState(0)
        self.timer = timer or StageTimer()
        self.nav_grid: Optional[NG.NavGrid] = None
        # collision-evidence overlay [H, W]: cells the simulator proved
        # blocked (failed moves).  Obstacles that only exist in the
        # LIVE world are invisible to the frozen phase-one nav map —
        # node pruning encoded that evidence in the reference
        # (mass/navigation_policy.py:607-648) but permanently seals
        # doorways at multi-room scale; cell evidence erodes like any
        # mapped obstacle and keeps the rest of the mesh intact
        self.blocked_cells: Optional[np.ndarray] = None
        # host map->world for per-step path backtracking: the jnp
        # version recompiles per path length (core/voxelmap.py)
        self._map_to_world = HostMapToWorld()
        # rotation-oscillation breaker state (see decide_from_plan)
        self._last_rot = 0
        self._last_rot_pos = None
        self._nodes_cache = None   # navigable_node_cells memo
        self.reset_navigation_grid()

    # ------------------------------------------------------------ pose

    def process_position(self) -> np.ndarray:
        loc = self.task.agent_location()
        dy = 0.0 if loc.standing else CROUCH_HEIGHT_OFFSET
        return np.asarray([loc.x, loc.z, loc.y - dy], np.float32)

    def process_yaw(self) -> float:
        loc = self.task.agent_location()
        return float(np.pi / 2 - np.radians(loc.rotation_degrees))

    def process_elevation(self) -> float:
        return float(-np.radians(self.task.agent_location()
                                 .horizon_degrees))

    def process_observations(self, observations: Dict,
                             update_map: Union[str, List[str], None]
                             = None) -> None:
        """Attach pose (with optional Gaussian noise, reference:
        mass/navigation_policy.py:157-161) and fold the frame into the
        selected maps."""
        observations["position"] = (
            self.process_position() +
            self.rng.normal() * self.config.position_noise_std)
        observations["yaw"] = (
            self.process_yaw() +
            self.rng.normal() * self.config.rotation_noise_std)
        observations["elevation"] = self.process_elevation()
        if update_map is None:
            return
        names = [update_map] if isinstance(update_map, str) else \
            update_map
        with self.timer.stage("mapping"):
            if hasattr(self.maps, "update_group"):
                # all of this step's map updates in one device dispatch
                self.maps.update_group(names, observations)
            else:
                for name in names:
                    self.maps[name].update_from_observation(observations)

    # ------------------------------------------------------------ mesh

    def _occupancy_vm(self):
        return self.maps[self.navigation_map].voxel_map

    def _bins_epoch(self):
        """Reset generation of the nav map's bins: lets the host
        map->world cache validate without per-step device reads (jitted
        updates hand back fresh bins objects every step, so identity
        keying alone refetches per step)."""
        return getattr(self.maps[self.navigation_map], "bins_epoch",
                       None)

    def _navigable(self):
        cfg = self.config
        return NG.navigable_area(
            self._occupancy_vm(), padding=cfg.obstacle_padding,
            z_start=cfg.map_slice_start, z_stop=cfg.map_slice_stop,
            obstacle_threshold=cfg.obstacle_threshold,
            blocked=self._blocked_operand())

    def _blocked_operand(self):
        return (None if self.blocked_cells is None
                else jnp.asarray(self.blocked_cells))

    def _origin_offsets(self):
        vm = self._occupancy_vm()
        g = vm.geometry
        # cell of the map origin, so the start location owns a node
        # (reference: mass/navigation_policy.py:259-271)
        origin_x = (vm.bins_x[0] + vm.bins_x[-1]) / 2 + \
            g.grid_resolution / 2
        origin_y = (vm.bins_y[0] + vm.bins_y[-1]) / 2 + \
            g.grid_resolution / 2
        cell = np.asarray(vm.world_to_map(
            jnp.asarray([origin_x, origin_y])))
        s = self.config.step_size
        return int(cell[0]) % s, int(cell[1]) % s

    def reset_navigation_grid(self) -> None:
        self.blocked_cells = None      # fresh scene, fresh evidence
        off_x, off_y = self._origin_offsets()
        self.nav_grid = NG.build_nav_grid(
            self._navigable(), off_x, off_y, step=self.config.step_size)

    def update_navigation_grid(self) -> None:
        self.nav_grid = NG.refresh_nav_grid(
            self.nav_grid, self._navigable(),
            step=self.config.step_size,
            monotone=self.config.reference_compat)

    # -------------------------------------------------------- planning

    def _cell_of_world(self, world_xy) -> np.ndarray:
        return np.asarray(self._occupancy_vm().world_to_map(
            jnp.asarray(world_xy, jnp.float32)[..., :2]))

    def _source_field(self, position) -> tuple:
        """BFS field seeded from all alive nodes near the agent — robust
        when the agent's own node was pruned or isolated (it routinely
        stands inside an obstacle's padded zone while manipulating)."""
        cell = self._cell_of_world(position)
        s = self.config.step_size
        seeds = NG.seeds_near_cell(self.nav_grid, jnp.asarray(cell), s,
                                   radius_cells=2 * s)
        src = NG.nearest_node(
            self.nav_grid,
            jnp.zeros(self.nav_grid.alive.shape, jnp.int32),
            jnp.asarray(cell), s, reachable_only=False)
        if not bool(seeds.any()):
            seeds = jnp.zeros(self.nav_grid.alive.shape,
                              jnp.bool_).at[src[1], src[0]].set(True)
        dist = NG.distance_field_from_seeds(self.nav_grid, seeds)
        return src, dist

    def _path_from_field(self, dist: np.ndarray, tgt: np.ndarray,
                         src_cell: np.ndarray,
                         grid: Optional[NG.NavGrid] = None) -> np.ndarray:
        """Host backtrack of a planned field into world waypoints, with
        the true source cell prepended when it is off-node (reference:
        mass/navigation_policy.py:480-483).  ``grid`` may carry
        pre-fetched host (numpy) leaves to avoid per-leaf device reads."""
        vm = self._occupancy_vm()
        cells = NG.extract_path(grid if grid is not None
                                else self.nav_grid, dist, tgt,
                                self.config.step_size)
        if cells.shape[0] == 0:
            cells = np.asarray(src_cell, np.int32)[None]
        if not np.array_equal(cells[0], src_cell):
            cells = np.concatenate(
                [np.asarray(src_cell, np.int32)[None], cells], axis=0)
        cells3 = np.concatenate(
            [cells, np.zeros((cells.shape[0], 1), cells.dtype)], axis=1)
        return self._map_to_world(vm, cells3, epoch=self._bins_epoch())

    def shortest_path(self, source_world, target_world) -> np.ndarray:
        """World-coordinate waypoint path source -> target (reference:
        mass/navigation_policy.py:427-486): source snaps to its nearest
        node, target to the nearest *reachable* node; the true source
        position is prepended when it differs from its node."""
        cfg = self.config
        grid, dist, tgt, agent_cell, _ = NG.plan(
            self.nav_grid, self._occupancy_vm(),
            jnp.asarray(source_world, jnp.float32),
            jnp.asarray(target_world, jnp.float32),
            step=cfg.step_size, padding=cfg.obstacle_padding,
            z_start=cfg.map_slice_start, z_stop=cfg.map_slice_stop,
            threshold=cfg.obstacle_threshold, refresh=False,
            monotone=cfg.reference_compat)
        return self._path_from_field(np.asarray(dist), np.asarray(tgt),
                                     np.asarray(agent_cell))

    def navigable_node_cells(
            self, position, with_dist: bool = False
    ) -> Union[np.ndarray, Tuple[np.ndarray, np.ndarray]]:
        """Map cells of all nodes reachable from ``position``; with
        ``with_dist`` also their BFS hop counts from the agent.

        Memoized on (position, nav-grid identity): _next_goal draws
        the rng-parity uniform sample and THEN the frontier/revisit
        pick from the same pose and grid, and each BFS source-field
        is a device dispatch (30-130 ms on the TPU tunnel) — the
        cache halves that.  The grid objects are replaced (fresh
        NamedTuple / array) on every refresh and collision update, so
        identity keying cannot go stale."""
        pos = np.asarray(position, np.float32)
        key = (pos.tobytes(), id(self.nav_grid),
               id(self.blocked_cells))
        if self._nodes_cache is not None and \
                self._nodes_cache[0] == key:
            cells, hops = self._nodes_cache[1]
        else:
            _, dist = self._source_field(pos)
            dist = np.asarray(dist)
            alive = np.asarray(self.nav_grid.alive)
            ii, jj = np.nonzero((dist < int(NG.INF)) & alive)
            s = self.config.step_size
            xs = int(self.nav_grid.off_x) + jj * s
            ys = int(self.nav_grid.off_y) + ii * s
            cells = np.stack([xs, ys], axis=-1)
            hops = dist[ii, jj]
            self._nodes_cache = (key, (cells, hops))
        return (cells, hops) if with_dist else cells

    def observed_cell_count(self, map_name: Optional[str] = None) -> int:
        """Number of map cells with any splat — end-of-episode
        exploration coverage (comparable across matched seeds; the
        exploration-head experiments' mechanism metric).  Defaults to
        the nav map; pass a layer name to attribute coverage per
        phase (two-phase drivers: semantic0 = walkthrough coverage,
        semantic1 = unshuffle coverage).  Rides the fused
        max_over_depth, so no eager slab materializes."""
        vm = (self._occupancy_vm() if map_name is None
              else self.maps[map_name].voxel_map)
        return int(np.asarray(
            (vm.max_over_depth().max(-1) > 0).sum()))

    def sample_navigation_goal(self, observations: Dict) -> np.ndarray:
        """Uniform random reachable node, as a world point (reference:
        mass/navigation_policy.py:389-425)."""
        if "position" not in observations:
            observations["position"] = self.process_position()
        nodes = self.navigable_node_cells(observations["position"])
        pick = nodes[self.rng.randint(nodes.shape[0])]
        cell3 = np.asarray([pick[0], pick[1], 0], np.float32)
        return self._map_to_world(self._occupancy_vm(), cell3,
                                  epoch=self._bins_epoch())

    def frontier_navigation_goal(self, observations: Dict,
                                 radius_m: float = 1.0) -> np.ndarray:
        """Directed exploration without an oracle or learning:
        FARTHEST-frontier — of the reachable nodes with any frontier
        cells (unknown space bordering observed free space,
        nav/grid.frontier_mass) within ``radius_m``, the one with the
        largest BFS hop count from the agent, ties broken uniformly.
        Falls back to the uniform random node when the map has no
        frontier left.

        Farthest (not greatest-mass) is load-bearing under the
        goal-counted exploration budget: frontier nodes sit at the
        boundary of KNOWN space, so the mass argmax is typically a
        short hop that burns a whole budget slot, while this planner
        treats unknown cells as navigable-until-observed and a far
        goal sweeps the intervening scene (measured: greedy-mass lost
        19.5 pts of found rate to random on multi-room scenes,
        p = 0.0014; docs/experiments.md).  Beyond the reference (its
        goal heads
        are random / GT / a learned CNN, agent.py:389-425, 744-770);
        drawn through the same rng stream so enabling it keeps
        matched-seed arms comparable."""
        if "position" not in observations:
            observations["position"] = self.process_position()
        nodes, hops = self.navigable_node_cells(
            observations["position"], with_dist=True)
        cfg = self.config
        res = self._occupancy_vm().geometry.grid_resolution
        radius = max(1, int(round(radius_m / res)))
        # padding=0: erosion is a path-planning safety margin, not an
        # observability concept — with it, a sparsely-observed map's
        # thin free strips (e.g. the first look-down frame's floor
        # sliver before a wall) erode to nothing and no frontier exists
        mass = np.asarray(NG.frontier_mass(
            self._occupancy_vm(), radius, padding=0,
            z_start=cfg.map_slice_start, z_stop=cfg.map_slice_stop,
            obstacle_threshold=cfg.obstacle_threshold,
            blocked=self._blocked_operand()))
        scores = mass[nodes[:, 1], nodes[:, 0]]
        cand = np.flatnonzero(scores > 0)
        if cand.size == 0:                 # fully explored: uniform
            pick = nodes[self.rng.randint(nodes.shape[0])]
        else:
            far = hops[cand].max()
            ties = cand[hops[cand] >= far]
            pick = nodes[ties[self.rng.randint(ties.shape[0])]]
        cell3 = np.asarray([pick[0], pick[1], 0], np.float32)
        return self._map_to_world(self._occupancy_vm(), cell3,
                                  epoch=self._bins_epoch())

    # ------------------------------------------------------ local policy

    @staticmethod
    def get_heading(observations: Dict, goal: np.ndarray) -> float:
        """Egocentric yaw toward ``goal``, wrapped to [-pi, pi]
        (reference: mass/navigation_policy.py:488-520)."""
        direction = np.asarray(goal)[:2] - \
            np.asarray(observations["position"])[:2]
        yaw = float(np.arctan2(direction[1], direction[0]) -
                    observations["yaw"])
        if abs(yaw) > np.pi:
            yaw = -np.sign(yaw) * (2 * np.pi - abs(yaw))
        return yaw

    def get_action(self, observations: Dict, goal,
                   update_map=None,
                   update_navigation_grid: bool = True) -> Optional[int]:
        """Plan + heading rule -> move_ahead / rotate_left /
        rotate_right / None-at-goal (reference:
        mass/navigation_policy.py:522-605)."""
        self.process_observations(observations, update_map=update_map)

        goal = np.asarray(goal, np.float32)
        cfg = self.config
        with self.timer.stage("planning"):
            # one fused device dispatch: mesh refresh + seeded BFS +
            # snaps
            plan_out = NG.plan(
                self.nav_grid, self._occupancy_vm(),
                jnp.asarray(observations["position"], jnp.float32),
                jnp.asarray(goal, jnp.float32),
                step=cfg.step_size, padding=cfg.obstacle_padding,
                z_start=cfg.map_slice_start, z_stop=cfg.map_slice_stop,
                threshold=cfg.obstacle_threshold,
                refresh=bool(update_navigation_grid),
                monotone=cfg.reference_compat,
                blocked=(self._blocked_operand()
                         if update_navigation_grid else None))
        return self.decide_from_plan(observations, goal, plan_out)

    def decide_from_plan(self, observations: Dict, goal,
                         plan_out) -> Optional[int]:
        """The post-planning half of :meth:`get_action`: adopt the
        planned mesh, backtrack the field into a path, apply the
        heading rule.  Split out so fleet evaluators can compute every
        episode's plan in ONE dispatch (nav/grid.plan_batch) and feed
        the results here per episode."""
        goal = np.asarray(goal, np.float32)
        cfg = self.config
        grid, dist, tgt, agent_cell, _ = plan_out
        with self.timer.stage("planning"):
            self.nav_grid = grid
            # ONE batched host read for everything the backtrack needs
            # (dist/tgt/agent + mesh edges/offsets): device_get issues
            # all copies asynchronously, so a remote backend pays one
            # round trip, not seven
            dist_h, tgt_h, agent_h, er, ed, ox, oy = jax.device_get(
                (dist, tgt, agent_cell, grid.edge_right,
                 grid.edge_down, grid.off_x, grid.off_y))
            host_grid = NG.NavGrid(alive=grid.alive, edge_right=er,
                                   edge_down=ed, off_x=ox, off_y=oy,
                                   pruned=grid.pruned)
            path = self._path_from_field(dist_h, tgt_h, agent_h,
                                         grid=host_grid)
        observations["path"] = path

        if cfg.reference_compat:
            # reference termination: the planned path has collapsed to
            # the source node (mass/navigation_policy.py:594-605)
            if path.shape[0] <= 1:
                observations["heading"] = 0.0
                return None
            heading = self.get_heading(observations, path[1])
            observations["heading"] = heading
            names = self.task.action_names()
            if abs(heading) <= np.pi / 4:
                return names.index("move_ahead")
            return names.index("rotate_left" if heading > 0
                               else "rotate_right")

        # arrived: standing (within a node's reach) on the closest
        # reachable node to the goal.  The reference terminates on path
        # length 1, which requires the agent to land exactly on the node
        # — true only when its move lattice aligns with map cells; the
        # radius generalizes that without changing aligned behavior.
        arrival = 0.75 * self.config.step_size * \
            self._occupancy_vm().geometry.grid_resolution
        pos = np.asarray(observations["position"][:2])
        end = np.asarray(path[-1][:2])
        # mesh slack: how far the best reachable node sits from the goal
        # (> 0 exactly when the goal cell is off-mesh — e.g. a GT goal
        # AT an object, whose padded cells hold no node)
        goal_slack = float(np.linalg.norm(goal[:2] - end))
        res = self._occupancy_vm().geometry.grid_resolution
        # goal adjacent to an obstacle (object-sized slack), not merely
        # in mesh the BFS has not reached yet: a far snap must keep the
        # pursuit alive — mapping en route improves the mesh, and
        # giving up instantly wastes the goal (measured: budget-5
        # multi-room sweeps lost coverage when slack-arrival fired on
        # unexplored-region goals).  The cap covers erosion (padding +
        # node granularity) PLUS the object's own half-extent — goals
        # sit at object centres, and collision evidence around the
        # object grows the slack past bare erosion (0.45 m clears the
        # grid world's largest openable at 0.9 m; everything stays
        # under the 1.5 m interaction range)
        slack_cap = (self.config.obstacle_padding +
                     2 * self.config.step_size) * res + 0.45
        # also arrive when the agent is as close to the goal as the
        # mesh can get: off-mesh goals otherwise never terminate — the
        # snapped target flips between equidistant nodes around the
        # obstacle as pruning/refresh perturb the mesh and the agent
        # ORBITS the goal until max_goal_steps (measured: 121 steps to
        # cover 1.65 m in a multi-room scene; docs/experiments.md)
        if (np.linalg.norm(end - pos) <= arrival or
                (goal_slack <= slack_cap and
                 np.linalg.norm(goal[:2] - pos) <= goal_slack + arrival)):
            observations["heading"] = 0.0
            return None

        if np.allclose(observations["position"][:2], goal[:2]):
            heading = 0.0
        else:
            # pure-pursuit waypoint: the farthest-along path point within
            # a lookahead radius.  The agent walks on its own 0.25 m
            # lattice, which generally does not coincide with nav nodes;
            # steering at the nearest node oscillates when it falls
            # behind the agent (the reference masks this by making node
            # spacing equal the move magnitude)
            pos = np.asarray(observations["position"][:2])
            lookahead = 0.36
            waypoint = path[1] if path.shape[0] > 1 else goal
            for cand in path[1:]:
                if np.linalg.norm(np.asarray(cand[:2]) - pos) \
                        <= lookahead:
                    waypoint = cand
            if np.linalg.norm(end - pos) <= lookahead and \
                    goal_slack <= arrival:
                # steer at the goal point only when it is mesh-adjacent:
                # walking INTO an off-mesh goal (an object) fails the
                # move, prunes the node, and destabilizes the target
                # snap — the orbit pathology above
                waypoint = goal
            heading = self.get_heading(observations, waypoint)
        observations["heading"] = heading

        names = self.task.action_names()
        if path.shape[0] > 1 and abs(heading) <= np.pi / 4:
            if not self._evidence_toward(observations, 0.0):
                return names.index("move_ahead")
            # the simulator already refused a move through the facing
            # cells (blocked_cells); the pi/4 heading rule would
            # re-emit move_ahead forever (diagonal reroute paths land
            # heading exactly on the boundary).  Escape via the first
            # evidence-free direction: turn toward the waypoint side,
            # else BACK OFF the obstacle (the eroded mesh recovers once
            # the agent leaves the padded zone), else turn away
            first = np.pi / 2 if heading >= 0 else -np.pi / 2
            if not self._evidence_toward(observations, first):
                return names.index("rotate_left" if heading >= 0
                                   else "rotate_right")
            if "move_back" in names and not self._evidence_toward(
                    observations, np.pi):
                return names.index("move_back")
            return names.index("rotate_right" if heading >= 0
                               else "rotate_left")
        if abs(heading) > np.pi / 4:
            # hysteresis band: waypoints ~45 deg off either facing make
            # the strict pi/4 rule flip-flop between rotations (each
            # 90 deg turn overshoots by ~0.002 rad); just inside the
            # band, moving on the current evidence-free facing still
            # advances the plan
            if (abs(heading) <= np.pi / 4 + 0.05 and
                    path.shape[0] > 1 and
                    not self._evidence_toward(observations, 0.0)):
                return names.index("move_ahead")
            rot = 1 if heading > 0 else -1
            pos_t = tuple(np.round(pos, 3))
            if (rot == -self._last_rot and
                    pos_t == self._last_rot_pos and
                    not self._evidence_toward(observations, 0.0)):
                # left/right flip-flop at one spot: the waypoint sits
                # ~45 deg between two facings and each 90 deg rotation
                # overshoots.  Either facing advances the plan — step
                # forward instead of spinning until max_goal_steps
                self._last_rot = 0
                return names.index("move_ahead")
            self._last_rot = rot
            self._last_rot_pos = pos_t
            return names.index("rotate_left" if rot > 0
                               else "rotate_right")
        return None

    def _evidence_toward(self, observations: Dict,
                         yaw_offset: float) -> bool:
        """True when collision evidence blocks the cells a move in
        direction ``yaw + yaw_offset`` would sweep (see
        failed_action)."""
        if self.blocked_cells is None:
            return False
        g = self._occupancy_vm().geometry
        pos = np.asarray(observations["position"][:2], np.float64)
        yaw = float(observations["yaw"]) + yaw_offset
        fwd = np.asarray([np.cos(yaw), np.sin(yaw)])
        res = g.grid_resolution
        for r in np.arange(res, 0.3 + res, res):
            cell = self._cell_of_world(pos + r * fwd)
            x = int(np.clip(cell[0], 0, g.map_width - 1))
            y = int(np.clip(cell[1], 0, g.map_height - 1))
            if self.blocked_cells[y, x]:
                return True
        return False

    def failed_action(self, observations: Dict, action: int) -> None:
        """Record why the simulator refused the action and replan.

        Failed MOVES deposit collision evidence: the swept cells just
        ahead of the agent join ``blocked_cells``, which the next mesh
        refresh erodes exactly like mapped obstacles (obstacles only
        present in the live world never reach the frozen phase-one nav
        map).  Failed rotations — and every failure under
        --reference-compat — prune the blocking NODE like the reference
        (mass/navigation_policy.py:607-648)."""
        names = self.task.action_names()
        is_move = "rotate" not in names[action]
        if is_move and not self.config.reference_compat:
            g = self._occupancy_vm().geometry
            pos = np.asarray(observations["position"][:2], np.float64)
            yaw = float(observations["yaw"])
            fwd = np.asarray([np.cos(yaw), np.sin(yaw)])
            if self.blocked_cells is None:
                self.blocked_cells = np.zeros(
                    (g.map_height, g.map_width), bool)
            res = g.grid_resolution
            # sample the face of the obstruction: from just past the
            # agent's cell out to one move length (~0.3 m)
            for r in np.arange(res, 0.3 + res, res):
                cell = self._cell_of_world(pos + r * fwd)
                x = int(np.clip(cell[0], 0, g.map_width - 1))
                y = int(np.clip(cell[1], 0, g.map_height - 1))
                self.blocked_cells[y, x] = True
            # refresh immediately so the very next plan routes around
            self.update_navigation_grid()
            return
        idx = 0 if not is_move else 1
        path = observations.get("path")
        if path is None or path.shape[0] == 0:
            return
        s = self.config.step_size
        off_x, off_y = int(self.nav_grid.off_x), int(self.nav_grid.off_y)
        alive = np.asarray(self.nav_grid.alive)
        ny, nx = alive.shape
        while idx < path.shape[0]:
            cell = self._cell_of_world(path[idx])
            j, i = (int(cell[0]) - off_x) // s, \
                (int(cell[1]) - off_y) // s
            on_node = (int(cell[0]) - off_x) % s == 0 and \
                (int(cell[1]) - off_y) % s == 0 and \
                0 <= i < ny and 0 <= j < nx and alive[i, j]
            if on_node:
                # leaf may be numpy (fleet batched-plan readback keeps
                # grids host-side) or jnp (sequential path) — mutate a
                # host copy and preserve the incoming leaf type.  The
                # prune is recorded STICKY (NavGrid.pruned) so the
                # fresh-refresh semantics cannot resurrect a node the
                # simulator refused to enter
                is_np = isinstance(self.nav_grid.alive, np.ndarray)
                buf = np.array(alive)
                buf[i, j] = False
                pbuf = np.array(self.nav_grid.pruned)
                pbuf[i, j] = True
                self.nav_grid = self.nav_grid._replace(
                    alive=buf if is_np else jnp.asarray(buf),
                    pruned=pbuf if is_np else jnp.asarray(pbuf))
                return
            idx += 1

    # --------------------------------------------------------- rollout

    def navigate_to(self, goal, update_map=None,
                    max_steps: Optional[int] = None) -> Iterator[Dict]:
        """Generator: walk toward ``goal``, yielding each observation
        (for visualization), stepping the simulator, pruning the mesh on
        failures, refreshing it every ``graph_update_interval`` steps
        (reference: mass/navigation_policy.py:650-726).

        ``max_steps`` bounds one goal pursuit; goals can be genuinely
        unreachable (sampled beyond an unseen wall, or at an object that
        moved since the navigation map was built), where the reference
        burns the remaining phase budget orbiting them.
        """
        interval = self.config.graph_update_interval
        max_steps = max_steps or self.config.max_goal_steps
        with self.timer.stage("simulator"):
            observations = self.task.get_observations()
        action = self.get_action(observations, goal,
                                 update_map=update_map,
                                 update_navigation_grid=True)
        time_step = 0
        while True:
            time_step += 1
            yield observations
            if self.task.is_done() or action is None or \
                    (max_steps and time_step > max_steps):
                return
            with self.timer.stage("simulator"):
                result = self.task.step(action)
            if not result.action_success:
                self.failed_action(observations, action)
            with self.timer.stage("simulator"):
                observations = self.task.get_observations()
            action = self.get_action(
                observations, goal, update_map=update_map,
                update_navigation_grid=time_step % interval == 0)
