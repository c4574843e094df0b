"""Lockstep fleet evaluation: B full rearrangement episodes sharing
one device dispatch per stage.

The reference evaluates one episode per GPU process with no sharing
(reference: agent.py:795-800); `RearrangementAgent` (agent/loop.py)
keeps that per-episode shape.  This evaluator advances B grid-world
episodes in lockstep instead:

  * mapping: every live episode's frame folds into slab fleet maps in
    ONE sorted-span kernel launch (parallel/fleet.FleetMaps, with
    per-(episode, family) phase masks);
  * planning: every live episode's fused mesh-refresh + BFS + snap runs
    in ONE vmapped dispatch (nav/grid.plan_batch), grouped by whether
    the episode's mission wants a mesh refresh this step;
  * the per-episode FSM (phases, goal budgets, matching, grab/drop,
    failed-action pruning) stays host-side and reuses
    NavigationController's decide_from_plan, so behavior is
    step-for-step IDENTICAL to the sequential agent given the same
    per-episode rng streams (pinned by tests/test_evaluator.py).

Supported configuration mirrors the evaluation path of the sequential
agent: two-phase AND one-phase episodes, GT / sampled /
semantic-search-policy exploration goals, GT or predicted
disagreement, and ``--use-feature-matching`` (dense ResNet slabs fed
by one batched backbone dispatch per tick; the reference's headline
configuration, README.md:39).  One-phase ticks issue a second batched
launch for the goal-fed maps (the goal render's depth has its own
binning).  (Videos stay on the sequential driver.)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mass_tpu import taxonomy
from mass_tpu.agent import oracle
from mass_tpu.agent.loop import (GOAL_FED_MAPS, PHASE_ONE_MAPS,
                                 PHASE_TWO_MAPS)
from mass_tpu.config import AgentConfig
from mass_tpu.env.gridworld import snake_case
from mass_tpu.match import revisit
from mass_tpu.match.differences import predict_scene_differences
from mass_tpu.nav import grid as NG
from mass_tpu.nav.controller import NavigationController
from mass_tpu.parallel.fleet import FleetMaps
from mass_tpu.utils.profiling import StageTimer


class _PolicyHeads(NamedTuple):
    """Shared jitted policy heads (one compile serves every episode):
    the sampling heads mirror agent/loop.py's _policy_goal_cell[_cond],
    the logits heads serve --policy-inhibition-radius decoding."""
    conditioned: bool
    goal_cell: object
    goal_cell_cond: object
    logits: object
    logits_cond: object


class _FleetLayerView:
    """Minimal map-layer facade over one episode's fleet slab (what
    NavigationController and the matcher read)."""

    def __init__(self, fleet: FleetMaps, name: str, episode: int):
        self._fleet = fleet
        self._name = name
        self._episode = episode

    @property
    def voxel_map(self):
        return self._fleet.view(self._name, self._episode)

    @property
    def bins_epoch(self):
        return self._fleet.bins_epoch(self._episode)


class _Mission:
    """One navigate-to-goal pursuit plus actions to run on arrival."""

    def __init__(self, goal, arrival_steps: List[str],
                 max_steps: int):
        self.goal = np.asarray(goal, np.float32)
        self.arrival_steps = arrival_steps
        self.max_steps = max_steps
        self.calls = 0          # planning calls so far (refresh cadence)


WALK, UNSHUFFLE, REARRANGE, DONE = range(4)


class _Episode:
    def __init__(self, index: int, sampler, config: AgentConfig,
                 fleet: FleetMaps, rng: np.random.RandomState,
                 policy=None, timer: Optional[StageTimer] = None):
        self.index = index
        self.sampler = sampler
        self.config = config
        self.rng = rng
        self.timer = timer or StageTimer()
        self.phase = WALK
        self.goals_used = 0
        self.mission: Optional[_Mission] = None
        self.objects_moved: set = set()
        self.results: Optional[Dict] = None
        self._fleet = fleet
        self._revisit_sites = None      # revisit-head per-episode state
        self._revisit_used: set = set()
        self._policy = policy       # shared jitted heads (_PolicyHeads)
        # same per-episode key derivation as the sequential agent
        # (agent/loop.py: PRNGKey(rng.randint(1 << 30)) at init)
        self._policy_key = jax.random.PRNGKey(rng.randint(1 << 30))
        # phase-local policy goal cells, for --policy-inhibition-radius
        # (mirrors agent/loop.py's _policy_goal_cells)
        self._policy_goal_cells: Dict[str, List] = {
            "semantic0": [], "semantic1": []}
        # --record-found-objects state (written by the CLI's fleet
        # driver once the batch finishes; mirrors agent/loop.py's
        # walk/unshuffle trackers)
        self.walk_track: List[np.ndarray] = []
        self.unshuffle_track: List[np.ndarray] = []
        self.found_positions = np.zeros((0, 2))
        self.found_types: List[str] = []

        self.task = sampler.next_task()
        loc = self.task.agent_location()
        fleet.reset(index, (loc.x, loc.z, loc.y))
        maps = {name: _FleetLayerView(fleet, name, index)
                for name in fleet.names + fleet.dense_names}
        self.controller = NavigationController(
            self.task, config.navigation_map_name, maps, config.nav,
            rng=rng)
        self.task.step(self.task.action_names().index("look_down"))

        self.gt_walk: List[np.ndarray] = []
        self.gt_unshuffle: List[np.ndarray] = []
        self.object_ids_to_move: set = set()
        if config.one_phase:
            # single task: one exploration pass with the combined
            # budget builds BOTH maps (goal maps read the goal render);
            # GT goals interleave (current, target) like the
            # sequential one-phase driver (agent/loop.py
            # _run_task_one_phase)
            self.phase = UNSHUFFLE
            self.unshuffle_budget = (config.exploration_budget_one +
                                     config.exploration_budget_two)
            if config.ground_truth_semantic_search:
                for cur, target in oracle.scene_difference_positions(
                        self.task):
                    self.gt_unshuffle.extend([cur, target])
            self.object_ids_to_move = {
                taxonomy.CLASS_NAMES.index(n)
                for n in oracle.scene_difference_types(self.task)}
            if config.record_found_objects:
                self._record_found_targets(self.task)
        else:
            self.unshuffle_budget = config.exploration_budget_two
            if config.ground_truth_semantic_search:
                for cur, target in oracle.scene_difference_positions(
                        self.task):
                    self.gt_walk.append(target)
                    self.gt_unshuffle.append(cur)

    # ------------------------------------------------------------ fsm

    def update_names(self) -> List[str]:
        if self.config.one_phase and self.phase != REARRANGE:
            # one-phase exploration feeds every map (goal maps read the
            # goal render); rearrangement navigation updates ONLY the
            # live phase-two maps, like the sequential one-phase driver
            # (agent/loop.py _rearrange's update_map=self.phase_two)
            names = PHASE_ONE_MAPS + PHASE_TWO_MAPS
        else:
            names = (PHASE_ONE_MAPS if self.phase == WALK
                     else PHASE_TWO_MAPS)
        return [n for n in names if n in self.controller.maps]

    def _next_goal(self, gt_goals: List[np.ndarray],
                   semantic_name: str,
                   use_policy: bool) -> np.ndarray:
        # mirror agent/loop._next_goal exactly: the random sample is
        # always drawn (it advances the rng) even when a GT goal wins
        goal = self.controller.sample_navigation_goal({})
        if gt_goals:
            return gt_goals.pop(0)
        if use_policy and self._policy is not None:
            return self._policy_goal(semantic_name)
        if (self.config.revisit_exploration and not self.config.one_phase
                and self.phase == UNSHUFFLE):
            # same revisit_ok condition as the sequential driver's
            # unshuffle _explore (agent/loop.py run_task)
            site = self._revisit_goal()
            if site is not None:
                return site
            return self.controller.frontier_navigation_goal({})
        if self.config.frontier_exploration:
            return self.controller.frontier_navigation_goal({})
        return goal

    def _revisit_goal(self) -> Optional[np.ndarray]:
        """Walkthrough-site revisit goal from this episode's fleet slab
        (mirrors agent/loop._revisit_goal; match/revisit.py)."""
        if self._revisit_sites is None:
            with self.timer.stage("matching"):
                self._revisit_sites = revisit.walkthrough_sites(
                    self._fleet.view("semantic0", self.index),
                    self.config.match)
        return revisit.pick_site(self._revisit_sites,
                                 self._revisit_used, self.rng)

    def _policy_goal(self, semantic_name: str) -> np.ndarray:
        """Semantic-search goal from this episode's fleet slab
        (mirrors agent/loop._policy_goal exactly, including the
        conditioned context input and --policy-inhibition-radius
        decoding; reference: agent.py:328-339)."""
        from mass_tpu.search import policy as search_policy
        heads = self._policy
        self._policy_key, sub = jax.random.split(self._policy_key)
        inhibit = self.config.policy_inhibition_radius
        with self.timer.stage("search_policy"):
            vm = self._fleet.view(semantic_name, self.index)
            ctx = None
            if heads.conditioned:
                # unshuffle call site: context = finished walkthrough
                # slab; walkthrough call site: zeros (matches the
                # training marginal — agent/loop.py _policy_goal)
                ctx = (self._fleet.view("semantic0", self.index).data
                       if semantic_name == "semantic1"
                       else jnp.zeros_like(vm.data))
            if inhibit > 0:
                logits = (heads.logits_cond(vm.data, ctx)
                          if ctx is not None else heads.logits(vm.data))
                g = vm.geometry
                cell = search_policy.inhibited_sample_cell(
                    logits, g.map_height, g.map_width,
                    self._policy_goal_cells[semantic_name], inhibit,
                    sub)
            elif ctx is not None:
                cell = heads.goal_cell_cond(vm.data, ctx, sub)
            else:
                cell = heads.goal_cell(vm.data, sub)
            cell = np.asarray(cell)
            self._policy_goal_cells[semantic_name].append(cell[:2])
            return np.asarray(vm.map_to_world(
                jnp.asarray(cell, jnp.float32)))

    def _record_found_targets(self, task) -> None:
        """Misplaced-object positions/classes for --record-found-objects
        (mirrors agent/loop.py run_task's object_positions/types)."""
        pos = [p[0][:2]
               for p in oracle.scene_difference_positions(task)]
        self.found_positions = (np.asarray(pos) if pos
                                else np.zeros((0, 2)))
        self.found_types = list(oracle.scene_difference_types(task))

    def _enter_unshuffle(self) -> None:
        self.task = self.sampler.next_task()
        self.controller.task = self.task
        self.task.step(self.task.action_names().index("look_down"))
        self.object_ids_to_move = {
            taxonomy.CLASS_NAMES.index(n)
            for n in oracle.scene_difference_types(self.task)}
        if self.config.record_found_objects:
            self._record_found_targets(self.task)
        self.phase = UNSHUFFLE
        self.goals_used = 0

    def _match_missions(self, fleet: FleetMaps) -> bool:
        """Run the matcher; queue grab/drop missions.  False = no more
        differences (episode should finish)."""
        cfg = self.config
        candidates = (self.object_ids_to_move
                      if cfg.ground_truth_disagreement
                      else range(taxonomy.NUM_CLASSES))
        with self.timer.stage("matching"):
            dense = fleet.dense_names
            cls, goals0, goals1 = predict_scene_differences(
                fleet.view("semantic0", self.index),
                fleet.view("semantic1", self.index),
                fleet.view("feature0", self.index)
                if "feature0" in dense else None,
                fleet.view("feature1", self.index)
                if "feature1" in dense else None,
                self.objects_moved, candidates, cfg.match)
        if cls is None:
            return False
        self.objects_moved.add(cls)

        d = np.linalg.norm(
            np.stack(goals0)[:, None] - np.stack(goals1)[None],
            axis=-1)
        order = np.argsort(-d.min(axis=1))
        goals0 = [goals0[i] for i in order]
        goals1 = [goals1[i] for i in order]

        cname = taxonomy.CLASS_NAMES[cls]
        pickable = taxonomy.ID_TO_PICKABLE[cls]
        grab = (f"pickup_{snake_case(cname)}" if pickable
                else f"open_by_type_{snake_case(cname)}")

        self._queue = []
        for goal0, goal1 in zip(goals0, goals1):
            self._queue.append(_Mission(
                goal1, [grab], self.config.nav.max_goal_steps))
            if pickable:
                self._queue.append(_Mission(
                    goal0, ["drop_held_object_with_snap"],
                    self.config.nav.max_goal_steps))
        return True

    def advance(self, fleet: FleetMaps) -> None:
        """Ensure a current mission, moving the FSM forward as phases
        and budgets demand.  May finish the episode."""
        cfg = self.config
        while self.mission is None and self.phase != DONE:
            if self.task.is_done():
                if self.phase == WALK:
                    # a done walkthrough task (e.g. max_steps exhausted)
                    # ends only the walkthrough: the sequential agent
                    # proceeds to the unshuffle task unconditionally
                    # (agent/loop.py run_task: _explore exits on done,
                    # then the phase switch runs)
                    self._enter_unshuffle()
                    continue
                self._finish()
                return
            if self.phase == WALK:
                if self.goals_used >= cfg.exploration_budget_one:
                    self._enter_unshuffle()
                    continue
                self.goals_used += 1
                self.mission = _Mission(
                    self._next_goal(self.gt_walk, "semantic0",
                                    cfg.semantic_search_walkthrough),
                    [], cfg.nav.max_goal_steps)
            elif self.phase == UNSHUFFLE:
                if self.goals_used >= self.unshuffle_budget:
                    self.phase = REARRANGE
                    self._queue: List[_Mission] = []
                    continue
                self.goals_used += 1
                self.mission = _Mission(
                    self._next_goal(self.gt_unshuffle, "semantic1",
                                    cfg.semantic_search_unshuffle),
                    [], cfg.nav.max_goal_steps)
            else:                                        # REARRANGE
                if self._queue:
                    self.mission = self._queue.pop(0)
                    continue
                if not self._match_missions(fleet):
                    self._finish()
                    return

    def complete_mission(self) -> None:
        """Arrival (or give-up): run the queued manipulation steps."""
        names = self.task.action_names()
        for step_name in self.mission.arrival_steps:
            if self.task.is_done():
                break
            self.task.step(names.index(step_name))
        self.mission = None

    def _finish(self) -> None:
        if not self.task.is_done():
            self.task.step(self.task.action_names().index("done"))
        results = self.task.metrics()
        results["unshuffle/objects_moved"] = [
            taxonomy.CLASS_NAMES[i] for i in self.objects_moved]
        results["unshuffle/objects_moved_accuracy"] = [
            1 if i in self.object_ids_to_move else 0
            for i in self.objects_moved]
        results["unshuffle/objects_to_move"] = [
            taxonomy.CLASS_NAMES[i] for i in self.object_ids_to_move]
        results["unshuffle/objects_to_move_accuracy"] = [
            1 if i in self.objects_moved else 0
            for i in self.object_ids_to_move]
        results["walkthrough/observed_cells"] = \
            self.controller.observed_cell_count("semantic0")
        results["unshuffle/observed_cells"] = \
            self.controller.observed_cell_count("semantic1")
        self.results = results
        self.phase = DONE
        self.mission = None


class FleetEvaluator:
    """Run B episodes in lockstep over shared fleet maps.

    Args:
      config: agent configuration (two-phase evaluation surface).
      samplers: one task sampler per episode (each yields that
        episode's walkthrough then unshuffle task).
      seeds: per-episode rng seeds (pose noise + goal sampling streams;
        match these to reproduce sequential runs episode-for-episode).
      sensor: optional learned segmentation sensor (e.g.
        perception.segmentation.DetectorSegmentation).  The fleet
        replaces each live episode's GT ``semantic`` with the sensor
        output exactly like SegmentationTaskWrapper does sequentially —
        but runs the whole fleet's inference as ONE batched device
        dispatch per tick (perception.segmentation.make_batched_sensor).
    """

    def __init__(self, config: AgentConfig, samplers: List,
                 seeds: Optional[List[int]] = None,
                 policy_params=None, sensor=None,
                 feature_backbone=None, feature_size: int = 256):
        if config.use_feature_matching:
            assert feature_backbone is not None, (
                "fleet feature matching needs a backbone (pass "
                "feature_backbone=; CLI: --backbone-checkpoint)")
        self.config = config
        self._batched_sensor = None
        if sensor is not None:
            from mass_tpu.perception.segmentation import \
                make_batched_sensor
            self._batched_sensor = make_batched_sensor(sensor)
        B = len(samplers)
        families = {"semantic0": taxonomy.NUM_CLASSES,
                    "semantic1": taxonomy.NUM_CLASSES}
        if not config.navigate_on_semantic:
            families["occupancy"] = 1
        # ONE fleet-level timer: stages are shared across the whole
        # lockstep batch (a tick's mapping dispatch serves B episodes),
        # so the summary lands on episode 0's results only — a fleet
        # logdir's timing block reads as per-FLEET, not per-task
        self.timer = StageTimer()
        # layout "auto": FleetMaps resolves it by backend (cmajor slabs
        # on TPU for the Pallas span kernels, vmajor sparse rows on
        # host backends — docs/performance.md)
        mesh = None
        if config.shard_map > 1:
            from mass_tpu.parallel import make_mesh
            mesh = make_mesh((config.shard_map,), ("map",))
        dense = None
        if config.use_feature_matching:
            # the ResNet map pair of --use-feature-matching (reference:
            # resnet_projection_layer.py:62-141), as fleet slabs fed by
            # one batched backbone dispatch per tick
            dense = {"feature0": feature_size, "feature1": feature_size}
        with self.timer.stage("init_fleet"):
            self.fleet = FleetMaps(B, config.camera,
                                   _geometry_of(config), families,
                                   mesh=mesh, dense_sizes=dense,
                                   backbone=feature_backbone)

        policy = None
        if policy_params is not None:
            from mass_tpu.search import policy as search_policy
            # both policy-head variants of the sequential driver
            # (agent/loop.py): plain (current map) and walkthrough-
            # CONDITIONED (concat([current, walkthrough context]),
            # auto-detected from the checkpoint's input width); the
            # logits heads serve --policy-inhibition-radius decoding
            conditioned = (search_policy.input_channels(policy_params)
                           == 2 * taxonomy.NUM_CLASSES)
            proto = self.fleet.view("semantic0", 0)

            @jax.jit
            def policy_goal_cell(data, rng_key):
                vm = dataclasses.replace(proto, data=data)
                top = vm.max_over_depth()[None]
                return search_policy.sample_goal_cell(
                    policy_params, top, rng_key)[0]

            @jax.jit
            def policy_goal_cell_cond(data, ctx, rng_key):
                top = dataclasses.replace(
                    proto, data=data).max_over_depth()
                c = dataclasses.replace(
                    proto, data=ctx).max_over_depth()
                x = jnp.concatenate([top, c], axis=-1)[None]
                return search_policy.sample_goal_cell(
                    policy_params, x, rng_key)[0]

            @jax.jit
            def policy_logits(data):
                vm = dataclasses.replace(proto, data=data)
                return search_policy.goal_logits(
                    policy_params, vm.max_over_depth()[None])[0]

            @jax.jit
            def policy_logits_cond(data, ctx):
                top = dataclasses.replace(
                    proto, data=data).max_over_depth()
                c = dataclasses.replace(
                    proto, data=ctx).max_over_depth()
                x = jnp.concatenate([top, c], axis=-1)[None]
                return search_policy.goal_logits(policy_params, x)[0]

            policy = _PolicyHeads(conditioned, policy_goal_cell,
                                  policy_goal_cell_cond, policy_logits,
                                  policy_logits_cond)

        seeds = seeds or list(range(B))
        self.episodes = [
            _Episode(i, samplers[i], config, self.fleet,
                     np.random.RandomState(seeds[i]), policy=policy,
                     timer=self.timer)
            for i in range(B)]
        self._planner = self._make_fleet_planner()

    # ---------------------------------------------------------- tick

    def _make_fleet_planner(self):
        """Jitted group planner reading episode map slabs straight out
        of the fleet buffer — stacking per-episode VoxelMaps on the
        host every tick copies the full maps and made the fleet SLOWER
        than the sequential agent (measured 3.3x on CPU)."""
        fleet = self.fleet
        nav_name = self.config.navigation_map_name
        geometry = fleet._episode_geoms[nav_name]
        V = fleet._episode_voxels
        B = fleet.batch
        cfg = self.config.nav
        from mass_tpu.core.voxelmap import VoxelMap

        def _one(grid, data, bx, by, bz, agent, goal, blocked,
                 refresh):
            vm = VoxelMap(data=data, bins_x=bx, bins_y=by,
                          bins_z=bz, geometry=geometry)
            return NG.plan(
                grid, vm, agent, goal, step=cfg.step_size,
                padding=cfg.obstacle_padding,
                z_start=cfg.map_slice_start,
                z_stop=cfg.map_slice_stop,
                threshold=cfg.obstacle_threshold, refresh=refresh,
                monotone=cfg.reference_compat, blocked=blocked)

        cmajor = fleet.layouts[nav_name] == "cmajor"

        @jax.jit
        def plan_group_refresh(grids, buffer, bins_x, bins_y, bins_z,
                               idx, agents, goals, blocked):
            if cmajor:
                slabs = buffer.reshape(buffer.shape[0], B, V)[
                    :, idx].transpose(1, 0, 2)        # [G, F, V]
            else:
                slabs = buffer.reshape(B, V,
                                       buffer.shape[-1])[idx]  # [G, V, F]
            return jax.vmap(
                functools.partial(_one, refresh=True))(
                    grids, slabs, bins_x[idx], bins_y[idx],
                    bins_z[idx], agents, goals, blocked)

        @jax.jit
        def plan_group_norefresh(grids, bins_x, bins_y, bins_z, idx,
                                 agents, goals):
            # the non-refresh plan never reads the map (mesh + bins
            # only), so skip the slab gather entirely — most ticks are
            # non-refresh (graph_update_interval), and gathering the
            # occupancy slabs per tick dominated fleet wall time
            dummy = jnp.zeros((len(idx), 1, 1), jnp.float32)
            return jax.vmap(
                functools.partial(_one, refresh=False, blocked=None))(
                    grids, dummy, bins_x[idx], bins_y[idx],
                    bins_z[idx], agents, goals)

        def planner(group, obs, refresh):
            # pad the group to the FULL fleet size with copies of its
            # first episode: group size shrinks as episodes finish, and
            # every distinct size is a fresh XLA compile of the plan
            # jit (measured: 8 compiles, ~37 s of a 4-episode fleet's
            # wall) — padded slots' plans are simply never read back out
            padded = group + [group[0]] * (B - len(group))
            # stack grids HOST-side: after the first tick every
            # nav_grid leaf is numpy (the batched plan readback below),
            # so np.stack costs no device ops and the upload happens
            # once at the jit call boundary — jnp.stack here issued
            # per-leaf device ops every tick
            grids = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[ep.controller.nav_grid for ep in padded])
            idx = np.asarray([ep.index for ep in padded], np.int32)
            agents = np.asarray(
                [obs[ep.index]["position"] for ep in padded],
                np.float32)
            goals = np.asarray([ep.mission.goal for ep in padded],
                               np.float32)
            if refresh:
                g = geometry
                zero = np.zeros((g.map_height, g.map_width), bool)
                blocked = np.stack(
                    [ep.controller.blocked_cells
                     if ep.controller.blocked_cells is not None
                     else zero for ep in padded])
                return plan_group_refresh(
                    grids, fleet.buffers[nav_name], fleet.bins_x,
                    fleet.bins_y, fleet.bins_z, idx, agents, goals,
                    blocked)
            return plan_group_norefresh(
                grids, fleet.bins_x, fleet.bins_y, fleet.bins_z, idx,
                agents, goals)

        return planner

    def _plan_groups(self, live: List[_Episode], obs: Dict[int, Dict]):
        """Two batched dispatches: refresh-wanting episodes and the
        rest (the jitted plan's refresh flag is static per call)."""
        cfg = self.config.nav
        plans: Dict[int, tuple] = {}
        for refresh in (True, False):
            group = [ep for ep in live
                     if _wants_refresh(ep, cfg) == refresh]
            if not group:
                continue
            out = self._planner(group, obs, refresh)
            # read the WHOLE group's plan back in ONE device_get: the
            # per-episode decide_from_plan otherwise pays one tunnel
            # round trip each (B x 30-130 ms per tick was the fleet's
            # dominant cost on the TPU backend — docs/experiments.md
            # "Fleet serving"); numpy plan trees make its device_get a
            # no-op and next tick's grid stacking host-side
            out = jax.device_get(out)
            for k, ep in enumerate(group):
                plans[ep.index] = jax.tree_util.tree_map(
                    lambda x: x[k], out)
        return plans

    def tick(self) -> bool:
        """One lockstep step; returns False when every episode is done."""
        with self.timer.stage("fsm"):
            for ep in self.episodes:
                if ep.phase != DONE and ep.mission is None:
                    ep.advance(self.fleet)
            live = [ep for ep in self.episodes if ep.phase != DONE]
        if not live:
            return False

        # --- observations + pose, batched map update
        B = len(self.episodes)
        cam = self.config.camera
        positions = np.zeros((B, 3), np.float32)
        yaws = np.zeros((B,), np.float32)
        elevations = np.zeros((B,), np.float32)
        depths = np.full((B, cam.height, cam.width, 1), 1e9, np.float32)
        classes = {"semantic0": np.zeros((B, cam.height, cam.width),
                                         np.int32),
                   "semantic1": np.zeros((B, cam.height, cam.width),
                                         np.int32)}
        active = {name: np.zeros((B,), bool)
                  for name in self.fleet.names}
        dense_names = self.fleet.dense_names
        if dense_names:
            rgbs = np.zeros((B, cam.height, cam.width, 3), np.float32)
            dense_active = {name: np.zeros((B,), bool)
                            for name in dense_names}
        one_phase = self.config.one_phase
        if one_phase:
            # goal-fed maps consume the GOAL world's render, whose
            # depth differs from the live frame — a second batched
            # launch with its own binning (mirrors OnePhaseMapSet,
            # agent/loop.py:43-60)
            goal_depths = np.full_like(depths, 1e9)
            goal_classes = {"semantic0": np.zeros(
                (B, cam.height, cam.width), np.int32)}
            goal_active = {name: np.zeros((B,), bool)
                           for name in self.fleet.names}
            if dense_names:
                goal_rgbs = np.zeros((B, cam.height, cam.width, 3),
                                     np.float32)
                goal_dense_active = {name: np.zeros((B,), bool)
                                     for name in dense_names}
        obs: Dict[int, Dict] = {}
        with self.timer.stage("observe"):
            for ep in live:
                o = dict(ep.task.get_observations())
                ep.controller.process_observations(o, update_map=None)
                obs[ep.index] = o

        if self._batched_sensor is not None:
            # learned segmentation for the WHOLE fleet in one device
            # dispatch (the sequential driver's SegmentationTaskWrapper
            # swap, batched); frames of finished episodes ride as zeros
            # so the compiled shape is constant
            with self.timer.stage("segmentation"):
                rgb = np.zeros((B, cam.height, cam.width, 3),
                               np.float32)
                for ep in live:
                    rgb[ep.index] = np.asarray(obs[ep.index]["rgb"],
                                               np.float32)
                sem_batch = self._batched_sensor(rgb)
                for ep in live:
                    o = obs[ep.index]
                    if "semantic" in o:
                        o["gt_semantic"] = o["semantic"]
                    o["semantic"] = sem_batch[ep.index]

        record_found = self.config.record_found_objects
        for ep in live:
            o = obs[ep.index]
            positions[ep.index] = o["position"]
            if record_found:
                # one tick == one step of each live episode (mirrors
                # agent/loop.py's per-step [loc.x, loc.z] trackers;
                # rearrangement steps join the unshuffle track)
                track = (ep.walk_track if ep.phase == WALK
                         else ep.unshuffle_track)
                track.append(np.asarray(o["position"][:2], np.float64))
            yaws[ep.index] = o["yaw"]
            elevations[ep.index] = o["elevation"]
            depths[ep.index] = np.asarray(o["depth"], np.float32)
            sem = np.asarray(o["semantic"])
            if sem.ndim == 3:
                sem = sem[..., 0]
            if dense_names:
                rgbs[ep.index] = np.asarray(o["rgb"], np.float32)
            for name in ep.update_names():
                if name in dense_names:
                    # dense feature families ride their own batched
                    # backbone dispatch (update_dense below)
                    if one_phase and name in GOAL_FED_MAPS:
                        goal_dense_active[name][ep.index] = True
                        goal_rgbs[ep.index] = np.asarray(
                            o["goal_rgb"], np.float32)
                        goal_depths[ep.index] = np.asarray(
                            o["goal_depth"], np.float32)
                    else:
                        dense_active[name][ep.index] = True
                    continue
                if one_phase and name in GOAL_FED_MAPS:
                    gsem = np.asarray(o["goal_semantic"])
                    if gsem.ndim == 3:
                        gsem = gsem[..., 0]
                    goal_active[name][ep.index] = True
                    goal_classes[name][ep.index] = gsem
                    goal_depths[ep.index] = np.asarray(
                        o["goal_depth"], np.float32)
                    continue
                active[name][ep.index] = True
                if name in classes:
                    classes[name][ep.index] = sem
        with self.timer.stage("mapping"):
            self.fleet.update_batch(positions, yaws, elevations,
                                    depths, classes, active=active)
            if dense_names and any(m.any()
                                   for m in dense_active.values()):
                self.fleet.update_dense(positions, yaws, elevations,
                                        depths, rgbs,
                                        active=dense_active)
            if one_phase and any(m.any()
                                 for m in goal_active.values()):
                self.fleet.update_batch(positions, yaws, elevations,
                                        goal_depths, goal_classes,
                                        active=goal_active)
            if one_phase and dense_names and any(
                    m.any() for m in goal_dense_active.values()):
                self.fleet.update_dense(positions, yaws, elevations,
                                        goal_depths, goal_rgbs,
                                        active=goal_dense_active)

        # --- batched planning, per-episode decisions + env steps
        with self.timer.stage("planning"):
            plans = self._plan_groups(live, obs)
        for ep in live:
            ep.mission.calls += 1
            with self.timer.stage("decide"):
                action = ep.controller.decide_from_plan(
                    obs[ep.index], ep.mission.goal, plans[ep.index])
            done = ep.task.is_done()
            exhausted = (ep.mission.max_steps and
                         ep.mission.calls > ep.mission.max_steps)
            if done or action is None or exhausted:
                ep.complete_mission()
                # a done walkthrough task is a phase switch, not an
                # episode end — the next tick's advance() enters the
                # unshuffle phase (mirrors agent/loop.py run_task)
                if done and ep.phase != WALK:
                    ep._finish()
                continue
            with self.timer.stage("simulator"):
                result = ep.task.step(action)
            if not result.action_success:
                ep.controller.failed_action(obs[ep.index], action)
        return True

    def run(self) -> List[Dict]:
        # "tick_loop" wraps the whole lockstep loop: (tick_loop − the
        # per-stage totals) is the untimed host-side residue, and
        # (process wall − tick_loop − init_fleet) is startup cost
        with self.timer.stage("tick_loop"):
            while self.tick():
                pass
        results = [ep.results for ep in self.episodes]
        # fleet-LEVEL stage summary on episode 0 only, under its OWN
        # key: every stage here serves the whole lockstep batch at
        # once, so per-task aggregation (tools/analyze.py timing) must
        # not average one fleet-wide total against B-times-smaller
        # per-task "timing" blocks from sequential runs in the same
        # logdir.  "fsm" includes the nested "matching" /
        # "search_policy" stages.
        if results and results[0] is not None:
            results[0]["fleet_timing"] = self.timer.summary()
        return results


def _geometry_of(config: AgentConfig):
    from mass_tpu.config import MapGeometry
    return MapGeometry(map_height=config.map_height,
                       map_width=config.map_width,
                       map_depth=config.map_depth,
                       grid_resolution=config.grid_resolution,
                       precision=config.map_precision)


def _wants_refresh(ep: _Episode, nav_cfg) -> bool:
    # mirror navigate_to's cadence: first plan of a mission refreshes,
    # later ones every graph_update_interval steps
    k = ep.mission.calls
    return k == 0 or (k % nav_cfg.graph_update_interval == 0)
