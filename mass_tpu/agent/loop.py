"""The two-phase rearrangement episode driver.

Orchestrates the full agent (reference: agent.py:120-662): build the
walkthrough semantic map while exploring, rebuild a second map in the
shuffled scene, diff the maps to find displaced objects, and navigate /
pick / place to fix them — with the reference's GT-injection ablations,
exploration budgets, analytics, and per-task outputs.

The heavy per-step math (map scatter, traversability, BFS planning,
policy goal sampling, map differencing) is all jitted device work; this
module is the thin sequential host loop the simulator forces
(SURVEY.md §3.1).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mass_tpu import taxonomy
from mass_tpu.agent import metrics as M
from mass_tpu.agent import oracle
from mass_tpu.config import AgentConfig
from mass_tpu.env.gridworld import snake_case
from mass_tpu.maps import FeatureMap, MapSet, OccupancyMap, SemanticMap
from mass_tpu.match import revisit
from mass_tpu.match.differences import predict_scene_differences
from mass_tpu.nav.controller import NavigationController
from mass_tpu.search import policy as search_policy
from mass_tpu.utils import visualization as viz
from mass_tpu.utils.profiling import StageTimer

PHASE_ONE_MAPS = ["occupancy", "semantic0", "feature0"]
PHASE_TWO_MAPS = ["semantic1", "feature1"]
# in one-phase mode these maps consume the goal world's render
GOAL_FED_MAPS = frozenset({"semantic0", "feature0"})


class OnePhaseMapSet(MapSet):
    """MapSet whose goal-state maps read the goal render carried in each
    one-phase observation (``goal_depth`` / ``goal_semantic`` /
    ``goal_rgb`` — reference: the dual walkthrough/unshuffle semantic
    sensors of OnePhaseSegmentationConfig,
    segmentation_config.py:545-561)."""

    def update_group(self, names, observation) -> None:
        live = [n for n in names if n not in GOAL_FED_MAPS]
        goal = [n for n in names if n in GOAL_FED_MAPS]
        super().update_group(live, observation)
        if goal and "goal_depth" in observation:
            remap = dict(observation)
            remap["depth"] = observation["goal_depth"]
            remap["semantic"] = observation["goal_semantic"]
            if "goal_rgb" in observation:
                remap["rgb"] = observation["goal_rgb"]
            super().update_group(goal, remap)


class RearrangementAgent:
    """Runs rearrangement episodes from a task sampler.

    Args:
      config: full agent configuration (flag surface of agent.py).
      sampler: walkthrough/unshuffle alternating task source.
      policy_params: semantic-search policy weights (flax), or None.
      feature_backbone: RGB -> [h/4, w/4, F] embedding fn for feature
        matching, required when config.use_feature_matching.
      video_writer_factory: optional ``task_id -> writer`` with
        ``write(frame_uint8)`` / ``close()`` for episode videos.
    """

    def __init__(self, config: AgentConfig, sampler,
                 policy_params=None,
                 feature_backbone: Optional[Callable] = None,
                 feature_size: int = 256,
                 video_writer_factory: Optional[Callable] = None,
                 rng: Optional[np.random.RandomState] = None):
        self.config = config
        self.sampler = sampler
        self.policy_params = policy_params
        self.video_writer_factory = video_writer_factory
        self.rng = rng or np.random.RandomState(0)
        self.timer = StageTimer()

        cam = config.camera
        geo_kw = dict(map_height=config.map_height,
                      map_width=config.map_width,
                      map_depth=config.map_depth,
                      grid_resolution=config.grid_resolution,
                      precision=config.map_precision)
        if config.shard_map > 1:
            # row-shard every map over an N-device "map" mesh axis;
            # layers switch to vmajor storage + shard_map updates
            # (parallel/sharding.py)
            from mass_tpu.parallel import make_mesh
            geo_kw["mesh"] = make_mesh((config.shard_map,), ("map",))
        map_set_cls = OnePhaseMapSet if config.one_phase else MapSet
        self.maps = map_set_cls(
            semantic0=SemanticMap(cam, taxonomy.NUM_CLASSES, **geo_kw),
            semantic1=SemanticMap(cam, taxonomy.NUM_CLASSES, **geo_kw))
        # the nav-layer rule lives on AgentConfig (shared with both
        # fleet paths, so their step-for-step parity can't drift)
        self.navigation_map = config.navigation_map_name
        if not config.navigate_on_semantic:
            self.maps["occupancy"] = OccupancyMap(cam, **geo_kw)
        if config.use_feature_matching:
            assert feature_backbone is not None, (
                "feature matching needs a backbone")
            self.maps["feature0"] = FeatureMap(
                cam, feature_size, feature_backbone, **geo_kw)
            self.maps["feature1"] = FeatureMap(
                cam, feature_size, feature_backbone, **geo_kw)

        self.phase_one = [m for m in PHASE_ONE_MAPS if m in self.maps]
        self.phase_two = [m for m in PHASE_TWO_MAPS if m in self.maps]

        self._policy_conditioned = False
        if policy_params is not None:
            # checkpoints trained with `search.train --conditioned`
            # take concat([current map, walkthrough context]) — the
            # input width is baked into the first conv kernel
            self._policy_conditioned = (
                search_policy.input_channels(policy_params)
                == 2 * taxonomy.NUM_CLASSES)

            @jax.jit
            def _policy_goal_cell(params, vm_data, rng_key):
                vm = dataclasses.replace(
                    self.maps["semantic0"].voxel_map, data=vm_data)
                top = vm.max_over_depth()[None]
                return search_policy.sample_goal_cell(params, top,
                                                      rng_key)[0]
            self._policy_goal_cell = _policy_goal_cell

            @jax.jit
            def _policy_goal_cell_cond(params, vm_data, ctx_data,
                                       rng_key):
                base = self.maps["semantic0"].voxel_map
                top = dataclasses.replace(
                    base, data=vm_data).max_over_depth()
                ctx = dataclasses.replace(
                    base, data=ctx_data).max_over_depth()
                x = jnp.concatenate([top, ctx], axis=-1)[None]
                return search_policy.sample_goal_cell(params, x,
                                                      rng_key)[0]
            self._policy_goal_cell_cond = _policy_goal_cell_cond

            @jax.jit
            def _policy_logits(params, vm_data):
                vm = dataclasses.replace(
                    self.maps["semantic0"].voxel_map, data=vm_data)
                return search_policy.goal_logits(
                    params, vm.max_over_depth()[None])[0]
            self._policy_logits = _policy_logits

            @jax.jit
            def _policy_logits_cond(params, vm_data, ctx_data):
                base = self.maps["semantic0"].voxel_map
                top = dataclasses.replace(
                    base, data=vm_data).max_over_depth()
                ctx = dataclasses.replace(
                    base, data=ctx_data).max_over_depth()
                x = jnp.concatenate([top, ctx], axis=-1)[None]
                return search_policy.goal_logits(params, x)[0]
            self._policy_logits_cond = _policy_logits_cond
        self._policy_key = jax.random.PRNGKey(self.rng.randint(1 << 30))
        # phase-local record of policy goal cells, for
        # --policy-inhibition-radius (without-replacement decoding)
        self._policy_goal_cells: Dict[str, List] = {
            "semantic0": [], "semantic1": []}

    # ------------------------------------------------------- goal heads

    def _policy_goal(self, semantic_name: str) -> np.ndarray:
        """Semantic-search goal: categorical sample over policy scores of
        the z-collapsed semantic map (reference: agent.py:328-339)."""
        layer = self.maps[semantic_name]
        self._policy_key, sub = jax.random.split(self._policy_key)
        inhibit = self.config.policy_inhibition_radius
        ctx = None
        with self.timer.stage("search_policy"):
            if self._policy_conditioned:
                # unshuffle call site: context = finished walkthrough
                # map (what the revisit head reads sites from);
                # walkthrough call site: zeros — no prior map exists —
                # matching the training marginal (train --conditioned)
                ctx = (self.maps["semantic0"].voxel_map.data
                       if semantic_name == "semantic1"
                       else jnp.zeros_like(layer.voxel_map.data))
            if inhibit > 0:
                cell = self._inhibited_policy_cell(
                    layer, semantic_name, ctx, sub)
            elif self._policy_conditioned:
                cell = self._policy_goal_cell_cond(
                    self.policy_params, layer.voxel_map.data, ctx, sub)
            else:
                cell = self._policy_goal_cell(self.policy_params,
                                              layer.voxel_map.data,
                                              sub)
            cell = np.asarray(cell)
            self._policy_goal_cells[semantic_name].append(cell[:2])
            goal = np.asarray(layer.map_to_world(
                jnp.asarray(cell, jnp.float32)))
        return goal

    def _inhibited_policy_cell(self, layer, semantic_name: str,
                               ctx, rng_key) -> np.ndarray:
        """Without-replacement policy decoding — the numpy decode rule
        lives in search/policy.inhibited_sample_cell (shared with the
        fleet evaluator)."""
        from mass_tpu.search import policy as search_policy
        if ctx is not None:
            logits = self._policy_logits_cond(
                self.policy_params, layer.voxel_map.data, ctx)
        else:
            logits = self._policy_logits(self.policy_params,
                                         layer.voxel_map.data)
        g = layer.voxel_map.geometry
        return search_policy.inhibited_sample_cell(
            logits, g.map_height, g.map_width,
            self._policy_goal_cells[semantic_name],
            self.config.policy_inhibition_radius, rng_key)

    def _revisit_goal(self, controller) -> Optional[np.ndarray]:
        """Unshuffle-phase goal at an unvisited walkthrough object
        site (match/revisit.py); None once every site is visited."""
        if self._revisit_sites is None:
            with self.timer.stage("matching"):
                self._revisit_sites = revisit.walkthrough_sites(
                    self.maps["semantic0"].voxel_map,
                    self.config.match)
        return revisit.pick_site(self._revisit_sites,
                                 self._revisit_used, self.rng)

    def _next_goal(self, controller, semantic_name: str,
                   gt_goals: List[np.ndarray],
                   use_policy: bool,
                   revisit_ok: bool = False) -> np.ndarray:
        goal = controller.sample_navigation_goal({})
        if gt_goals:
            return gt_goals.pop(0)
        if use_policy and self.policy_params is not None:
            return self._policy_goal(semantic_name)
        if revisit_ok and self.config.revisit_exploration:
            site = self._revisit_goal(controller)
            if site is not None:
                return site
            return controller.frontier_navigation_goal({})
        if self.config.frontier_exploration:
            return controller.frontier_navigation_goal({})
        return goal

    # -------------------------------------------------------- phases

    def _explore(self, controller, budget: int, semantic_name: str,
                 update_maps: List[str], gt_goals: List[np.ndarray],
                 use_policy: bool, callback, tracker,
                 revisit_ok: bool = False) -> None:
        num_goals = 0
        while not controller.task.is_done() and num_goals < budget:
            num_goals += 1
            goal = self._next_goal(controller, semantic_name, gt_goals,
                                   use_policy, revisit_ok=revisit_ok)
            for obs in controller.navigate_to(goal,
                                              update_map=update_maps):
                if callback is not None:
                    callback(obs)
                if tracker is not None:
                    loc = controller.task.agent_location()
                    tracker.append(np.asarray([loc.x, loc.z]))

    def _rearrange(self, controller, object_ids_to_move,
                   objects_moved: set, callback, tracker) -> None:
        """Detection/match/fix loop (reference: agent.py:424-527)."""
        cfg = self.config
        task = controller.task
        names = task.action_names()
        fm0 = self.maps.get("feature0")
        fm1 = self.maps.get("feature1")

        while not task.is_done():
            candidates = (object_ids_to_move
                          if cfg.ground_truth_disagreement
                          else range(taxonomy.NUM_CLASSES))
            with self.timer.stage("matching"):
                cls, goals0, goals1 = predict_scene_differences(
                    self.maps["semantic0"].voxel_map,
                    self.maps["semantic1"].voxel_map,
                    fm0.voxel_map if fm0 else None,
                    fm1.voxel_map if fm1 else None,
                    objects_moved, candidates, cfg.match)
            if cls is None or task.is_done():
                return
            objects_moved.add(cls)

            # fix farthest-moved instances first to avoid conflicts
            # (reference: agent.py:454-465)
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

            for goal0, goal1 in zip(goals0, goals1):
                for obs in controller.navigate_to(
                        goal1, update_map=self.phase_two):
                    if callback is not None:
                        callback(obs)
                    if tracker is not None:
                        loc = task.agent_location()
                        tracker.append(np.asarray([loc.x, loc.z]))
                if task.is_done():
                    return
                task.step(names.index(grab))
                if task.is_done():
                    return
                if not pickable:
                    continue
                for obs in controller.navigate_to(
                        goal0, update_map=self.phase_two):
                    if callback is not None:
                        callback(obs)
                    if tracker is not None:
                        loc = task.agent_location()
                        tracker.append(np.asarray([loc.x, loc.z]))
                if task.is_done():
                    return
                task.step(names.index("drop_held_object_with_snap"))
                if task.is_done():
                    return

    # ----------------------------------------------------------- tasks

    def run_task(self, task_id: int) -> Dict:
        if self.config.one_phase:
            return self._run_task_one_phase(task_id)
        cfg = self.config
        self.timer = StageTimer()       # fresh per-task stage timing
        self._revisit_sites = None      # per-task revisit-head state
        self._revisit_used: set = set()
        self._policy_goal_cells = {"semantic0": [], "semantic1": []}
        walkthrough = self.sampler.next_task()

        loc = walkthrough.agent_location()
        self.maps.reset_all((loc.x, loc.z, loc.y))
        controller = NavigationController(
            walkthrough, self.navigation_map, self.maps, cfg.nav,
            rng=self.rng, timer=self.timer)

        writer = (self.video_writer_factory(task_id)
                  if self.video_writer_factory else None)
        callback = self._make_callback(controller, writer) \
            if writer else None

        # the agent behaves better looking down (reference:
        # agent.py:310-312)
        walkthrough.step(walkthrough.action_names().index("look_down"))

        # --- GT prep + analytics (on the episode's pose metadata)
        analytics = self._initial_analytics(walkthrough)
        gt_goals_walk, gt_goals_unshuffle = [], []
        if cfg.ground_truth_semantic_search:
            for cur, target in oracle.scene_difference_positions(
                    walkthrough):
                gt_goals_walk.append(target)
                gt_goals_unshuffle.append(cur)

        walk_track: Optional[List] = ([] if cfg.record_found_objects
                                      else None)
        unshuffle_track: Optional[List] = ([] if cfg.record_found_objects
                                           else None)

        # --- walkthrough exploration
        self._explore(controller, cfg.exploration_budget_one,
                      "semantic0", self.phase_one, gt_goals_walk,
                      cfg.semantic_search_walkthrough, callback,
                      walk_track)

        # --- phase switch
        unshuffle = self.sampler.next_task()
        controller.task = unshuffle
        unshuffle.step(unshuffle.action_names().index("look_down"))

        object_ids_to_move = {
            taxonomy.CLASS_NAMES.index(n)
            for n in oracle.scene_difference_types(unshuffle)}
        print(f"[Task={task_id}] Ground truth: " + ", ".join(
            taxonomy.CLASS_NAMES[i] for i in object_ids_to_move))

        object_positions = np.asarray(
            [p[0][:2] for p in
             oracle.scene_difference_positions(unshuffle)]) \
            if cfg.record_found_objects else np.zeros((0, 2))
        object_types = (list(oracle.scene_difference_types(unshuffle))
                        if cfg.record_found_objects else [])

        # --- unshuffle exploration
        self._explore(controller, cfg.exploration_budget_two,
                      "semantic1", self.phase_two, gt_goals_unshuffle,
                      cfg.semantic_search_unshuffle, callback,
                      unshuffle_track, revisit_ok=True)

        # --- rearrangement
        objects_moved: set = set()
        self._rearrange(controller, object_ids_to_move, objects_moved,
                        callback, unshuffle_track)

        if not unshuffle.is_done():
            unshuffle.step(unshuffle.action_names().index("done"))
        if writer is not None:
            writer.close()

        # --- outputs
        self._final_analytics(unshuffle, analytics)
        results = unshuffle.metrics()
        results["unshuffle/objects_moved"] = [
            taxonomy.CLASS_NAMES[i] for i in objects_moved]
        results["unshuffle/objects_moved_accuracy"] = [
            1 if i in object_ids_to_move else 0 for i in objects_moved]
        results["unshuffle/objects_to_move"] = [
            taxonomy.CLASS_NAMES[i] for i in object_ids_to_move]
        results["unshuffle/objects_to_move_accuracy"] = [
            1 if i in objects_moved else 0 for i in object_ids_to_move]
        # per-phase exploration coverage: each phase's own map (the
        # nav map is the FROZEN walkthrough map in two-phase mode, so
        # counting only it would mislabel unshuffle coverage)
        results["walkthrough/observed_cells"] = \
            controller.observed_cell_count("semantic0")
        results["unshuffle/observed_cells"] = \
            controller.observed_cell_count("semantic1")
        # per-stage wall-time observability (SURVEY.md §5.1 — absent in
        # the reference)
        results["timing"] = self.timer.summary()

        if cfg.logdir:
            M.write_task_metrics(cfg.logdir, task_id, results)
            M.write_analytics(cfg.logdir, task_id, analytics)
            if cfg.record_found_objects:
                M.write_found_objects(cfg.logdir, task_id,
                                      "walkthrough", walk_track or [],
                                      object_positions, object_types)
                M.write_found_objects(cfg.logdir, task_id, "unshuffle",
                                      unshuffle_track or [],
                                      object_positions, object_types)
            if cfg.snapshot_maps:
                M.write_map_snapshots(cfg.logdir, task_id, self.maps)
        return results

    def _run_task_one_phase(self, task_id: int) -> Dict:
        """Single-task episode: both maps build from each step's dual
        (live + goal) render, then rearrangement runs as usual
        (reference capability: OnePhaseSegmentationConfig,
        mass/thor/segmentation_config.py:484-598 — the reference ships
        the config but no agent for it; this is the missing driver)."""
        cfg = self.config
        self.timer = StageTimer()
        self._policy_goal_cells = {"semantic0": [], "semantic1": []}
        task = self.sampler.next_task()

        loc = task.agent_location()
        self.maps.reset_all((loc.x, loc.z, loc.y))
        controller = NavigationController(
            task, self.navigation_map, self.maps, cfg.nav,
            rng=self.rng, timer=self.timer)

        writer = (self.video_writer_factory(task_id)
                  if self.video_writer_factory else None)
        callback = self._make_callback(controller, writer) \
            if writer else None

        task.step(task.action_names().index("look_down"))

        analytics = self._initial_analytics(task)
        gt_goals: List[np.ndarray] = []
        if cfg.ground_truth_semantic_search:
            for cur, target in oracle.scene_difference_positions(task):
                gt_goals.extend([cur, target])

        object_ids_to_move = {
            taxonomy.CLASS_NAMES.index(n)
            for n in oracle.scene_difference_types(task)}
        print(f"[Task={task_id}] Ground truth: " + ", ".join(
            taxonomy.CLASS_NAMES[i] for i in object_ids_to_move))

        track: Optional[List] = ([] if cfg.record_found_objects
                                 else None)
        object_positions = np.asarray(
            [p[0][:2] for p in oracle.scene_difference_positions(task)]
        ) if cfg.record_found_objects else np.zeros((0, 2))
        object_types = (list(oracle.scene_difference_types(task))
                        if cfg.record_found_objects else [])

        # one exploration pass builds BOTH maps (goal maps read the
        # goal render carried in each observation)
        update_maps = self.phase_one + self.phase_two
        self._explore(controller,
                      cfg.exploration_budget_one +
                      cfg.exploration_budget_two,
                      "semantic1", update_maps, gt_goals,
                      cfg.semantic_search_unshuffle, callback, track)

        objects_moved: set = set()
        self._rearrange(controller, object_ids_to_move, objects_moved,
                        callback, track)

        if not task.is_done():
            task.step(task.action_names().index("done"))
        if writer is not None:
            writer.close()

        self._final_analytics(task, analytics)
        results = task.metrics()
        results["unshuffle/objects_moved"] = [
            taxonomy.CLASS_NAMES[i] for i in objects_moved]
        results["unshuffle/objects_moved_accuracy"] = [
            1 if i in object_ids_to_move else 0 for i in objects_moved]
        results["unshuffle/objects_to_move"] = [
            taxonomy.CLASS_NAMES[i] for i in object_ids_to_move]
        results["unshuffle/objects_to_move_accuracy"] = [
            1 if i in objects_moved else 0 for i in object_ids_to_move]
        results["walkthrough/observed_cells"] = \
            controller.observed_cell_count("semantic0")
        results["unshuffle/observed_cells"] = \
            controller.observed_cell_count("semantic1")
        results["timing"] = self.timer.summary()

        if cfg.logdir:
            M.write_task_metrics(cfg.logdir, task_id, results)
            M.write_analytics(cfg.logdir, task_id, analytics)
            if cfg.record_found_objects:
                M.write_found_objects(cfg.logdir, task_id, "unshuffle",
                                      track or [], object_positions,
                                      object_types)
            if cfg.snapshot_maps:
                M.write_map_snapshots(cfg.logdir, task_id, self.maps)
        return results

    def run(self) -> List[Dict]:
        """Run the configured task range, advancing the config cursor so
        crash restarts resume after completed tasks (reference:
        agent.py:657-662)."""
        cfg = self.config
        if cfg.logdir:
            os.makedirs(os.path.join(cfg.logdir, "results"),
                        exist_ok=True)
            os.makedirs(os.path.join(cfg.logdir, "videos"),
                        exist_ok=True)
        all_metrics = []
        while cfg.total_tasks > 0:
            task_id = cfg.start_task
            if (cfg.resume and cfg.logdir and os.path.exists(
                    os.path.join(cfg.logdir, "results",
                                 f"{task_id}.json"))):
                # cross-process resume: the task's results are already
                # on disk — skip its episode in the sampler so later
                # tasks see the same seed cursor as a fresh run
                self.sampler.skip_task()
            else:
                all_metrics.append(self.run_task(task_id))
            for _ in range(cfg.every_tasks - 1):
                self.sampler.skip_task()
            object.__setattr__(cfg, "start_task",
                               cfg.start_task + cfg.every_tasks)
            object.__setattr__(cfg, "total_tasks", cfg.total_tasks - 1)
        return all_metrics

    # ------------------------------------------------------- analytics

    @staticmethod
    def _initial_analytics(task) -> List[Dict]:
        start, goal, current = task.env.poses
        pick = set(taxonomy.PICKABLE_TO_COLOR)
        openb = set(taxonomy.OPENABLE_TO_COLOR)
        return [M.object_analytics_record(
            c, g, current, task.env.are_poses_equal, pick, openb,
            "initial") for c, g in zip(start, goal)]

    @staticmethod
    def _final_analytics(task, records: List[Dict]) -> None:
        start, goal, current = task.env.poses
        pick = set(taxonomy.PICKABLE_TO_COLOR)
        openb = set(taxonomy.OPENABLE_TO_COLOR)
        for rec, c, g in zip(records, current, goal):
            rec.update(M.object_analytics_record(
                c, g, current, task.env.are_poses_equal, pick, openb,
                "final"))
        counts: Dict[str, int] = {}
        for rec in records:
            counts[rec["type"]] = counts.get(rec["type"], 0) + 1
        for rec in records:
            rec["num_instances"] = counts[rec["type"]]

    # ----------------------------------------------------------- video

    def _make_callback(self, controller, writer):
        def callback(obs):
            occ = self.maps[self.navigation_map].voxel_map
            cell = np.asarray(occ.world_to_map(
                jnp.asarray(obs["position"], jnp.float32)))
            path_cells = None
            if "path" in obs:
                path_cells = np.asarray(occ.world_to_map(
                    jnp.asarray(obs["path"], jnp.float32)))
            cfg = self.config
            frame = viz.episode_frame(
                np.asarray(obs["rgb"], np.float32),
                viz.render_occupancy(
                    occ, cell, obs.get("yaw", 0.0), path_cells,
                    cfg.nav.map_slice_start, cfg.nav.map_slice_stop),
                viz.render_semantic(
                    self.maps["semantic0"].voxel_map, 0,
                    cfg.nav.map_slice_stop),
                viz.render_semantic(
                    self.maps["semantic1"].voxel_map, 0,
                    cfg.nav.map_slice_stop))
            writer.write((frame * 255).astype(np.uint8))
        return callback
