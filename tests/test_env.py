"""Grid-world environment tests: rendering, physics, phases, metrics."""

import numpy as np

from mass_tpu import taxonomy
from mass_tpu.config import CameraConfig
from mass_tpu.env.gridworld import GridWorld, ObjectInstance
from mass_tpu.env.protocol import AgentPose
from mass_tpu.env import rearrange as RR

CAM = CameraConfig(height=48, width=48)


def _simple_world():
    w = GridWorld((6.0, 2.5, 6.0))
    w.objects.append(ObjectInstance(
        name="Mug_0", class_id=taxonomy.class_id("Mug"),
        position=np.asarray([3.0, 0.0, 4.0]),
        size=np.asarray([0.4, 0.4, 0.4])))
    return w


def test_render_shapes_and_depth_sanity():
    w = _simple_world()
    pose = AgentPose(x=3.0, y=0.0, z=1.0, rotation_degrees=0.0,
                     horizon_degrees=0.0)
    rgb, depth, sem = w.render(CAM, pose)
    assert rgb.shape == (48, 48, 3) and depth.shape == (48, 48, 1)
    assert sem.shape == (48, 48, 1)
    # facing +z: far wall at z=6 -> planar depth 5 at the centre row
    centre = depth[24, 24, 0]
    assert 2.0 < centre <= 5.01
    # the mug (at z=4, x=3, dead ahead) appears in the semantic image
    assert (sem == taxonomy.class_id("Mug")).any()
    # walls/floor are OccupiedSpace
    assert (sem == 0).any()


def test_move_and_collision():
    ep = RR.generate_episode(0, num_objects=3, num_misplaced=1,
                             num_opened=0, camera=CAM)
    phase = RR.Phase(ep, walkthrough=True)
    names = phase.action_names()
    r = phase.step(names.index("rotate_left"))
    assert r.action_success
    # walk forward into a wall eventually fails
    successes = [phase.step(names.index("move_ahead")).action_success
                 for _ in range(40)]
    assert not successes[-1]


def test_pickup_and_snap_drop_fixes_object():
    ep = RR.generate_episode(3, num_objects=4, num_misplaced=2,
                             num_opened=0, camera=CAM)
    start, goal, _ = ep.env.poses
    moved = [i for i, (s, g) in enumerate(zip(start, goal))
             if not RR.are_poses_equal(s, g)]
    assert moved
    idx = moved[0]
    obj = ep.world.objects[idx]
    cls = obj.class_id

    phase = RR.Phase(ep, walkthrough=False)
    names = phase.action_names()
    # teleport next to the object, pick it up
    ep.pose.x, ep.pose.z = float(obj.position[0] + 0.5), \
        float(obj.position[2])
    act = names.index(
        f"pickup_{RR.snake_case(taxonomy.CLASS_NAMES[cls])}")
    assert phase.step(act).action_success
    assert ep.held is not None
    # teleport near the goal pose and snap-drop
    gobj = ep.goal_world.objects[idx]
    ep.pose.x, ep.pose.z = float(gobj.position[0] + 0.3), \
        float(gobj.position[2])
    assert phase.step(
        names.index("drop_held_object_with_snap")).action_success
    _, _, current = ep.env.poses
    assert RR.are_poses_equal(current[idx], goal[idx])
    m = phase.metrics()
    assert m["unshuffle/num_fixed"] >= 1


def test_open_by_type():
    ep = RR.generate_episode(5, num_objects=2, num_misplaced=0,
                             num_opened=1, camera=CAM)
    start, goal, _ = ep.env.poses
    opened = [i for i, (s, g) in enumerate(zip(start, goal))
              if not RR.are_poses_equal(s, g)]
    assert opened
    idx = opened[0]
    obj = ep.world.objects[idx]
    phase = RR.Phase(ep, walkthrough=False)
    names = phase.action_names()
    ep.pose.x, ep.pose.z = float(obj.position[0] + 0.6), \
        float(obj.position[2])
    act = names.index(
        f"open_by_type_{RR.snake_case(taxonomy.CLASS_NAMES[obj.class_id])}")
    assert phase.step(act).action_success
    assert phase.metrics()["unshuffle/num_misplaced"] == 0


def test_metrics_initial_state():
    ep = RR.generate_episode(7, num_objects=5, num_misplaced=2,
                             num_opened=1, camera=CAM)
    phase = RR.Phase(ep, walkthrough=False)
    m = phase.metrics()
    assert m["unshuffle/num_initially_misplaced"] >= 2
    assert m["unshuffle/prop_fixed_strict"] == 0.0
    assert m["unshuffle/success"] == 0.0


def test_episode_room_size():
    # --room-size plumbs through to the world and the object sampler
    # (bigger rooms = the exploration-scarcity regime).
    ep = RR.generate_episode(0, num_objects=4, num_misplaced=2,
                             num_opened=0, room=(12.0, 2.5, 12.0),
                             camera=CAM)
    assert tuple(ep.world.room_size) == (12.0, 2.5, 12.0)
    pos = np.array([o.position for o in ep.world.objects])
    xz = pos[:, [0, 2]]
    assert xz.min() >= 0.8 and xz.max() <= 12.0 - 0.8
    # seed 0 places objects beyond the default 6 m room's bounds
    assert xz.max() > 6.0


def test_sampler_alternates_phases():
    sampler = RR.GridWorldTaskSampler([0, 1], camera=CAM)
    t1 = sampler.next_task()
    t2 = sampler.next_task()
    t3 = sampler.next_task()
    assert t1.walkthrough and not t2.walkthrough and t3.walkthrough
    assert t1.episode is t2.episode and t3.episode is not t1.episode


def test_one_phase_mode():
    sampler = RR.GridWorldTaskSampler([3, 4], camera=CAM,
                                      one_phase=True, num_objects=3,
                                      num_misplaced=2, num_opened=0)
    t1 = sampler.next_task()
    assert not t1.walkthrough and t1.one_phase
    obs = t1.get_observations()
    assert "goal_semantic" in obs and "goal_depth" in obs
    assert obs["goal_semantic"].shape == obs["semantic"].shape
    # some viewpoint shows the displaced objects: scan the room
    names = t1.action_names()
    t1.step(names.index("look_down"))
    differs = False
    for _ in range(4):
        obs = t1.get_observations()
        differs |= bool((obs["goal_semantic"] != obs["semantic"]).any())
        t1.step(names.index("rotate_left"))
    assert differs
    t2 = sampler.next_task()
    assert t2.episode is not t1.episode  # one task per episode


def test_instance_tint_renders_rgb_not_semantic():
    """Two same-class instances with different tints must differ in RGB
    but be identical in the semantic channel (appearance is the only
    cross-instance signal, as for THOR materials)."""
    w = GridWorld((6.0, 2.5, 6.0))
    cls = taxonomy.class_id("Mug")
    for i, (x, tint) in enumerate(((2.0, 0.3), (4.0, 1.0))):
        w.objects.append(ObjectInstance(
            name=f"Mug_{i}", class_id=cls,
            position=np.asarray([x, 0.0, 4.0]),
            size=np.asarray([0.5, 0.6, 0.5]),
            tint=np.full(3, tint, np.float32)))
    pose = AgentPose(x=3.0, y=0.0, z=1.0, rotation_degrees=0.0,
                     horizon_degrees=30.0)
    rgb, _, semantic = w.render(CAM, pose)
    m0 = (semantic[..., 0] == cls) & (rgb.sum(-1) > 0)
    assert m0.any()
    # pixels of the two instances: left half vs right half of the image
    left = m0[:, :CAM.width // 2]
    right = m0[:, CAM.width // 2:]
    assert left.any() and right.any()
    lum_l = rgb[:, :CAM.width // 2][left].mean()
    lum_r = rgb[:, CAM.width // 2:][right].mean()
    assert abs(lum_l - lum_r) > 0.05      # appearance differs
    # cloning preserves tints
    w2 = w.clone()
    rgb2, _, _ = w2.render(CAM, pose)
    np.testing.assert_allclose(rgb2, rgb)


def test_duplicate_class_pairs_episode():
    """duplicate_class_pairs adds same-class same-size tinted pairs with
    exactly one member misplaced (the size-matching-ambiguous scenario
    for --use-feature-matching)."""
    ep = RR.generate_episode(5, num_objects=2, num_misplaced=1,
                             num_opened=0, camera=CAM,
                             duplicate_class_pairs=1)
    goal, start = ep.goal_world, ep.world
    dups_g = [o for o in goal.objects if "_dup" in o.name]
    dups_s = [o for o in start.objects if "_dup" in o.name]
    assert len(dups_g) == 2 and len(dups_s) == 2
    assert dups_g[0].class_id == dups_g[1].class_id
    np.testing.assert_allclose(dups_g[0].size, dups_g[1].size)
    assert abs(dups_g[0].tint[0] - dups_g[1].tint[0]) > 0.3
    moved = [not np.allclose(g.position, s.position)
             for g, s in zip(dups_g, dups_s)]
    assert sum(moved) == 1


# ------------------------------------------------------- multi-room


def _flood_reachable_fraction(world, res=0.1):
    """Fraction of free cells reachable from the first free cell."""
    from collections import deque
    sx, _, sz = world.room_size
    nx, nz = int(sx / res), int(sz / res)
    free = np.zeros((nx, nz), bool)
    for i in range(nx):
        for j in range(nz):
            free[i, j] = not world.blocked(
                (i + .5) * res, (j + .5) * res, agent_radius=0.2)
    seed = tuple(np.argwhere(free)[0])
    seen = {seed}
    q = deque([seed])
    while q:
        i, j = q.popleft()
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            n = (i + di, j + dj)
            if (0 <= n[0] < nx and 0 <= n[1] < nz and free[n]
                    and n not in seen):
                seen.add(n)
                q.append(n)
    return len(seen) / free.sum()


def test_interior_walls_block_and_render():
    """An interior wall occludes and collides like the perimeter."""
    w = GridWorld((6.0, 2.5, 6.0),
                  walls=[(np.asarray([2.95, 0.0, 0.0]),
                          np.asarray([3.05, 2.5, 6.0]))])
    # collision: the wall line is blocked, either side is free
    assert w.blocked(3.0, 3.0)
    assert not w.blocked(1.5, 3.0) and not w.blocked(4.5, 3.0)
    # render: looking +x from the left half, every ray that would reach
    # the far perimeter (x=6) stops at the wall (depth ~1.5, class 0)
    pose = AgentPose(x=1.5, y=0.0, z=3.0, rotation_degrees=90.0,
                     horizon_degrees=0.0)
    rgb, depth, sem = w.render(CAM, pose)
    center = depth[CAM.height // 2, CAM.width // 2, 0]
    assert 1.3 < center < 1.7, center
    assert sem[CAM.height // 2, CAM.width // 2, 0] == 0


def test_multiroom_episode_connected_and_clear():
    """Every generated layout stays fully connected through doorways,
    objects keep out of door gaps, and walls are shared across the
    phase worlds."""
    for seed in range(6):
        for num_rooms in (2, 3, 4):
            ep = RR.generate_episode(
                seed, num_objects=3, num_misplaced=2, num_opened=0,
                room=(8.0, 2.5, 8.0), camera=CAM, num_rooms=num_rooms)
            w = ep.goal_world
            assert len(w.walls) >= 2 * (num_rooms - 1)
            assert _flood_reachable_fraction(w) > 0.95
            # same walls in both phases (clone copies them)
            assert len(ep.start_world.walls) == len(w.walls)
            # objects placed clear of walls and doorways
            for obj in w.objects:
                assert not any(
                    lo[0] - 0.2 <= obj.position[0] <= hi[0] + 0.2 and
                    lo[2] - 0.2 <= obj.position[2] <= hi[2] + 0.2
                    for lo, hi in w.walls), (seed, num_rooms, obj.name)


def test_single_room_has_no_walls():
    ep = RR.generate_episode(0, num_objects=2, num_misplaced=1,
                             num_opened=0, camera=CAM, num_rooms=1)
    assert ep.goal_world.walls == []
