"""Cross-phase map differencing and instance matching.

Decides which object class to rearrange next and pairs its instances
between the walkthrough map (goal state) and the unshuffle map (current
state), reproducing the reference's matcher (reference:
mass/utils/experimentation.py:169-313):

  * per candidate class, localize instances in both maps;
  * pairwise deformation = L2 between pooled feature vectors when
    feature matching is enabled, else |voxel-mass difference|;
  * pairwise distance = L2 between expected world positions;
  * minimum-cost bipartite matching on deformation (pickable classes)
    or distance (openable);
  * keep pairs that moved beyond ``distance_threshold`` (pickable) or
    any pair (openable); the first candidate class with kept pairs wins.

Structure on TPU: one jitted all-classes ``find`` narrows candidates to
the few classes detected in BOTH maps; each survivor gets one jitted
match step (instance stats + cost matrices + Hungarian).  The
class-priority walk is host-side (it is inherently sequential and
O(#classes) tiny).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mass_tpu import taxonomy
from mass_tpu.config import MatchConfig
from mass_tpu.core.voxelmap import VoxelMap
from mass_tpu.match.find import (find_all_classes,
                                 find_all_classes_pair,
                                 find_class_instances)
from mass_tpu.ops.hungarian import linear_sum_assignment


@functools.partial(jax.jit, static_argnames=(
    "confidence_threshold", "contour_padding", "contour_threshold",
    "max_instances"))
def _detect_all(vm0: VoxelMap, vm1: VoxelMap, confidence_threshold,
                contour_padding, contour_threshold, max_instances):
    kw = dict(confidence_threshold=confidence_threshold,
              contour_padding=contour_padding,
              contour_threshold=contour_threshold,
              max_instances=max_instances)
    f0, f1 = find_all_classes_pair(vm0, vm1, **kw)
    return (jnp.any(f0.present, -1) & jnp.any(f1.present, -1),
            f0, f1)


@functools.partial(jax.jit, static_argnames=(
    "use_features", "confidence_threshold", "contour_padding",
    "contour_threshold", "max_instances"))
def _match_class(vm0: VoxelMap, vm1: VoxelMap,
                 fm0: Optional[VoxelMap], fm1: Optional[VoxelMap],
                 class_id, pickable, use_features,
                 confidence_threshold, contour_padding,
                 contour_threshold, max_instances):
    kw = dict(confidence_threshold=confidence_threshold,
              contour_padding=contour_padding,
              contour_threshold=contour_threshold,
              max_instances=max_instances)
    r0 = find_class_instances(vm0, class_id,
                              feature_map=fm0 if use_features else None,
                              **kw)
    r1 = find_class_instances(vm1, class_id,
                              feature_map=fm1 if use_features else None,
                              **kw)

    pair_ok = r0.present[:, None] & r1.present[None, :]
    if use_features:
        deform = jnp.linalg.norm(
            r0.features[:, None] - r1.features[None, :], axis=-1)
    else:
        deform = jnp.abs(r0.size[:, None] - r1.size[None, :])
    distance = jnp.linalg.norm(
        r0.position[:, None] - r1.position[None, :], axis=-1)

    raw = jnp.where(pickable, deform, distance)
    # absent pairs get a cost just above the real range (a huge constant
    # would drown real-cost differences in the solver's f32 duals); the
    # optimum then maximizes real-real pairings and matches scipy on the
    # real submatrix
    big = jnp.max(jnp.where(pair_ok, raw, 0.0)) + 1.0
    cost = jnp.where(pair_ok, raw, big)
    col = linear_sum_assignment(cost)
    safe_col = jnp.maximum(col, 0)
    pair_real = jnp.take_along_axis(pair_ok, safe_col[:, None],
                                    axis=1)[:, 0]
    matched = (col >= 0) & pair_real
    dist_m = jnp.take_along_axis(
        distance, safe_col[:, None], axis=1)[:, 0]
    goals1 = jnp.take_along_axis(
        r1.position, safe_col[:, None], axis=0)
    trunc = r0.truncated | r1.truncated
    return matched, dist_m, r0.position, goals1, trunc


def predict_scene_differences(
        semantic_map0: VoxelMap, semantic_map1: VoxelMap,
        feature_map0: Optional[VoxelMap], feature_map1: Optional[VoxelMap],
        objects_moved: Set[int], candidate_classes: Sequence[int],
        config: MatchConfig = MatchConfig(),
) -> Tuple[Optional[int], List[np.ndarray], List[np.ndarray]]:
    """Pick the next class to rearrange and its paired goal positions.

    Returns ``(class_id | None, goals0, goals1)`` where ``goals0`` are
    walkthrough-phase (target) world positions and ``goals1`` the
    corresponding unshuffle-phase (current) positions (reference:
    mass/utils/experimentation.py:230-313).
    """
    kw = dict(confidence_threshold=config.confidence_threshold,
              contour_padding=config.contour_padding,
              contour_threshold=config.contour_threshold,
              max_instances=config.max_instances)
    both, f0, f1 = _detect_all(semantic_map0, semantic_map1, **kw)
    both = np.asarray(both)
    truncated = np.asarray(f0.truncated) | np.asarray(f1.truncated)
    if truncated.any():
        # presence detection is cap-safe (needs >= 1 blob); per-class
        # matching below auto-escalates K, so this is informational
        names = [taxonomy.CLASS_NAMES[i]
                 for i in np.nonzero(truncated)[0]]
        print(f"[match] max_instances={config.max_instances} cap bound "
              f"in sweep for: {', '.join(names)} (per-class match "
              f"escalates)")

    use_features = feature_map0 is not None and feature_map1 is not None
    for cls in candidate_classes:
        pickable = taxonomy.ID_TO_PICKABLE[cls]
        openable = taxonomy.ID_TO_OPENABLE[cls]
        if cls in objects_moved or not (pickable or openable):
            continue
        if not both[cls]:
            continue

        # adaptive instance cap: the reference's cv2-contours path is
        # unbounded (semantic_projection_layer.py:323-328); when the
        # fixed-K labelling reports the cap bound, re-run this class
        # with doubled K until every blob is represented (each K is one
        # extra cached executable — the escalation set is tiny)
        mkw = dict(kw)
        while True:
            matched, dist, pos0, goals1, trunc = _match_class(
                semantic_map0, semantic_map1, feature_map0,
                feature_map1, cls, pickable, use_features, **mkw)
            if not bool(trunc) or mkw["max_instances"] >= 256:
                break
            mkw["max_instances"] *= 2
            print(f"[match] {taxonomy.CLASS_NAMES[cls]}: cap bound, "
                  f"retrying with max_instances="
                  f"{mkw['max_instances']}")
        matched = np.asarray(matched)
        dist = np.asarray(dist)
        pos0 = np.asarray(pos0)
        goals1 = np.asarray(goals1)

        goals_a, goals_b = [], []
        for i in range(matched.shape[0]):
            if not matched[i]:
                continue
            move = pickable and dist[i] > config.distance_threshold
            if move or openable:
                goals_a.append(pos0[i])
                goals_b.append(goals1[i])
        if goals_a:
            return cls, goals_a, goals_b
    return None, [], []
