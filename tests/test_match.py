"""Tests for instance finding and cross-phase matching."""

import numpy as np
import jax.numpy as jnp

from mass_tpu.config import MapGeometry, MatchConfig
from mass_tpu.core.voxelmap import VoxelMap
from mass_tpu.match.find import find_class_instances
from mass_tpu.match.differences import predict_scene_differences
from mass_tpu import taxonomy

GEO = MapGeometry(map_height=32, map_width=40, map_depth=8,
                  feature_size=54, grid_resolution=0.1)
ORIGIN = (0.0, 0.0, 0.0)


def _map_with_blobs(blobs, feature_size=54):
    """blobs: list of (class_id, y0, y1, x0, x1, z0, z1, prob)."""
    geo = GEO if feature_size == 54 else \
        MapGeometry(GEO.map_height, GEO.map_width, GEO.map_depth,
                    feature_size, GEO.grid_resolution)
    vm = VoxelMap.create(geo, ORIGIN)
    grid = np.zeros((geo.map_height, geo.map_width, geo.map_depth,
                     feature_size), np.float32)
    for c, y0, y1, x0, x1, z0, z1, p in blobs:
        grid[y0:y1, x0:x1, z0:z1, c] = p
    return vm.with_grid(jnp.asarray(grid))


def _ref_find(grid, cls, conf_th=0.0, pad=0, cth=0.0):
    """Numpy oracle of the reference find() ROI semantics for maps whose
    blobs are axis-aligned boxes (bbox == component bbox)."""
    import scipy.ndimage as ndi
    mask = grid[..., cls]
    foot = (mask > cth).any(-1)
    labels, n = ndi.label(foot, structure=np.ones((3, 3)))
    outs = []
    for k in range(1, n + 1):
        ys, xs = np.nonzero(labels == k)
        y0, y1, x0, x1 = ys.min(), ys.max(), xs.min(), xs.max()
        roi = mask[y0:y1 + 1, x0:x1 + 1]
        s = roi.sum()
        conf = (roi * roi).sum() / (s + 1e-9)
        if conf > conf_th:
            outs.append((conf, s))
    return sorted(outs, key=lambda t: -t[1])


def test_find_single_blob_stats():
    vm = _map_with_blobs([(3, 10, 14, 20, 26, 2, 5, 0.8)])
    out = find_class_instances(vm, 3, contour_padding=0,
                               confidence_threshold=0.0)
    present = np.asarray(out.present)
    assert present[0] and not present[1:].any()
    # confidence = sum m^2 / sum m = 0.8 for a constant blob
    np.testing.assert_allclose(float(out.confidence[0]), 0.8, atol=1e-5)
    # size = 4*6*3*0.8
    np.testing.assert_allclose(float(out.size[0]), 4 * 6 * 3 * 0.8,
                               rtol=1e-5)
    # expected position = world coords of the blob centroid
    pos = np.asarray(out.position[0])
    cy, cx, cz = (10 + 13) / 2, (20 + 25) / 2, (2 + 4) / 2
    expect = np.asarray(vm.map_to_world(
        jnp.asarray([cx, cy, cz], jnp.float32)))
    np.testing.assert_allclose(pos, expect, atol=1e-4)


def test_find_matches_numpy_oracle_two_blobs():
    vm = _map_with_blobs([(7, 2, 6, 2, 8, 1, 4, 0.6),
                          (7, 20, 30, 25, 35, 0, 6, 0.9)])
    out = find_class_instances(vm, 7, contour_padding=0,
                               confidence_threshold=0.0)
    got = [(float(c), float(s)) for p, c, s in
           zip(np.asarray(out.present), np.asarray(out.confidence),
               np.asarray(out.size)) if p]
    ref = _ref_find(np.asarray(vm.grid()), 7)
    assert len(got) == len(ref) == 2
    for (gc, gs), (rc, rs) in zip(got, ref):
        np.testing.assert_allclose(gc, rc, rtol=1e-4)
        np.testing.assert_allclose(gs, rs, rtol=1e-4)


def test_find_absent_class():
    vm = _map_with_blobs([(3, 10, 14, 20, 26, 2, 5, 0.8)])
    out = find_class_instances(vm, 9, contour_padding=0)
    assert not np.asarray(out.present).any()


def _pickable_cls():
    return taxonomy.ID_TO_PICKABLE.index(True)


def _openable_cls():
    return taxonomy.ID_TO_OPENABLE.index(True)


def test_predict_differences_moved_object():
    cls = _pickable_cls()
    m0 = _map_with_blobs([(cls, 4, 8, 4, 8, 2, 4, 0.9)])
    m1 = _map_with_blobs([(cls, 20, 24, 30, 34, 2, 4, 0.9)])
    cfg = MatchConfig(contour_padding=0, distance_threshold=0.05)
    got, g0, g1 = predict_scene_differences(
        m0, m1, None, None, set(), range(taxonomy.NUM_CLASSES), cfg)
    assert got == cls
    assert len(g0) == len(g1) == 1
    # goal0 near the walkthrough blob, goal1 near the unshuffle blob
    c0 = np.asarray(m0.map_to_world(jnp.asarray([5.5, 5.5, 2.5])))
    c1 = np.asarray(m1.map_to_world(jnp.asarray([31.5, 21.5, 2.5])))
    np.testing.assert_allclose(g0[0], c0, atol=0.1)
    np.testing.assert_allclose(g1[0], c1, atol=0.1)


def test_predict_differences_unmoved_is_none():
    cls = _pickable_cls()
    blob = [(cls, 4, 8, 4, 8, 2, 4, 0.9)]
    cfg = MatchConfig(contour_padding=0, distance_threshold=0.05)
    got, g0, g1 = predict_scene_differences(
        _map_with_blobs(blob), _map_with_blobs(blob), None, None,
        set(), range(taxonomy.NUM_CLASSES), cfg)
    assert got is None and not g0 and not g1


def test_predict_differences_respects_moved_set():
    cls = _pickable_cls()
    m0 = _map_with_blobs([(cls, 4, 8, 4, 8, 2, 4, 0.9)])
    m1 = _map_with_blobs([(cls, 20, 24, 30, 34, 2, 4, 0.9)])
    cfg = MatchConfig(contour_padding=0)
    got, _, _ = predict_scene_differences(
        m0, m1, None, None, {cls}, range(taxonomy.NUM_CLASSES), cfg)
    assert got is None


def test_predict_differences_openable_selected_even_unmoved():
    cls = _openable_cls()
    blob = [(cls, 4, 8, 4, 8, 2, 4, 0.9)]
    cfg = MatchConfig(contour_padding=0)
    got, g0, g1 = predict_scene_differences(
        _map_with_blobs(blob), _map_with_blobs(blob), None, None,
        set(), range(taxonomy.NUM_CLASSES), cfg)
    assert got == cls and len(g0) == 1


def test_feature_matching_pairs_by_features():
    """Two same-class instances swap positions between phases; pooled
    feature vectors must drive the pairing (the --use-feature-matching
    behavior)."""
    cls = _pickable_cls()
    a, b = (4, 8, 4, 8), (20, 24, 30, 34)
    m0 = _map_with_blobs([(cls, *a, 2, 4, 0.9), (cls, *b, 2, 4, 0.9)])
    m1 = _map_with_blobs([(cls, *a, 2, 4, 0.9), (cls, *b, 2, 4, 0.9)])
    # feature maps: channel 0 at region a / channel 1 at region b in the
    # walkthrough; swapped in the unshuffle -> objects traded places
    fgeo = 128
    f0 = _map_with_blobs([(0, *a, 2, 4, 1.0), (1, *b, 2, 4, 1.0)],
                         feature_size=fgeo)
    f1 = _map_with_blobs([(1, *a, 2, 4, 1.0), (0, *b, 2, 4, 1.0)],
                         feature_size=fgeo)
    cfg = MatchConfig(contour_padding=0, distance_threshold=0.05)
    got, g0, g1 = predict_scene_differences(
        m0, m1, f0, f1, set(), range(taxonomy.NUM_CLASSES), cfg)
    assert got == cls and len(g0) == 2
    # each pair's endpoints are the two different regions (objects moved
    # a->b and b->a)
    for p0, p1 in zip(g0, g1):
        assert np.linalg.norm(np.asarray(p0) - np.asarray(p1)) > 0.5


def test_instance_cap_escalates_beyond_16():
    """A class with more blobs than max_instances: find() flags the
    truncation, and predict_scene_differences auto-escalates K so the
    moved instance is still paired (the reference's cv2-contours path
    is unbounded — semantic_projection_layer.py:323-328)."""
    cls = taxonomy.class_id("Mug")
    # 20 separated 2x2 blobs on a 32x40 footprint (grid spacing 6/8)
    blobs = []
    positions = [(y, x) for y in range(2, 30, 6) for x in
                 range(2, 38, 8)][:20]
    # distinct per-blob mass so size-based pairing is identifiable
    for i, (y, x) in enumerate(positions):
        blobs.append((cls, y, y + 2, x, x + 2, 0, 4, 0.5 + 0.02 * i))
    vm0 = _map_with_blobs(blobs)

    # cap smaller than the blob count -> truncated flag
    r = find_class_instances(vm0, jnp.int32(cls), max_instances=8,
                             contour_padding=0)
    assert bool(r.truncated)
    assert int(r.present.sum()) == 8
    # escalated K finds every blob
    r = find_class_instances(vm0, jnp.int32(cls), max_instances=32,
                             contour_padding=0)
    assert not bool(r.truncated)
    assert int(r.present.sum()) == 20

    # unshuffle map: one blob moved to a fresh spot
    moved = list(blobs)
    moved[5] = (cls, 25, 27, 33, 35, 0, 4, 0.5 + 0.02 * 5)
    vm1 = _map_with_blobs(moved)
    cfg = MatchConfig(distance_threshold=0.05, max_instances=8,
                      contour_padding=0)
    got, goals0, goals1 = predict_scene_differences(
        vm0, vm1, None, None, set(), [cls], cfg)
    assert got == cls
    # exactly the one moved instance pairs above threshold, at the
    # right positions (start of blob 5 -> its new spot)
    assert len(goals0) == 1 and len(goals1) == 1
    d = np.linalg.norm(np.asarray(goals0[0])[:2] -
                       np.asarray(goals1[0])[:2])
    assert d > 0.5


def test_revisit_sites_and_pick():
    """walkthrough_sites returns every localized instance's world
    position; pick_site draws each exactly once then signals
    exhaustion (match/revisit.py)."""
    from mass_tpu.match import revisit

    blobs = [(3, 10, 14, 20, 26, 2, 5, 0.8),
             (7, 2, 5, 3, 6, 0, 3, 0.6),
             (7, 25, 28, 30, 34, 1, 4, 0.6),
             # structure mass (class 0, OccupiedSpace): never a site —
             # the matcher cannot act on it (match/differences.py)
             (0, 0, 32, 0, 2, 0, 8, 1.0)]
    vm = _map_with_blobs(blobs)
    cfg = MatchConfig(max_instances=8)
    sites = revisit.walkthrough_sites(vm, cfg)
    assert sites.shape == (3, 3)
    blobs = blobs[:3]
    # each blob's centroid world position appears exactly once
    expect = []
    for c, y0, y1, x0, x1, z0, z1, p in blobs:
        cy, cx, cz = (y0 + y1 - 1) / 2, (x0 + x1 - 1) / 2, \
            (z0 + z1 - 1) / 2
        expect.append(np.asarray(vm.map_to_world(
            jnp.asarray([cx, cy, cz], jnp.float32))))
    for e in expect:
        d = np.linalg.norm(sites - e[None], axis=-1)
        assert d.min() < 1e-3
    # pick_site: permutation without replacement, then None
    rng = np.random.RandomState(0)
    used: set = set()
    picks = [revisit.pick_site(sites, used, rng) for _ in range(4)]
    assert picks[3] is None
    got = np.sort(np.stack(picks[:3])[:, 0])
    assert np.allclose(got, np.sort(sites[:, 0]))
