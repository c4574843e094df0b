"""Tests for pooling, connected components, and Hungarian assignment."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mass_tpu.ops.pool import avg_pool3d_same, max_pool2d_same
from mass_tpu.ops.components import extract_instances, label_components
from mass_tpu.ops.hungarian import linear_sum_assignment


# ---------------------------------------------------------------- pool

def test_avg_pool3d_matches_torch_semantics():
    import torch
    import torch.nn.functional as tF
    rng = np.random.RandomState(0)
    x = rng.rand(9, 11, 7).astype(np.float32)
    for radius in (1, 2):
        out = np.asarray(avg_pool3d_same(jnp.asarray(x), radius))
        ref = tF.avg_pool3d(torch.from_numpy(x)[None, None],
                            2 * radius + 1, stride=1, padding=radius,
                            count_include_pad=True)[0, 0].numpy()
        np.testing.assert_allclose(out, ref, atol=1e-6)


def test_max_pool2d_matches_torch_semantics():
    import torch
    import torch.nn.functional as tF
    rng = np.random.RandomState(1)
    x = rng.rand(13, 8).astype(np.float32)
    for radius in (1, 3):
        out = np.asarray(max_pool2d_same(jnp.asarray(x), radius))
        ref = tF.max_pool2d(torch.from_numpy(x)[None, None],
                            2 * radius + 1, stride=1,
                            padding=radius)[0, 0].numpy()
        np.testing.assert_allclose(out, ref, atol=1e-6)


# ---------------------------------------------------------- components

def _blob_mask():
    m = np.zeros((16, 20), bool)
    m[2:5, 2:6] = True           # blob A (12 px)
    m[9:14, 10:16] = True        # blob B (30 px)
    m[1, 18] = True              # single pixel C
    m[5, 6] = True               # diagonal-touching extension of A
    return m


def test_label_components_merges_diagonals():
    m = _blob_mask()
    labels = np.asarray(label_components(jnp.asarray(m)))
    assert (labels > 0).sum() == m.sum()
    # diagonal pixel joins blob A (8-connectivity)
    assert labels[5, 6] == labels[4, 5]
    uniq = set(labels[m].tolist())
    assert len(uniq) == 3


def test_extract_instances_boxes_and_order():
    m = _blob_mask()
    inst = jax.jit(lambda x: extract_instances(x, 4))(jnp.asarray(m))
    present = np.asarray(inst.present)
    boxes = np.asarray(inst.boxes)
    assert present.tolist() == [True, True, True, False]
    # largest first: blob B (30px) box = (10, 9, 6, 5)
    assert boxes[0].tolist() == [10, 9, 6, 5]
    # blob A + diagonal pixel: x in [2,6], y in [2,5]
    assert boxes[1].tolist() == [2, 2, 5, 4]
    assert boxes[2].tolist() == [18, 1, 1, 1]
    # roi mask of instance 0 covers the full rectangle
    roi0 = np.asarray(inst.roi[0])
    assert roi0.sum() == 6 * 5


def test_extract_instances_empty():
    inst = extract_instances(jnp.zeros((8, 8), bool), 3)
    assert not np.asarray(inst.present).any()
    assert not bool(inst.truncated)


def test_extract_instances_truncation_flag():
    m = _blob_mask()                      # 3 components
    assert not bool(extract_instances(jnp.asarray(m), 3).truncated)
    capped = extract_instances(jnp.asarray(m), 2)
    assert bool(capped.truncated)
    assert np.asarray(capped.present).sum() == 2


# ------------------------------------------------------------ hungarian

@pytest.mark.parametrize("shape", [(1, 1), (3, 3), (5, 5), (8, 8),
                                   (3, 6), (7, 2)])
def test_hungarian_matches_scipy(shape):
    from scipy.optimize import linear_sum_assignment as scipy_lsa
    rng = np.random.RandomState(sum(shape))
    for trial in range(8):
        cost = rng.rand(*shape).astype(np.float32) * 10
        col = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
        ri, ci = scipy_lsa(cost)
        ours = sum(cost[i, col[i]] for i in range(shape[0])
                   if col[i] >= 0)
        theirs = cost[ri, ci].sum()
        # optimal value must match (assignments may differ on ties)
        assert abs(ours - theirs) < 1e-3, (trial, cost, col, (ri, ci))
        # validity: matched columns distinct
        matched = col[col >= 0]
        assert len(set(matched.tolist())) == len(matched)
        assert len(matched) == min(shape)


def test_hungarian_dynamic_sizes():
    """Statically padded matrix with dynamic num_rows/num_cols."""
    from scipy.optimize import linear_sum_assignment as scipy_lsa
    rng = np.random.RandomState(9)
    cost = rng.rand(6, 6).astype(np.float32)
    sub = cost[:3, :4]
    col = np.asarray(linear_sum_assignment(
        jnp.asarray(cost), num_rows=3, num_cols=4))
    ri, ci = scipy_lsa(sub)
    ours = sum(sub[i, col[i]] for i in range(3) if col[i] >= 0)
    assert np.all(col[3:] == -1)
    assert abs(ours - sub[ri, ci].sum()) < 1e-3


def test_span_sorted_records_packed_key_matches_fallback():
    """The packed-key (2-operand) sort must produce the same sorted
    record stream and span starts as the 3-operand fallback; records
    sharing a voxel id may legitimately reorder, so compare per-voxel
    (id, class, weight-sum) content."""
    from mass_tpu.ops.scatter import span_sorted_records

    rng = np.random.RandomState(0)
    V, N, C = 4096, 500, 54
    ids = jnp.asarray(np.concatenate([
        rng.randint(0, V, 8 * N - 40),
        np.full(40, V)]).astype(np.int32))       # 40 discard records
    weights = jnp.asarray(rng.uniform(0, 1, 8 * N).astype(np.float32))
    classes = jnp.asarray(rng.randint(0, C, N).astype(np.int32))

    packed = span_sorted_records(ids, weights, classes, V, 512,
                                 num_classes=C)
    fallback = span_sorted_records(ids, weights, classes, V, 512)

    np.testing.assert_array_equal(packed[0], fallback[0])   # ids
    np.testing.assert_array_equal(packed[3], fallback[3])   # starts
    # same multiset of (id, cls, weight) records
    def recs(r):
        arr = np.stack([np.asarray(r[0]), np.asarray(r[2]),
                        np.round(np.asarray(r[1]) * 1e6)], axis=1)
        return arr[np.lexsort(arr.T[::-1])]
    np.testing.assert_array_equal(recs(packed), recs(fallback))
    # huge grids where the packed key would overflow fall back cleanly
    big = span_sorted_records(ids, weights, classes, 2**28, 512,
                              num_classes=C)
    assert big[0].shape == packed[0].shape
