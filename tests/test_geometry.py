"""Unit tests for mass_tpu.core.geometry against the NumPy oracle."""

import numpy as np
import jax.numpy as jnp

from mass_tpu.core import geometry as G
from tests import reference_impl as R


def test_camera_rays_matches_oracle():
    rays = np.asarray(G.camera_rays(12, 16, 33.0, 21.0))
    ref = R.ref_camera_rays(12, 16, 33.0, 21.0)
    np.testing.assert_allclose(rays, ref, atol=1e-6)


def test_camera_rays_center_points_forward():
    rays = np.asarray(G.camera_rays(5, 5, 10.0, 10.0))
    np.testing.assert_allclose(rays[2, 2], [0.0, 0.0, -1.0], atol=1e-7)


def test_orient_rays_matches_oracle():
    rng = np.random.RandomState(0)
    rays = rng.randn(7, 9, 3).astype(np.float32)
    for yaw, elev in [(0.3, -0.6), (2.5, 0.2), (-1.0, 0.0)]:
        out = np.asarray(G.orient_rays(
            jnp.asarray(rays), jnp.float32(yaw), jnp.float32(elev)))
        ref = R.ref_orient_rays(rays, yaw, elev)
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_orient_center_ray_is_eye_direction():
    # a ray looking down -z in camera frame maps to the eye vector
    ray = jnp.asarray([[[0.0, 0.0, -1.0]]])
    for yaw, elev in [(0.7, -0.4), (0.0, 0.0), (np.pi / 2, 0.3)]:
        out = np.asarray(G.orient_rays(
            ray, jnp.float32(yaw), jnp.float32(elev)))[0, 0]
        eye = R.ref_spherical(yaw, elev)
        np.testing.assert_allclose(out, eye, atol=1e-6)


def test_uniform_bins_matches_oracle():
    bins = np.asarray(G.uniform_bins(jnp.float32(1.25), 24, 0.05))
    ref = R.ref_bins(1.25, 24, 0.05)
    assert bins.shape == ref.shape == (25,)
    np.testing.assert_allclose(bins, ref, atol=1e-6)


def test_bucketize_matches_searchsorted():
    """Exact agreement with a binary search over the analytic bins,
    including adversarial points at/straddling every edge."""
    rng = np.random.RandomState(1)
    bins = np.asarray(G.uniform_bins(jnp.float32(-0.3), 33, 0.05))
    x = rng.uniform(bins[0] - 0.2, bins[-1] + 0.2, size=500)
    x = np.concatenate([x, bins, np.nextafter(bins, -np.inf),
                        np.nextafter(bins, np.inf)]).astype(np.float32)
    out = np.asarray(G.bucketize(jnp.asarray(x), jnp.asarray(bins), 0.05))
    ref = R.ref_bucketize(x, bins)
    np.testing.assert_array_equal(out, ref)


def test_bin_rays_matches_oracle():
    rng = np.random.RandomState(2)
    h, w = 9, 11
    rays = R.ref_camera_rays(h, w, 7.0, 7.0)
    bx = R.ref_bins(0.1, 20, 0.1)
    by = R.ref_bins(-0.2, 24, 0.1)
    bz = R.ref_bins(0.0, 8, 0.1)
    origin = np.array([0.15, -0.1, 0.05], np.float32)
    depth = rng.uniform(0.05, 1.4, size=(h, w, 1)).astype(np.float32)
    depth[0, 0, 0] = 50.0   # beyond max depth
    depth[1, 1, 0] = -1.0   # below min depth
    yaw, elev = 0.9, -0.5

    oriented = R.ref_orient_rays(rays, yaw, elev)
    ix, iy, iz, rx, ry, rz, sel = R.ref_bin_rays(
        bx, by, bz, origin, oriented, depth,
        min_ray_depth=0.0, max_ray_depth=10.0)

    out = G.bin_rays(jnp.asarray(bx), jnp.asarray(by), jnp.asarray(bz),
                     jnp.asarray(origin),
                     G.orient_rays(jnp.asarray(rays),
                                   jnp.float32(yaw), jnp.float32(elev)),
                     jnp.asarray(depth))
    valid = np.asarray(out.valid)
    mask = np.zeros((h, w), bool)
    mask[sel] = True
    np.testing.assert_array_equal(valid, mask)

    np.testing.assert_array_equal(np.asarray(out.ind_x)[sel], ix)
    np.testing.assert_array_equal(np.asarray(out.ind_y)[sel], iy)
    np.testing.assert_array_equal(np.asarray(out.ind_z)[sel], iz)
    np.testing.assert_allclose(np.asarray(out.ratio_x)[sel], rx, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.ratio_y)[sel], ry, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.ratio_z)[sel], rz, atol=1e-4)


def test_upsample_features():
    f = jnp.arange(6, dtype=jnp.float32).reshape(2, 3, 1)
    up = G.upsample_features(f, 4, 6)
    assert up.shape == (4, 6, 1)
    assert up[0, 0, 0] == up[1, 1, 0] == f[0, 0, 0]
    assert up[3, 5, 0] == f[1, 2, 0]
