"""Pure camera / world geometry for RGB-D unprojection.

Shape-static, jit-friendly JAX functions reproducing the semantics of the
reference geometry kernels (reference: mass/utils/projection.py:6-230):
pinhole ray generation in the OpenGL convention, camera-to-world rotation
from a viewing/up direction pair, and uniform-grid binning of ray
endpoints with validity masking.

Unlike the reference (which compacts valid points with ``nonzero``), the
binning here is fully masked and fixed-shape so the whole frame pipeline
compiles to a single XLA program: every pixel keeps a slot, and invalid
pixels carry a ``valid=False`` flag that downstream scatter ops route to a
discard slot.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def spherical_to_cartesian(yaw, elevation):
    """Unit vector for a (yaw, elevation) pair, z-up, with zero yaw and
    elevation pointing along +x and yaw turning counter-clockwise
    (reference: mass/utils/projection.py:6-31)."""
    return jnp.stack([
        jnp.cos(yaw) * jnp.cos(elevation),
        jnp.sin(yaw) * jnp.cos(elevation),
        jnp.sin(elevation)], axis=-1)


def camera_rays(image_height: int, image_width: int,
                focal_length_y: float, focal_length_x: float,
                dtype=jnp.float32) -> jax.Array:
    """Per-pixel ray directions ``[height, width, 3]`` for a pinhole camera
    looking down -z, y up (OpenGL convention; reference:
    mass/utils/projection.py:34-74).

    Computed with numpy at trace time — the result is a compile-time
    constant baked into the XLA program.
    """
    y, x = np.meshgrid(np.arange(image_height, dtype=np.float64),
                       np.arange(image_width, dtype=np.float64),
                       indexing="ij")
    rays_y = (y - 0.5 * float(image_height - 1)) / focal_length_y
    rays_x = (x - 0.5 * float(image_width - 1)) / focal_length_x
    rays = np.stack([rays_x, -rays_y, -np.ones_like(rays_x)], axis=-1)
    return jnp.asarray(rays, dtype=dtype)


def camera_rotation(eye_vector, up_vector):
    """3x3 camera-to-world rotation with columns
    ``[right, up, -eye]`` (reference: mass/utils/projection.py:102-105)."""
    right = jnp.cross(eye_vector, up_vector)
    return jnp.stack([right, up_vector, -eye_vector], axis=-1)


def orient_rays(rays, yaw, elevation):
    """Rotate camera-frame rays into world frame for an agent pose given by
    yaw/elevation (reference: mass/utils/projection.py:77-110 composed with
    mass/nn/base_projection_layer.py:327-331, which derives the eye vector
    from (yaw, elevation) and the up vector from (yaw, elevation + pi/2))."""
    eye = spherical_to_cartesian(yaw, elevation)
    up = spherical_to_cartesian(yaw, elevation + jnp.pi / 2)
    rotation = camera_rotation(eye, up)
    # out[..., i] = sum_j rays[..., j] * R[i, j].  Full fp32 precision:
    # the TPU default (bf16 MXU inputs) would bend ray directions ~1e-2.
    return jnp.einsum("...j,ij->...i", rays, rotation,
                      precision=jax.lax.Precision.HIGHEST)


def uniform_bins(origin: jax.Array, num_cells: int,
                 resolution: float) -> jax.Array:
    """Voxel-boundary positions for one axis: ``num_cells + 1`` edges
    centred on ``origin`` (reference: mass/nn/base_projection_layer.py:162-181,
    which builds them with ``arange(min, max - 1e-6, resolution)``;
    for a uniform grid that is exactly ``min + i * resolution``)."""
    i = jnp.arange(num_cells + 1, dtype=jnp.float32)
    lo = origin - (num_cells + 1) * resolution / 2.0
    return (lo + i * resolution).astype(jnp.float32)


def _edge(bins, idx, resolution=None):
    """World position of edge ``idx``, analytically when the exact
    construction resolution is known.

    ``uniform_bins`` builds edges as ``f32(lo) + f32(i) * f32(res)``;
    recomputing that expression with the same ``res`` is bit-identical
    to gathering ``bins[idx]`` — and gathers fragment XLA fusions on
    TPU, so the hot path never touches the table.  Without the exact
    resolution, fall back to the gather.
    """
    if resolution is None:
        return bins[idx]
    return bins[0] + idx.astype(jnp.float32) * jnp.float32(resolution)


def bucketize(x, bins, resolution=None):
    """Index ``i`` such that ``bins[i] <= x < bins[i+1]``; -1 below, and
    ``len(bins)-1`` at/above the last edge.  Matches
    ``torch.bucketize(x, bins, right=True) - 1`` for the analytically
    uniform ``bins`` built by :func:`uniform_bins` (reference:
    mass/utils/projection.py:183-185).

    Analytic division plus a one-step correction against the true edges
    — O(1) per element, and gather-free when the exact construction
    ``resolution`` is supplied.
    """
    n = bins.shape[0]
    res = (bins[1] - bins[0]) if resolution is None \
        else jnp.float32(resolution)
    idx = jnp.floor((x - bins[0]) / res).astype(jnp.int32)
    idx = jnp.clip(idx, -1, n - 1)
    # correct off-by-one from float rounding against the true edges
    safe = jnp.clip(idx, 0, n - 1)
    below = x < _edge(bins, safe, resolution)  # belongs one bin down
    above = x >= _edge(bins, jnp.clip(idx + 1, 0, n - 1), resolution)
    idx = jnp.where((idx >= 0) & below, idx - 1, idx)
    idx = jnp.where((idx < n - 1) & above, idx + 1, idx)
    return jnp.clip(idx, -1, n - 1)


class BinnedPoints(NamedTuple):
    """Fixed-shape binned point cloud for one frame.

    ``ind_*`` are voxel cell indices per axis (y already flipped to map
    row order), ``ratio_*`` the fraction through each cell (y ratio
    already reversed), ``valid`` masks pixels whose endpoint is inside
    the grid and depth range.  All arrays are ``[height, width]``.
    """

    ind_x: jax.Array
    ind_y: jax.Array
    ind_z: jax.Array
    ratio_x: jax.Array
    ratio_y: jax.Array
    ratio_z: jax.Array
    valid: jax.Array


def bin_rays(bins_x, bins_y, bins_z, origin, rays, depth,
             min_ray_depth: float = 0.0,
             max_ray_depth: float = 10.0,
             resolution: float = None) -> BinnedPoints:
    """Bin world-frame ray endpoints into voxel cells with validity masking
    (reference: mass/utils/projection.py:113-230).

    The y cell index is flipped (``len(bins_y) - 2 - ind_y``) and its ratio
    reversed to match the map's row-major top-down convention (reference:
    mass/utils/projection.py:225,229).
    """
    points = origin[..., None, None, :] + rays * depth
    px, py, pz = points[..., 0], points[..., 1], points[..., 2]

    ind_x = bucketize(px, bins_x, resolution)
    ind_y = bucketize(py, bins_y, resolution)
    ind_z = bucketize(pz, bins_z, resolution)

    d = depth[..., 0]
    valid = ((d >= min_ray_depth) & (d <= max_ray_depth) &
             (ind_x >= 0) & (ind_x < bins_x.shape[0] - 1) &
             (ind_y >= 0) & (ind_y < bins_y.shape[0] - 1) &
             (ind_z >= 0) & (ind_z < bins_z.shape[0] - 1))

    # fraction through the cell, via analytically recomputed edges
    def _ratio(p, ind, bins):
        safe = jnp.clip(ind, 0, bins.shape[0] - 2)
        left = _edge(bins, safe, resolution)
        right = _edge(bins, safe + 1, resolution)
        return (p - left) / (right - left)

    ratio_x = _ratio(px, ind_x, bins_x)
    ratio_y = _ratio(py, ind_y, bins_y)
    ratio_z = _ratio(pz, ind_z, bins_z)

    ind_y_flipped = bins_y.shape[0] - 2 - ind_y
    return BinnedPoints(
        ind_x=jnp.where(valid, ind_x, 0),
        ind_y=jnp.where(valid, ind_y_flipped, 0),
        ind_z=jnp.where(valid, ind_z, 0),
        ratio_x=jnp.where(valid, ratio_x, 0.5),
        ratio_y=jnp.where(valid, 1.0 - ratio_y, 0.5),
        ratio_z=jnp.where(valid, ratio_z, 0.5),
        valid=valid)


def upsample_features(features: jax.Array, height: int,
                      width: int) -> jax.Array:
    """Nearest-repeat a ``[h, w, F]`` feature image up to ``[height, width,
    F]`` by integer factors (reference:
    mass/nn/base_projection_layer.py:322-325)."""
    fh, fw = features.shape[0], features.shape[1]
    if fh != height:
        features = jnp.repeat(features, height // fh, axis=0)
    if fw != width:
        features = jnp.repeat(features, width // fw, axis=1)
    return features
