"""Independent NumPy oracle of the reference voxel-mapping semantics.

Written from the documented behavior of the reference kernels
(reference: mass/utils/projection.py, mass/nn/base_projection_layer.py)
as a slow, explicit, loop-based implementation used ONLY to generate
golden values for parity tests at small shapes.  It deliberately mirrors
the reference's exact operation ordering (including the gather-before-
zero in the scatter update and the +1e-9 weight epsilon) so the JAX
implementation can be validated against it to tight tolerances.
"""

import numpy as np


def ref_camera_rays(h, w, fy, fx):
    y, x = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    ry = (y - 0.5 * float(h - 1)) / fy
    rx = (x - 0.5 * float(w - 1)) / fx
    return np.stack([rx, -ry, -np.ones_like(rx)], axis=-1)


def ref_spherical(yaw, elevation):
    return np.array([np.cos(yaw) * np.cos(elevation),
                     np.sin(yaw) * np.cos(elevation),
                     np.sin(elevation)], dtype=np.float32)


def ref_orient_rays(rays, yaw, elevation):
    eye = ref_spherical(yaw, elevation)
    up = ref_spherical(yaw, elevation + np.pi / 2)
    right = np.cross(eye, up)
    rot = np.stack([right, up, -eye], axis=-1)  # columns
    return rays @ rot.T


def ref_bins(origin, num_cells, resolution):
    lo = origin - (num_cells + 1) * resolution / 2
    hi = origin + (num_cells + 1) * resolution / 2 - 1e-6
    return np.arange(lo, hi, resolution, dtype=np.float32)


def ref_bucketize(x, bins):
    # torch.bucketize(x, bins, right=True) - 1
    return np.searchsorted(bins, x, side="right").astype(np.int64) - 1


def ref_bin_rays(bins_x, bins_y, bins_z, origin, rays, depth,
                 min_ray_depth=0.0, max_ray_depth=10.0):
    """Returns compacted (ind_x, ind_y_flipped, ind_z, rx, 1-ry, rz, pix)
    for valid pixels only, like the reference's nonzero() compaction."""
    pts = origin.reshape(1, 1, 3) + rays * depth
    ix = ref_bucketize(pts[..., 0], bins_x)
    iy = ref_bucketize(pts[..., 1], bins_y)
    iz = ref_bucketize(pts[..., 2], bins_z)
    d = depth[..., 0]
    ok = ((d >= min_ray_depth) & (d <= max_ray_depth) &
          (ix >= 0) & (ix < len(bins_x) - 1) &
          (iy >= 0) & (iy < len(bins_y) - 1) &
          (iz >= 0) & (iz < len(bins_z) - 1))
    sel = np.nonzero(ok)
    ix, iy, iz = ix[sel], iy[sel], iz[sel]
    p = pts[sel]
    rx = (p[:, 0] - bins_x[ix]) / (bins_x[ix + 1] - bins_x[ix])
    ry = (p[:, 1] - bins_y[iy]) / (bins_y[iy + 1] - bins_y[iy])
    rz = (p[:, 2] - bins_z[iz]) / (bins_z[iz + 1] - bins_z[iz])
    iy_flipped = len(bins_y) - 2 - iy
    return ix, iy_flipped, iz, rx, 1.0 - ry, rz, sel


def _axis_corners(ind, ratio, size):
    near_low = ratio < 0.5
    lower = np.where(near_low, np.clip(ind - 1, 0, None), ind)
    upper = np.where(near_low, ind, np.clip(ind + 1, None, size - 1))
    wl = np.where(near_low, 0.5 - ratio, 1.5 - ratio)
    wu = np.where(near_low, ratio + 0.5, ratio - 0.5)
    return (lower, wl), (upper, wu)


def ref_update_feature_map(ind0, ind1, ind2, r0, r1, r2, feats, fmap,
                           interpolation_weight=1.0):
    """In-place scatter update of fmap [S0, S1, S2, F]; axis0/1/2 receive
    (ind0, r0) etc.  Mirrors the reference's two-pass
    gather -> zero -> normalized scatter-add ordering exactly."""
    s0, s1, s2, nf = fmap.shape
    flat = fmap.reshape(-1, nf)
    a0 = _axis_corners(ind0, r0, s0)
    a1 = _axis_corners(ind1, r1, s1)
    a2 = _axis_corners(ind2, r2, s2)

    corner_ids, corner_w = [], []
    for i0, w0 in a0:
        for i1, w1 in a1:
            for i2, w2 in a2:
                corner_ids.append((i0 * s1 + i1) * s2 + i2)
                corner_w.append(1e-9 + w0 * w1 * w2)
    corner_ids = np.stack(corner_ids)   # [8, N]
    corner_w = np.stack(corner_w)       # [8, N]

    wsum = np.zeros(flat.shape[0], dtype=np.float64)
    for c in range(8):
        np.add.at(wsum, corner_ids[c], corner_w[c])

    iw = interpolation_weight
    interp = np.empty((8,) + feats.shape, dtype=np.float64)
    for c in range(8):
        old = flat[corner_ids[c]]
        w = corner_w[c][:, None]
        interp[c] = (1.0 - iw * w) * old + iw * w * feats

    touched = np.unique(corner_ids)
    flat[touched] = 0.0
    for c in range(8):
        contrib = interp[c] * corner_w[c][:, None] / \
            wsum[corner_ids[c]][:, None]
        np.add.at(flat, corner_ids[c], contrib.astype(flat.dtype))
    return fmap


def ref_full_update(fmap, bins_x, bins_y, bins_z, rays, position, yaw,
                    elevation, depth, feats, interpolation_weight=0.5,
                    min_ray_depth=0.0, max_ray_depth=10.0):
    """Frame -> map pipeline like BaseProjectionLayer.update (axis order:
    update_feature_map(ind_y, ind_x, ind_z, ry, rx, rz))."""
    oriented = ref_orient_rays(rays, yaw, elevation)
    ix, iy, iz, rx, ry, rz, sel = ref_bin_rays(
        bins_x, bins_y, bins_z, position, oriented, depth,
        min_ray_depth=min_ray_depth, max_ray_depth=max_ray_depth)
    f = feats[sel]
    return ref_update_feature_map(iy, ix, iz, ry, rx, rz, f, fmap,
                                  interpolation_weight)


def ref_top_down(fmap, z_start, z_stop):
    sl = fmap[:, :, z_start:z_stop]
    mask = np.any(sl != 0, axis=-1)
    idx = np.argmax(np.cumsum(mask, axis=-1) * mask, axis=-1)
    h, w = idx.shape
    return sl[np.arange(h)[:, None], np.arange(w)[None, :], idx]


def ref_world_to_map(coords, bins_x, bins_y, bins_z=None):
    out = [ref_bucketize(coords[..., 0], bins_x),
           len(bins_y) - 2 - ref_bucketize(coords[..., 1], bins_y)]
    if coords.shape[-1] == 3 and bins_z is not None:
        out.append(ref_bucketize(coords[..., 2], bins_z))
    return np.stack(out, axis=-1)


def ref_map_to_world(coords, bins_x, bins_y, bins_z=None):
    coords = np.asarray(coords, np.float32)
    floored = np.floor(coords)
    idx = floored.astype(np.int64)
    mid_x = (bins_x[:-1] + bins_x[1:]) / 2
    mid_y = ((bins_y[:-1] + bins_y[1:]) / 2)[::-1]

    def interp(mids, i, frac):
        left = mids[i]
        right = mids[np.clip(i + 1, 0, len(mids) - 1)]
        return left + (right - left) * frac

    frac = coords - floored
    out = [interp(mid_x, idx[..., 0], frac[..., 0]),
           interp(mid_y, idx[..., 1], frac[..., 1])]
    if coords.shape[-1] == 3 and bins_z is not None:
        mid_z = (bins_z[:-1] + bins_z[1:]) / 2
        out.append(interp(mid_z, idx[..., 2], frac[..., 2]))
    return np.stack(out, axis=-1)
