"""Reference-equivalent voxel-update pipeline in PyTorch (CPU).

The reference publishes no throughput numbers (see BASELINE.md), so the
baseline is measured by running an implementation with the reference's
semantics and cost model — torch ops, gather -> zero -> scatter_add with
8-way index expansion, per-frame dynamic compaction — on CPU, exactly as
the reference executes when no CUDA device is present.  Written from the
documented semantics (reference: mass/utils/projection.py,
mass/nn/base_projection_layer.py); used both as the bench baseline and
as an extra parity oracle.
"""

from __future__ import annotations

import math

import numpy as np
import torch


def make_state(map_height=384, map_width=384, map_depth=96,
               feature_size=54, grid_resolution=0.05,
               camera=224, vfov=90.0, origin=(0.0, 0.0, 0.0)):
    focal = camera / 2.0 / math.tan(math.radians(vfov) / 2.0)
    ys, xs = torch.meshgrid(torch.arange(camera, dtype=torch.float32),
                            torch.arange(camera, dtype=torch.float32),
                            indexing="ij")
    rays = torch.stack([(xs - 0.5 * (camera - 1)) / focal,
                        -(ys - 0.5 * (camera - 1)) / focal,
                        -torch.ones_like(xs)], dim=-1)

    def edges(center, cells):
        lo = center - (cells + 1) * grid_resolution / 2
        return lo + grid_resolution * torch.arange(
            cells + 1, dtype=torch.float32)

    return dict(
        rays=rays,
        data=torch.zeros(map_height, map_width, map_depth, feature_size),
        bx=edges(origin[0], map_width),
        by=edges(origin[1], map_height),
        bz=edges(origin[2], map_depth),
        iw=0.5)


def update(state, depth, features, position, yaw, elevation,
           min_depth=0.0, max_depth=10.0):
    """One frame -> map update with reference semantics/cost on torch."""
    rays, data = state["rays"], state["data"]
    bx, by, bz = state["bx"], state["by"], state["bz"]
    h, w, d, nf = data.shape

    # pose rotation
    def sph(a, b):
        return torch.tensor([math.cos(a) * math.cos(b),
                             math.sin(a) * math.cos(b), math.sin(b)])
    eye, up = sph(yaw, elevation), sph(yaw, elevation + math.pi / 2)
    rot = torch.stack([torch.cross(eye, up, dim=0), up, -eye], dim=-1)
    world = torch.einsum("hwj,ij->hwi", rays, rot)

    pts = torch.as_tensor(position).view(1, 1, 3) + world * depth
    ix = torch.bucketize(pts[..., 0].contiguous(), bx, right=True) - 1
    iy = torch.bucketize(pts[..., 1].contiguous(), by, right=True) - 1
    iz = torch.bucketize(pts[..., 2].contiguous(), bz, right=True) - 1

    dz = depth[..., 0]
    ok = ((dz >= min_depth) & (dz <= max_depth) &
          (ix >= 0) & (ix < len(bx) - 1) & (iy >= 0) &
          (iy < len(by) - 1) & (iz >= 0) & (iz < len(bz) - 1))
    sel = ok.nonzero(as_tuple=True)
    ix, iy, iz, p, f = ix[sel], iy[sel], iz[sel], pts[sel], features[sel]

    rx = (p[:, 0] - bx[ix]) / (bx[ix + 1] - bx[ix])
    ry = (p[:, 1] - by[iy]) / (by[iy + 1] - by[iy])
    rz = (p[:, 2] - bz[iz]) / (bz[iz + 1] - bz[iz])
    iy = len(by) - 2 - iy
    ry = 1.0 - ry

    # 8-corner expansion, axis order (y->rows, x->cols, z)
    def corners(i, r, size):
        lo = torch.where(r < 0.5, (i - 1).clamp(min=0), i)
        hi = torch.where(r < 0.5, i, (i + 1).clamp(max=size - 1))
        wl = torch.where(r < 0.5, 0.5 - r, 1.5 - r)
        wh = torch.where(r < 0.5, r + 0.5, r - 0.5)
        return (lo, wl), (hi, wh)

    c0, c1, c2 = corners(iy, ry, h), corners(ix, rx, w), corners(iz, rz, d)
    idx_list, w_list = [], []
    for a, wa in c0:
        for b, wb in c1:
            for c, wc in c2:
                idx_list.append((a * w + b) * d + c)
                w_list.append(1e-9 + wa * wb * wc)
    idx = torch.cat(idx_list)
    wgt = torch.cat(w_list)

    flat = data.view(-1, nf)
    wsum = torch.zeros(flat.shape[0])
    wsum.index_add_(0, idx, wgt)

    iwc = state["iw"]
    old = flat[idx]
    f8 = f.repeat(8, 1)
    interp = (1 - iwc * wgt[:, None]) * old + iwc * wgt[:, None] * f8

    flat[idx] = 0
    flat.index_add_(0, idx, interp * (wgt / wsum[idx])[:, None])
    return state


def random_frame(rng: np.random.RandomState, camera=224, num_classes=54):
    depth = torch.from_numpy(
        rng.uniform(0.3, 4.0, (camera, camera, 1)).astype(np.float32))
    sem = rng.randint(0, num_classes, (camera, camera))
    feats = torch.from_numpy(
        np.eye(num_classes, dtype=np.float32)[sem])
    pos = rng.uniform(-1, 1, 3).astype(np.float32)
    return depth, feats, pos, float(rng.uniform(-np.pi, np.pi)), \
        float(rng.uniform(-0.6, 0.0))
