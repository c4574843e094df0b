"""Pooling ops via ``lax.reduce_window`` with torch-compatible semantics.

The reference smooths maps with ``avg_pool3d(count_include_pad=True)``
(reference: mass/nn/applications/semantic_projection_layer.py:309-312)
and dilates obstacles with ``max_pool2d`` (reference:
mass/navigation_policy.py:220-221); both are odd-kernel, stride-1,
"same"-padded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _axis_window(x: jax.Array, axis: int, k: int, init, op):
    """1D stride-1 same-padded reduce_window along one axis."""
    dims = [1] * x.ndim
    dims[axis] = k
    pad = [(0, 0)] * x.ndim
    pad[axis] = ((k - 1) // 2, (k - 1) // 2)
    return lax.reduce_window(x, init, op, tuple(dims),
                             (1,) * x.ndim, tuple(pad))


def avg_pool3d_same(x: jax.Array, radius: int) -> jax.Array:
    """Box-average a ``[H, W, D]`` (or ``[..., H, W, D]``) volume with a
    cubic kernel of size ``2 * radius + 1``, dividing by the full kernel
    volume even at borders (torch ``count_include_pad=True``).

    Separable: three 1D passes (zero padding makes the sums exact), a
    ``(2r+1)^3 / (3(2r+1))``-fold op reduction over the cubic window."""
    if radius == 0:
        return x
    k = 2 * radius + 1
    for axis in (-3, -2, -1):
        x = _axis_window(x, x.ndim + axis, k, 0.0, lax.add)
    return x / float(k ** 3)


def max_pool2d_same(x: jax.Array, radius: int) -> jax.Array:
    """Max-filter a ``[H, W]`` (or ``[..., H, W]``) image with a square
    kernel of size ``2 * radius + 1``."""
    if radius == 0:
        return x
    k = 2 * radius + 1
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf
    elif x.dtype == jnp.bool_:
        init = False
    else:
        init = jnp.iinfo(x.dtype).min
    # max over a box window is separable too
    for axis in (-2, -1):
        x = _axis_window(x, x.ndim + axis, k, init, lax.max)
    return x
