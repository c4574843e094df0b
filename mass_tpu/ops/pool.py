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


def avg_pool3d_same(x: jax.Array, radius: int) -> jax.Array:
    """Box-average a ``[H, W, D]`` (or ``[..., H, W, D]``) volume with a
    cubic kernel of size ``2 * radius + 1``, dividing by the full kernel
    volume even at borders (torch ``count_include_pad=True``)."""
    if radius == 0:
        return x
    k = 2 * radius + 1
    dims = (1,) * (x.ndim - 3) + (k, k, k)
    ones = (1,) * x.ndim
    pad = ((0, 0),) * (x.ndim - 3) + ((radius, radius),) * 3
    summed = lax.reduce_window(x, 0.0, lax.add, dims, ones, pad)
    return summed / float(k ** 3)


def max_pool2d_same(x: jax.Array, radius: int) -> jax.Array:
    """Max-filter a ``[H, W]`` (or ``[..., H, W]``) image with a square
    kernel of size ``2 * radius + 1``."""
    if radius == 0:
        return x
    k = 2 * radius + 1
    dims = (1,) * (x.ndim - 2) + (k, k)
    ones = (1,) * x.ndim
    pad = ((0, 0),) * (x.ndim - 2) + ((radius, radius),) * 2
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf
    elif x.dtype == jnp.bool_:
        init = False
    else:
        init = jnp.iinfo(x.dtype).min
    return lax.reduce_window(x, init, lax.max, dims, ones, pad)
