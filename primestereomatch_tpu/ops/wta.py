"""Winner-takes-all disparity selection.

Reference semantics (src/DispSel.cpp:83-109): per-pixel linear argmin over
d = 1 .. maxDis-1 (disparity 0 is never selected), strict `<` comparison so
ties resolve to the LOWEST disparity. Output is uint8.

TPU-first: a single argmin reduction over the leading (disparity) axis —
jnp.argmin returns the first minimum, which matches the reference's
strict-< tie rule given the ascending scan order. Under d-axis mesh
sharding this becomes a local argmin + cross-shard (min, argmin) merge
(parallel/sharded.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wta_disparity(cost_volume: jax.Array) -> jax.Array:
    """(D, H, W) costs -> (H, W) uint8 disparities, d in [1, D)."""
    return (jnp.argmin(cost_volume[1:], axis=0) + 1).astype(jnp.uint8)
