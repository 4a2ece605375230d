"""Device-side PVS row-mask lookup for the render culling prologue.

The scenario carries per-episode tables in its scen pytree (built by
utils/pvs.py at generation time):
  pvs_centers [CMAX, 2] f32    world-xz cell centers, +1e9 padding
  pvs_rows16  [CMAX+1, W] i32  per-cell render-row visibility bits, 16 bits
                               per word (f32-exact through the one-hot
                               matmul); row CMAX is an all-ones sentinel
  pvs_walltop f32              wall-top plane y (2*wall_height); <= 0
                               disables PVS for the env

Per (env, agent) the eye maps to its containing cell by nearest center —
exact for a honeycomb (cells are the Voronoi regions of their centers); the
guard falls back to the sentinel (everything visible) whenever the 2D
reduction's premise could fail: eye at/above the wall-top plane (jump apex,
standing on a wall) or outside every cell. The row bits come out of ONE
batched one-hot matmul (MXU, ~20M MACs at 1024 envs) — no scalarized
gathers on the TPU path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from megaverse_tpu import constants as C

# Matches utils/pvs._HEX_R: the device cell assignment is valid while the eye
# is within the maze; beyond circumradius + slack of every center -> sentinel.
_EYE_MARGIN = 0.05


def row_mask(agents_pos: jax.Array, centers: jax.Array, rows16: jax.Array,
             walltop: jax.Array, num_rows: int,
             cell_scale: float) -> jax.Array:
    """Per-agent render-row visibility bits for ONE env.

    agents_pos [A, 3], centers [CMAX, 2], rows16 [CMAX+1, W] i32,
    walltop scalar, cell_scale = world units per maze unit (hex circumradius
    in world = cell_scale). Returns bool [A, num_rows]."""
    cmax = centers.shape[0]
    eye_y = agents_pos[:, 1] + (C.AGENT_BODY_OFFSET_Y + C.AGENT_CAMERA_OFFSET_Y)
    eye_xz = jnp.stack([agents_pos[:, 0], agents_pos[:, 2]], axis=-1)
    d2 = jnp.sum((eye_xz[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    cell = jnp.argmin(d2, axis=-1)                       # [A]
    ok = ((walltop > 0.0)
          & (eye_y < walltop - _EYE_MARGIN)
          & (jnp.min(d2, axis=-1) < (cell_scale * (1.0 + _EYE_MARGIN)) ** 2))
    idx = jnp.where(ok, cell, cmax)                      # sentinel row
    onehot = (idx[:, None] == jnp.arange(cmax + 1)[None, :]).astype(jnp.float32)
    words = jnp.einsum("ac,cw->aw", onehot, rows16.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    words = words.astype(jnp.int32)                      # [A, W], 16-bit words
    bits = (words[:, :, None] >> jnp.arange(16, dtype=jnp.int32)) & 1
    flat = bits.reshape(agents_pos.shape[0], -1)
    return flat[:, :num_rows].astype(bool)
