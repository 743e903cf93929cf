"""Texture sampling (bilinear, repeat wrap) — the GLSL texture() analog.

Gather-based so XLA lowers it to batched dynamic-gathers from HBM; textures
stay resident on device like the reference's sampler uniforms.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with REPEAT wrap on both axes.

    tex: (H, W, C) with v=0 at row 0 (callers pre-flip if their asset
    convention differs); uv: (..., 2) in [0, 1] (any values; wrapped).
    Returns (..., C).
    """
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    y1i = jnp.mod(y0i + 1, h)
    c00 = tex[y0i, x0i]
    c01 = tex[y0i, x1i]
    c10 = tex[y1i, x0i]
    c11 = tex[y1i, x1i]
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy


def sample_nearest(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sample with REPEAT wrap (texelFetch-style)."""
    h, w = tex.shape[0], tex.shape[1]
    xi = jnp.mod(jnp.floor(uv[..., 0] * w).astype(jnp.int32), w)
    yi = jnp.mod(jnp.floor(uv[..., 1] * h).astype(jnp.int32), h)
    return tex[yi, xi]
