"""Direction samplers and the tent reconstruction filter.

Faithful functional re-implementations of the reference's samplers
(/root/reference/js/PathTracingCommon.js:510-549), threaded through the
fixed-schedule RNG state from :mod:`bpt_tpu.core.rng`.
"""

from __future__ import annotations

import jax.numpy as jnp

from bpt_tpu.core.rng import RngState, rng_next
from bpt_tpu.core.vecmath import mix, normalize, orthonormal_basis, safe_sqrt

TWO_PI = 6.28318530717958648


def random_sphere_direction(state: RngState) -> tuple[jnp.ndarray, RngState]:
    """Uniform sphere direction (PathTracingCommon.js:510-516)."""
    u, state = rng_next(state)
    a, state = rng_next(state)
    up = u * 2.0 - 1.0
    over = safe_sqrt(1.0 - up * up)
    around = a * TWO_PI
    d = jnp.stack([jnp.cos(around) * over, up, jnp.sin(around) * over], axis=-1)
    return normalize(d), state


def cos_hemisphere_from_uniforms(nl: jnp.ndarray, r_, p_) -> jnp.ndarray:
    """Cosine-weighted hemisphere about nl from two pre-drawn uniforms.

    Split out from :func:`random_cos_weighted_hemisphere` so mutually-exclusive
    material branches (DIFFUSE vs CLEARCOAT base) can share one fixed draw
    site per bounce — the keystone of the fixed RNG schedule (see core.rng).
    """
    r = jnp.sqrt(r_)
    phi = p_ * TWO_PI
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = safe_sqrt(1.0 - x * x - y * y)
    u, v = orthonormal_basis(nl)
    return normalize(x[..., None] * u + y[..., None] * v + z[..., None] * nl)


def random_cos_weighted_hemisphere(nl: jnp.ndarray, state: RngState) -> tuple[jnp.ndarray, RngState]:
    """Cosine-weighted hemisphere about nl (PathTracingCommon.js:518-530)."""
    r_, state = rng_next(state)
    p_, state = rng_next(state)
    return cos_hemisphere_from_uniforms(nl, r_, p_), state


def specular_lobe_from_uniforms(reflection_dir: jnp.ndarray, roughness, c_, p_) -> jnp.ndarray:
    """Specular-lobe direction from two pre-drawn uniforms (shared draw site)."""
    roughness = jnp.clip(jnp.asarray(roughness, jnp.float32), 0.0, 1.0)
    exponent = mix(7.0, 0.0, jnp.sqrt(roughness))
    cos_theta = jnp.power(c_, 1.0 / (jnp.exp(exponent) + 1.0))
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = p_ * TWO_PI
    u, v = orthonormal_basis(reflection_dir)
    lobe = (
        u * (jnp.cos(phi) * sin_theta)[..., None]
        + v * (jnp.sin(phi) * sin_theta)[..., None]
        + reflection_dir * cos_theta[..., None]
    )
    rough = jnp.broadcast_to(roughness, lobe.shape[:-1])[..., None]
    return normalize(mix(reflection_dir, lobe, rough))


def random_direction_in_specular_lobe(
    reflection_dir: jnp.ndarray, roughness, state: RngState
) -> tuple[jnp.ndarray, RngState]:
    """Phong-like lobe around a reflection dir (PathTracingCommon.js:532-543).

    exponent = mix(7, 0, sqrt(roughness)); cosTheta = r^(1/(e^exponent + 1));
    final dir = mix(reflectionDir, lobe sample, roughness), normalized.
    """
    c_, state = rng_next(state)
    p_, state = rng_next(state)
    return specular_lobe_from_uniforms(reflection_dir, roughness, c_, p_), state


def tent_filter(x: jnp.ndarray) -> jnp.ndarray:
    """Peter Shirley's tent filter in [-1, 1] (PathTracingCommon.js:546-549)."""
    return jnp.where(x < 0.5, jnp.sqrt(jnp.maximum(2.0 * x, 0.0)) - 1.0, 1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * x, 0.0)))
