"""Light samplers: axis-aligned quad light, sphere light, sun lobe.

References: pathtracing_sample_axis_aligned_quad_light
(/root/reference/js/PathTracingCommon.js:580-599),
pathtracing_sample_sphere_light (:602-624), and the sun-directed NEE used by
the sky/HDRI demos (PhysicalSkyModel_FragmentShader.js:250-256,
HDRIEnvironmentPathTracing_FragmentShader.js:510-517).
"""

from __future__ import annotations

import jax.numpy as jnp

from bpt_tpu.core.rng import RngState, rng_next
from bpt_tpu.core.sampling import TWO_PI, random_direction_in_specular_lobe
from bpt_tpu.core.vecmath import dot, length, mix, normalize, orthonormal_basis, safe_sqrt


def quad_light_from_uniforms(x, nl, light_v0, light_v1, light_v2, light_v3, light_normal, rx, ry, rz):
    """Quad-light NEE direction/weight from three pre-drawn uniforms.

    Split out of :func:`sample_quad_light` so the integrator can hold a fixed
    per-bounce draw schedule (see bpt_tpu.core.rng module docs).
    """
    rand_point = jnp.stack(
        [
            mix(light_v0[..., 0], light_v2[..., 0], jnp.clip(rx, 0.1, 0.9)),
            mix(light_v0[..., 1], light_v2[..., 1], jnp.clip(ry, 0.1, 0.9)),
            mix(light_v0[..., 2], light_v2[..., 2], jnp.clip(rz, 0.1, 0.9)),
        ],
        axis=-1,
    )
    dir_to_light = rand_point - x
    r2 = length(light_v1 - light_v0) * length(light_v3 - light_v0)
    d2 = dot(dir_to_light, dir_to_light)
    cos_a_max = safe_sqrt(1.0 - jnp.clip(r2 / jnp.maximum(d2, 1e-20), 0.0, 1.0))
    dir_to_light = normalize(dir_to_light)
    dot_nl = jnp.maximum(0.0, dot(nl, dir_to_light))
    weight = 2.0 * (1.0 - cos_a_max) * jnp.maximum(0.0, -dot(dir_to_light, light_normal)) * dot_nl
    return dir_to_light, jnp.clip(weight, 0.0, 1.0)


def sample_quad_light(x, nl, light_v0, light_v1, light_v2, light_v3, light_normal, rng: RngState):
    """Sample a point toward an axis-aligned quad light; returns (dir, weight, rng).

    weight = clamp(2*(1-cos_a_max) * max(0,-dot(dir,lightN)) * max(0,dot(nl,dir)), 0, 1)
    with the point clamped to the [0.1, 0.9] margin of the quad
    (PathTracingCommon.js:585-595).  Consumes exactly 3 draws.
    """
    rx, rng = rng_next(rng)
    ry, rng = rng_next(rng)
    rz, rng = rng_next(rng)
    d, w = quad_light_from_uniforms(x, nl, light_v0, light_v1, light_v2, light_v3, light_normal, rx, ry, rz)
    return d, w, rng


def sample_sphere_light(x, nl, light_pos, light_radius, rng: RngState):
    """Cone sampling toward a spherical light (PathTracingCommon.js:602-624).

    Returns (dir, weight, rng); consumes exactly 2 draws.  The 0.75 shrink on
    sin_alpha is the reference's shadow-ray robustness hack (:611).
    """
    to_light = light_pos - x
    cos_alpha_max = jnp.sqrt(
        jnp.maximum(1.0 - jnp.clip(light_radius * light_radius / jnp.maximum(dot(to_light, to_light), 1e-20), 0.0, 1.0), 0.0)
    )
    rc, rng = rng_next(rng)
    rp, rng = rng_next(rng)
    cos_alpha = mix(cos_alpha_max, 1.0, rc)
    sin_alpha = safe_sqrt(1.0 - cos_alpha * cos_alpha) * 0.75
    phi = rp * TWO_PI
    dir_to_light = normalize(to_light)
    u, v = orthonormal_basis(dir_to_light)
    sample_dir = normalize(
        u * (jnp.cos(phi) * sin_alpha)[..., None]
        + v * (jnp.sin(phi) * sin_alpha)[..., None]
        + dir_to_light * cos_alpha[..., None]
    )
    weight = jnp.clip(2.0 * (1.0 - cos_alpha_max) * jnp.maximum(0.0, dot(nl, sample_dir)), 0.0, 1.0)
    return sample_dir, weight, rng


def sample_sun(nl, sun_direction, lobe_roughness: float, rng: RngState):
    """Sun-directed NEE lobe used by the sky/HDRI scenes; returns (dir, cos, rng).

    The caller applies the scene-specific weight:
      sky:  max(0, dot(dir, nl)) * 0.05   (PhysicalSkyModel_FragmentShader.js:253)
      hdri: max(0, dot(dir, nl)) * sunPower^2 * 1e-7  (HDRI...js:513)
    Consumes exactly 2 draws.
    """
    sun = jnp.broadcast_to(sun_direction, nl.shape)
    d, rng = random_direction_in_specular_lobe(sun, lobe_roughness, rng)
    return d, jnp.maximum(0.0, dot(d, nl)), rng
