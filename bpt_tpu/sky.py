"""Preetham analytic physical sky.

Faithful port of Get_Sky_Color and friends
(/root/reference/js/PathTracingCommon.js:373-477), which the reference itself
adapted from three.js's SkyShader.  Fully differentiable w.r.t. both the view
direction and the sun direction — the sun azimuth/zenith gradient config in
/root/repo/BASELINE.json depends on that.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bpt_tpu.core.vecmath import dot, normalize, smoothstep, mix

# Constants (PathTracingCommon.js:375-398).
TURBIDITY = 0.5
RAYLEIGH_COEFFICIENT = 2.0
MIE_COEFFICIENT = 0.03
MIE_DIRECTIONAL_G = 0.76
THREE_OVER_SIXTEENPI = 0.05968310365946075
ONE_OVER_FOURPI = 0.07957747154594767
# np (not jnp) module constants: a jnp array at import time initializes the
# XLA backend, which must not happen before jax.distributed.initialize on
# multi-host deployments (bpt_tpu.parallel.multihost).
TOTAL_RAYLEIGH = np.array([5.804542996261093e-6, 1.3562911419845635e-5, 3.0265902468824876e-5], np.float32)
MIE_CONST = np.array([1.8399918514433978e14, 2.7798023919660528e14, 4.0790479543861094e14], np.float32)
RAYLEIGH_ZENITH_LENGTH = 8400.0
MIE_ZENITH_LENGTH = 1250.0
SUN_POWER = 200.0
SUN_ANGULAR_DIAMETER_COS = 0.9998
CUTOFF_ANGLE = 1.6110731556870734
STEEPNESS = 1.5
E_CONST = 2.71828182845904524
PI = 3.14159265358979323
UP = np.array([0.0, 1.0, 0.0], np.float32)


def rayleigh_phase(cos_theta):
    return THREE_OVER_SIXTEENPI * (1.0 + cos_theta * cos_theta)


def hg_phase(cos_theta, g):
    g2 = g * g
    denom = jnp.power(jnp.maximum(0.0, 1.0 - 2.0 * g * cos_theta + g2), 1.5)
    return ONE_OVER_FOURPI * ((1.0 - g2) / jnp.maximum(denom, 1e-20))


def total_mie():
    c = (0.2 * TURBIDITY) * 10e-18
    return 0.434 * c * MIE_CONST


def sun_intensity(zenith_angle_cos):
    z = jnp.clip(zenith_angle_cos, -1.0, 1.0)
    return SUN_POWER * jnp.maximum(
        0.0, 1.0 - jnp.power(E_CONST, -((CUTOFF_ANGLE - jnp.arccos(z)) / STEEPNESS))
    )


def get_sky_color(ray_dir, sun_direction):
    """Full Preetham evaluation (PathTracingCommon.js:430-475).

    ray_dir: (..., 3); sun_direction: (3,) unit. Returns (..., 3) radiance.
    """
    view = normalize(ray_dir)
    sun = jnp.broadcast_to(sun_direction, view.shape)
    cos_view_sun = dot(view, sun)
    cos_sun_up = dot(jnp.broadcast_to(UP, view.shape), sun)
    cos_up_view = dot(jnp.broadcast_to(UP, view.shape), view)

    sun_e = sun_intensity(cos_sun_up)

    rayleigh_at_x = TOTAL_RAYLEIGH * RAYLEIGH_COEFFICIENT
    mie_at_x = total_mie() * MIE_COEFFICIENT

    zenith_angle = jnp.arccos(jnp.clip(jnp.maximum(0.0, cos_up_view), -1.0, 1.0))
    inverse = 1.0 / (
        jnp.cos(zenith_angle)
        + 0.15 * jnp.power(jnp.maximum(93.885 - (zenith_angle * 180.0 / PI), 1e-6), -1.253)
    )
    rayleigh_opt = RAYLEIGH_ZENITH_LENGTH * inverse
    mie_opt = MIE_ZENITH_LENGTH * inverse

    fex = jnp.exp(-(rayleigh_at_x * rayleigh_opt[..., None] + mie_at_x * mie_opt[..., None]))

    beta_r_theta = rayleigh_at_x * rayleigh_phase(cos_view_sun * 0.5 + 0.5)[..., None]
    beta_m_theta = mie_at_x * hg_phase(cos_view_sun, MIE_DIRECTIONAL_G)[..., None]

    ratio = (beta_r_theta + beta_m_theta) / (rayleigh_at_x + mie_at_x)
    lin = jnp.power(jnp.maximum(sun_e[..., None] * ratio * (1.0 - fex), 0.0), 1.5)
    lin = lin * mix(
        jnp.ones_like(lin),
        jnp.power(jnp.maximum(sun_e[..., None] * ratio * fex, 0.0), 0.5),
        jnp.clip(jnp.power(1.0 - cos_sun_up, 5.0), 0.0, 1.0)[..., None],
    )

    l0 = 0.1 * fex
    sundisk = smoothstep(SUN_ANGULAR_DIAMETER_COS, SUN_ANGULAR_DIAMETER_COS + 0.00002, cos_view_sun)
    l0 = l0 + (sun_e[..., None] * 19000.0 * fex) * sundisk[..., None]
    tex_color = (lin + l0) * 0.04 + jnp.array([0.0, 0.0003, 0.00075], jnp.float32)

    sunfade = 1.0 - jnp.clip(1.0 - jnp.exp(sun_direction[1] / 450000.0), 0.0, 1.0)
    ret = jnp.power(jnp.maximum(tex_color, 0.0), 1.0 / (1.2 + 1.2 * sunfade))
    return ret
