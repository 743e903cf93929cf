"""Exact dielectric Fresnel reflectance.

Reference: calcFresnelReflectance (/root/reference/js/PathTracingCommon.js:554-577).
Returns both the reflectance and the eta ratio the caller needs for refract().
"""

from __future__ import annotations

import jax.numpy as jnp

from bpt_tpu.core.vecmath import dot, safe_sqrt


def calc_fresnel_reflectance(ray_dir, n, etai, etat) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Re, ratioIoR) with inside/outside handling and TIR -> Re = 1.

    `etai`/`etat` are scalars (air/glass etc.); the inside/outside swap is
    decided per lane from cos(incident) sign like the GLSL.
    """
    cosi = jnp.clip(dot(ray_dir, n), -1.0, 1.0)
    inside = cosi > 0.0
    ei = jnp.where(inside, etat, etai)
    et = jnp.where(inside, etai, etat)
    ratio_ior = ei / et
    sint = ratio_ior * safe_sqrt(1.0 - cosi * cosi)
    tir = sint >= 1.0
    cost = safe_sqrt(1.0 - sint * sint)
    cosi_a = jnp.abs(cosi)
    rs = ((et * cosi_a) - (ei * cost)) / jnp.maximum((et * cosi_a) + (ei * cost), 1e-20)
    rp = ((ei * cosi_a) - (et * cost)) / jnp.maximum((ei * cosi_a) + (et * cost), 1e-20)
    re = jnp.clip((rs * rs + rp * rp) * 0.5, 0.0, 1.0)
    return jnp.where(tir, 1.0, re), ratio_ior
