"""Inverse-rendering parameter gradients (detached-sampling estimator).

The reference has no gradients at all; this subsystem is the build's new
capability mandated by /root/repo/BASELINE.json.  The estimator policy lives
in bpt_tpu.integrator.radiance: every discrete sampling decision (blue-noise
gates, NEE light-point picks, hemisphere/lobe direction draws) is
`stop_gradient`-ed, so the gradient is that of the integrand along the
*fixed* sampled paths — biased at visibility silhouettes (accepted and
documented per the north star) but unbiased for shading/material/light/
camera-parameter dependence.

What is differentiable end-to-end:
  camera    — position, basis, fov (via film extents), aperture, focus
  materials — quad/sphere/quadric colors, light emission, PBR texture maps
  lights    — quad light geometry, sun direction/power, HDR image+exposure
  transforms — every TRS matrix (spheres, quadrics, mesh instance) via
               differentiable trs_matrix + matrix inverse
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from bpt_tpu.core.rng import blue_noise_table
from bpt_tpu.integrator.config import IntegratorConfig
from bpt_tpu.integrator.frame import trace_image


def make_render_loss(
    build_scene_and_camera: Callable,
    cfg: IntegratorConfig,
    height: int,
    width: int,
    frames=(1.0, 2.0, 3.0, 4.0),
    rand_vec2=(0.3, 0.7),
    target=None,
    blue_noise=None,
):
    """Build `loss(params) -> scalar` averaging several progressive frames.

    `build_scene_and_camera(params) -> (scene, camera)` re-parameterizes the
    scene from the optimizable pytree, so gradients flow through scene
    construction (transform matrices, sun rotation, etc.).  With `target`
    (H, W, 3) the loss is the MSE to it (inverse rendering); without, the
    mean radiance (useful for gradient sanity checks).
    """
    bn = blue_noise if blue_noise is not None else jnp.asarray(blue_noise_table())
    rv = jnp.asarray(rand_vec2, jnp.float32)
    frames = tuple(float(f) for f in frames)

    def loss(params):
        scene, camera = build_scene_and_camera(params)
        acc = 0.0
        for f in frames:
            res = trace_image(scene, camera, cfg, width, height, f, rv, bn)
            acc = acc + res.color
        img = acc / len(frames)
        if target is None:
            return jnp.mean(img)
        return jnp.mean((img - jnp.asarray(target)) ** 2)

    return loss


def value_and_param_grads(loss, params):
    """jitted value+grad, pytree in/out."""
    return jax.jit(jax.value_and_grad(loss))(params)


def finite_difference(loss, params, eps: float = 1e-3):
    """Central-difference gradient of `loss` over a flat pytree of scalars /
    small arrays — the validation oracle for the analytic estimator."""
    import numpy as np
    from jax.flatten_util import ravel_pytree

    flat, unravel = ravel_pytree(params)
    flat = np.asarray(flat, np.float64)
    g = np.zeros_like(flat)
    for i in range(flat.size):
        hi = flat.copy()
        lo = flat.copy()
        hi[i] += eps
        lo[i] -= eps
        f_hi = float(loss(unravel(jnp.asarray(hi, jnp.float32))))
        f_lo = float(loss(unravel(jnp.asarray(lo, jnp.float32))))
        g[i] = (f_hi - f_lo) / (2 * eps)
    return unravel(jnp.asarray(g, jnp.float32))
