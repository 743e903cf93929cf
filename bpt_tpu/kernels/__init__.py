"""Pallas TPU megakernels (the compiled-fragment-shader tier).

Filled in after the jnp reference path is validated: fused ray-tile bounce
megakernel, denoise stencil kernel.  See bpt_tpu.integrator for the
semantics they must reproduce draw-for-draw.
"""
