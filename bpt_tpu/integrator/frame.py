"""Per-frame image tracing: ray-gen → radiance → edge detect → accumulate.

Functional analog of `pathtracing_default_main`
(/root/reference/js/PathTracingCommon.js:1251-1360): one path per pixel per
frame, hardware quad-derivative edge detection, and the running-sum
progressive accumulation protocol with the alpha-channel sharpness flags the
denoiser consumes.

Image layout: (H, W) with row 0 at the *bottom* (gl_FragCoord convention), so
pixel ids and RNG seeds match a bottom-left origin.  Callers that want
top-left arrays flip once at the edge of the system.
"""

from __future__ import annotations

import jax.numpy as jnp

from bpt_tpu.camera import Camera, generate_rays
from bpt_tpu.core.rng import blue_noise_fetch, rng_seed
from bpt_tpu.core.vecmath import smoothstep
from bpt_tpu.integrator.config import IntegratorConfig
from bpt_tpu.integrator.radiance import RadianceResult, calculate_radiance
from bpt_tpu.scenes.types import Scene


def pixel_grid(height: int, width: int):
    """Absolute integer pixel coords, (H, W) each, bottom-left origin."""
    py, px = jnp.mgrid[0:height, 0:width]
    return px, py


def _quad_dfdx(v: jnp.ndarray) -> jnp.ndarray:
    """GPU dFdx over 2x2 pixel quads: both pixels of a horizontal pair see
    the same difference (right - left).  v: (H, W, ...) with even W."""
    h, w = v.shape[0], v.shape[1]
    pairs = v.reshape((h, w // 2, 2) + v.shape[2:])
    d = pairs[:, :, 1] - pairs[:, :, 0]
    return jnp.repeat(d, 2, axis=1).reshape(v.shape)


def _quad_dfdy(v: jnp.ndarray) -> jnp.ndarray:
    """GPU dFdy over 2x2 quads (top - bottom within each vertical pair)."""
    h = v.shape[0]
    pairs = v.reshape((h // 2, 2) + v.shape[1:])
    d = pairs[:, 1] - pairs[:, 0]
    return jnp.repeat(d[:, None], 2, axis=1).reshape(v.shape)


def _fwidth(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(_quad_dfdx(v)) + jnp.abs(_quad_dfdy(v))


def detect_edges(result: RadianceResult) -> jnp.ndarray:
    """The three edge detectors of default_main (PathTracingCommon.js:1306-1324).

    Returns (normal_difference, object_difference, color_difference), each
    (H, W), matching the smoothstep thresholds 0.2/0.6 (normals) and 0.0/0.5
    (object id / color presence counts).
    """
    fw_n = _fwidth(result.object_normal)  # (H, W, 3)
    normal_difference = (
        smoothstep(0.2, 0.6, fw_n[..., 0])
        + smoothstep(0.2, 0.6, fw_n[..., 1])
        + smoothstep(0.2, 0.6, fw_n[..., 2])
    )
    d_obj = (jnp.abs(_quad_dfdx(result.object_id)) > 0.0).astype(jnp.float32) + (
        jnp.abs(_quad_dfdy(result.object_id)) > 0.0
    ).astype(jnp.float32)
    object_difference = smoothstep(0.0, 0.5, d_obj)
    col_x = jnp.linalg.norm(_quad_dfdx(result.object_color), axis=-1)
    col_y = jnp.linalg.norm(_quad_dfdy(result.object_color), axis=-1)
    d_col = (col_x > 0.0).astype(jnp.float32) + (col_y > 0.0).astype(jnp.float32)
    color_difference = smoothstep(0.0, 0.5, d_col)
    return normal_difference, object_difference, color_difference


def trace_image(
    scene: Scene,
    camera: Camera,
    cfg: IntegratorConfig,
    width: int,
    height: int,
    frame_counter,
    rand_vec2,
    blue_noise: jnp.ndarray,
    tile_rows: int | None = None,
    row_offset=0,
) -> RadianceResult:
    """Trace one 1-sample-per-pixel frame; returns the raw per-pixel result.

    `width`/`height` are the FULL image dimensions (they define the camera
    film plane).  When tile-sharded, pass `tile_rows` (this shard's row
    count) and `row_offset` (traced scalar: the shard's first absolute row):
    RNG streams and ray directions stay keyed by absolute pixel coordinates,
    so an N-way sharded render is bitwise-identical to the single-device one.
    """
    px, py = pixel_grid(tile_rows if tile_rows is not None else height, width)
    py = py + row_offset
    rng = rng_seed(frame_counter, px, py)
    bn = blue_noise_fetch(blue_noise, px, py, rand_vec2)
    ro, rd, rng = generate_rays(camera, px, py, width, height, rng)
    result, _, _ = calculate_radiance(scene, cfg, ro, rd, rng, bn, frame_counter)
    return result


def render_frame(
    scene: Scene,
    camera: Camera,
    cfg: IntegratorConfig,
    previous: jnp.ndarray,  # (H, W, 4) accumulated sum + alpha flags
    frame_counter,  # traced scalar; ==1 clears history
    camera_is_moving,  # traced bool scalar
    rand_vec2,  # (2,) per-frame uniforms in [0, 1)
    blue_noise: jnp.ndarray,
) -> jnp.ndarray:
    """One progressive step: previous (H,W,4) buffer -> new (H,W,4) buffer.

    Implements the accumulation protocol of PathTracingCommon.js:1326-1357:
    history cleared when frame_counter == 1; while the camera moves both old
    and new are halved (motion-blur trail) and the alpha flag chain resets;
    alpha encodes sticky sharp edges (1.01), provisional sharp (-1), soft (0).
    The buffer stores the running *sum* of radiance — averaging, denoise and
    tonemap happen in bpt_tpu.postprocess.
    """
    height, width = previous.shape[0], previous.shape[1]
    result = trace_image(scene, camera, cfg, width, height, frame_counter, rand_vec2, blue_noise)
    return finish_frame(result, previous, frame_counter, camera_is_moving)


def finish_frame(result: RadianceResult, previous, frame_counter, camera_is_moving) -> jnp.ndarray:
    """Edge detection + accumulation protocol, shared by the jnp and Pallas
    trace paths (PathTracingCommon.js:1306-1357)."""
    normal_diff, object_diff, color_diff = detect_edges(result)
    sharp = result.pixel_sharpness
    sharp = jnp.where((color_diff >= 1.0) | (normal_diff >= 1.0) | (object_diff >= 1.0), 1.01, sharp)

    frame_counter = jnp.asarray(frame_counter, jnp.float32)
    moving = jnp.asarray(camera_is_moving, bool)

    prev = jnp.where(frame_counter == 1.0, 0.0, previous)
    prev_rgb = jnp.where(moving, prev[..., :3] * 0.5, prev[..., :3])
    prev_a = jnp.where(moving, 0.0, prev[..., 3])
    cur_rgb = jnp.where(moving, result.color * 0.5, result.color)

    cur_a = jnp.zeros_like(sharp)
    cur_a = jnp.where(sharp == 1.01, 1.01, cur_a)
    cur_a = jnp.where(sharp == -1.0, -1.0, cur_a)
    cur_a = jnp.where(prev_a == 1.01, 1.01, cur_a)  # sticky sharp
    cur_a = jnp.where(prev_a == -1.0, 0.0, cur_a)  # provisional clears

    return jnp.concatenate([prev_rgb + cur_rgb, cur_a[..., None]], axis=-1)
