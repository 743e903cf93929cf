"""Camera model and primary-ray generation (AA jitter + thin-lens DoF).

Functional analog of the reference's per-pixel camera code in
`pathtracing_default_main` (/root/reference/js/PathTracingCommon.js:1259-1292)
plus the host-side film-plane setup `uVLen = tan(fov/2), uULen = uVLen*aspect`
(/root/reference/js/Babylon_Path_Tracing.js:176-177).

Coordinate system is Babylon's left-handed Y-up (forward = +Z at zero yaw);
yaw/pitch compose in Babylon's YXZ order so reference camera positions and
rotations can be copied verbatim into demo configs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bpt_tpu.core.rng import RngState, rng_next
from bpt_tpu.core.sampling import TWO_PI, tent_filter
from bpt_tpu.core.vecmath import normalize, safe_sqrt


class Camera(NamedTuple):
    """Pinhole + thin-lens camera. All fields are differentiable leaves."""

    position: jnp.ndarray  # (3,)
    right: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    forward: jnp.ndarray  # (3,)
    fov: jnp.ndarray  # vertical field of view, radians (scalar)
    aperture_size: jnp.ndarray  # scalar, world units (uApertureSize)
    focus_distance: jnp.ndarray  # scalar (uFocusDistance)

    @staticmethod
    def look(position, yaw=0.0, pitch=0.0, fov=1.0471975512, aperture_size=0.0, focus_distance=100.0) -> "Camera":
        """Build a camera from Babylon-style yaw (rotation.y) / pitch (rotation.x).

        Basis = Ry(yaw) @ Rx(pitch) applied to the LH canonical frame, matching
        Babylon's YXZ rotation order used by the reference's flight camera.
        """
        yaw = jnp.asarray(yaw, jnp.float32)
        pitch = jnp.asarray(pitch, jnp.float32)
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        cp, sp = jnp.cos(pitch), jnp.sin(pitch)
        forward = jnp.stack([sy * cp, -sp, cy * cp])
        right = jnp.stack([cy, jnp.zeros_like(cy), -sy])
        up = jnp.cross(forward, right)  # LH: up = forward x right
        return Camera(
            position=jnp.asarray(position, jnp.float32),
            right=right,
            up=up,
            forward=forward,
            fov=jnp.asarray(fov, jnp.float32),
            aperture_size=jnp.asarray(aperture_size, jnp.float32),
            focus_distance=jnp.asarray(focus_distance, jnp.float32),
        )

    def world_matrix(self) -> jnp.ndarray:
        """4x4 row-layout matrix [right; up; forward; position] — the
        uCameraMatrix the reference reads back per pixel
        (PathTracingCommon.js:1259-1262).  Used by the host-side
        "camera moved?" 16-float comparison."""
        m = jnp.zeros((4, 4), jnp.float32)
        m = m.at[0, :3].set(self.right)
        m = m.at[1, :3].set(self.up)
        m = m.at[2, :3].set(self.forward)
        m = m.at[3, :3].set(self.position)
        return m.at[3, 3].set(1.0)


def film_extents(camera: Camera, width: int, height: int):
    """uVLen = tan(fov*0.5); uULen = uVLen * aspect (Babylon_Path_Tracing.js:176)."""
    vlen = jnp.tan(camera.fov * 0.5)
    ulen = vlen * (width / height)
    return ulen, vlen


def generate_rays(
    camera: Camera,
    px: jnp.ndarray,
    py: jnp.ndarray,
    width: int,
    height: int,
    rng: RngState,
) -> tuple[jnp.ndarray, jnp.ndarray, RngState]:
    """Primary rays for pixel coordinates (px, py) with tent-filter AA and
    thin-lens depth of field (PathTracingCommon.js:1276-1292).

    px/py are integer pixel coords with origin at the image's *bottom-left*
    (gl_FragCoord convention); any leading shape. Consumes exactly 4 RNG
    draws per pixel: tent-x, tent-y, aperture angle, aperture radius.
    """
    ulen, vlen = film_extents(camera, width, height)

    tx, rng = rng_next(rng)
    ty, rng = rng_next(rng)
    offset_x = tent_filter(tx)
    offset_y = tent_filter(ty)

    # gl_FragCoord.xy is the pixel center: integer coord + 0.5.
    ndc_x = ((px.astype(jnp.float32) + 0.5 + offset_x) / width) * 2.0 - 1.0
    ndc_y = ((py.astype(jnp.float32) + 0.5 + offset_y) / height) * 2.0 - 1.0

    ray_dir = normalize(
        ndc_x[..., None] * camera.right * ulen
        + ndc_y[..., None] * camera.up * vlen
        + camera.forward
    )

    # Thin-lens DoF: random point on the aperture disk, focal point along the
    # (pre-perturbation) ray at uFocusDistance.
    ra, rng = rng_next(rng)
    rr, rng = rng_next(rng)
    angle = ra * TWO_PI
    radius = rr * camera.aperture_size
    aperture_offset = (
        jnp.cos(angle)[..., None] * camera.right + jnp.sin(angle)[..., None] * camera.up
    ) * safe_sqrt(radius)[..., None]
    focal_point = camera.focus_distance * ray_dir
    final_dir = normalize(focal_point - aperture_offset)

    ray_origin = camera.position + aperture_offset
    return ray_origin, final_dir, rng
