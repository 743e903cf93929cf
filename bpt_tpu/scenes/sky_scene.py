"""Physical-sky (Preetham) demo scene.

Open Cornell box — back/left/right walls + floor, NO ceiling and NO quad
light (/root/reference/js/PhysicalSkyModel_FragmentShader.js:383-399) — with
the same two matrix-instanced spheres as the Cornell demo.  The sun is the
only light; its direction comes from a Babylon TransformNode's forward vector
with GUI rotations (init X=298°, Y=318°,
/root/reference/js/Physical_Sky_Model.js:188-193, 574).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bpt_tpu.camera import Camera
from bpt_tpu.scenes.cornell import WALL_RADIUS, SPHERE_RADIUS
from bpt_tpu.scenes.types import (
    CLEARCOAT_DIFFUSE,
    DIFFUSE,
    METAL,
    Environment,
    Quads,
    Scene,
    UnitSpheres,
    make_quad,
    quads_from_rows,
)
from bpt_tpu.utils.transforms import invert_rigid, trs_matrix


def sun_direction_from_rotation(rot_x_deg, rot_y_deg) -> jnp.ndarray:
    """Babylon TransformNode.forward for rotation (x, y, 0) in YXZ order:
    the +Z axis rotated — matching uSunDirection.copyFrom(node.forward)
    (Physical_Sky_Model.js:390, 574).  Differentiable w.r.t. both angles."""
    rx = jnp.deg2rad(jnp.asarray(rot_x_deg, jnp.float32))
    ry = jnp.deg2rad(jnp.asarray(rot_y_deg, jnp.float32))
    cp, sp = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    return jnp.stack([sy * cp, -sp, cy * cp])


def physical_sky_scene(
    sun_rot_x_deg=298.0, sun_rot_y_deg=318.0, right_sphere_mat: int = METAL
) -> Scene:
    """Open box + 2 spheres + Preetham sun (PhysicalSkyModel_FragmentShader.js:383-399)."""
    w = WALL_RADIUS
    rows = [
        make_quad((0, 0, 1), (-w, w, w), (w, w, w), (w, -w, w), (-w, -w, w), (1, 1, 1), DIFFUSE),
        make_quad((1, 0, 0), (-w, -w, w), (-w, -w, -w), (-w, w, -w), (-w, w, w), (0.7, 0.05, 0.05), DIFFUSE),
        make_quad((-1, 0, 0), (w, -w, -w), (w, -w, w), (w, w, w), (w, w, -w), (0.05, 0.05, 0.7), DIFFUSE),
        make_quad((0, 1, 0), (-w, -w, w), (w, -w, w), (w, -w, -w), (-w, -w, -w), (1, 1, 1), DIFFUSE),
    ]
    quads = quads_from_rows(rows)

    sr = SPHERE_RADIUS
    left_m = trs_matrix(translation=(-w * 0.45, -w + sr + 0.1, -w * 0.2), scale=(sr, sr, sr))
    right_m = trs_matrix(translation=(w * 0.45, -w + sr + 0.1, -w * 0.2), scale=(sr, sr, sr))
    spheres = UnitSpheres(
        inv_matrix=jnp.stack([invert_rigid(left_m), invert_rigid(right_m)]),
        color=jnp.asarray(np.array([[1.0, 1.0, 0.0], [1.0, 1.0, 1.0]], np.float32)),
        mat_type=jnp.asarray(np.array([CLEARCOAT_DIFFUSE, right_sphere_mat], np.int32)),
    )
    env = Environment(
        sun_direction=sun_direction_from_rotation(sun_rot_x_deg, sun_rot_y_deg),
        sun_power=jnp.asarray(1.0, jnp.float32),
    )
    return Scene(quads=quads, spheres=spheres, env=env)


def sky_camera() -> Camera:
    """Demo start camera (Physical_Sky_Model.js:236)."""
    return Camera.look(
        position=(0.0, -10.0, -200.0), fov=0.8, aperture_size=0.0, focus_distance=113.0
    )
