"""Transformed-quadric-geometry demo scene.

Reproduces the 12 floor-grid TransformNodes of
/root/reference/js/Transformed_Quadric_Geometry.js:408-454 (shapeRadius 10,
wallRadius 50) and the Cornell box + selectable quad light of its
SetupScene (/root/reference/js/TransformedQuadricGeometry_FragmentShader.js:546-572).
Shape order matches bpt_tpu.geometry.quadrics.UNIT_INTERSECTORS.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bpt_tpu.camera import Camera
from bpt_tpu.scenes.cornell import cornell_walls_rows, quad_light_rows
from bpt_tpu.scenes.types import CLEARCOAT_DIFFUSE, Quadrics, Scene, quads_from_rows
from bpt_tpu.utils.transforms import invert_rigid, trs_matrix

WALL_RADIUS = 50.0
SHAPE_RADIUS = 10.0

# (x, y, z) positions per shape, in UNIT_INTERSECTORS order
# (Transformed_Quadric_Geometry.js:408-454).  w = WALL_RADIUS, s = SHAPE_RADIUS.
def _positions(w: float, s: float):
    base_y = -w + s + 0.01
    return [
        (-w * 0.75, base_y, -w * 0.75),  # sphere
        (w * 0.75, base_y, -w * 0.75),  # cylinder
        (-w * 0.25, base_y, 0.0),  # cone
        (w * 0.25, base_y, 0.0),  # paraboloid
        (-w * 0.25, base_y, -w * 0.75),  # hyperboloid
        (-w * 0.25, -w + 2.25 * s + 0.01, w * 0.75),  # capsule (taller)
        (w * 0.75, base_y, 0.0),  # flattened ring
        (w * 0.25, base_y, w * 0.75),  # box
        (-w * 0.75, base_y, 0.0),  # pyramid/frustum
        (w * 0.75, base_y, w * 0.75),  # disk
        (-w * 0.75, base_y, w * 0.75),  # rectangle
        (w * 0.25, base_y, -w * 0.75),  # torus
    ]


def quadric_geometry_scene(
    shape_k: float = 0.5,
    all_shapes_mat: int = CLEARCOAT_DIFFUSE,
    quad_light_plane: int = 6,
    quad_light_radius: float = 50.0,
    extra_rotation=(0.0, 0.0, 0.0),
    extra_translation=(0.0, 0.0, 0.0),
    extra_scale=(1.0, 1.0, 1.0),
) -> Scene:
    """All 12 shapes share uShapeK / uAllShapesMatType and the GUI's global
    transform folders (applied to every shape, Transformed_Quadric_Geometry.js:342-378)."""
    rows = cornell_walls_rows()
    rows.append(quad_light_rows(quad_light_plane, quad_light_radius))
    quads = quads_from_rows(rows)

    inv_ms = []
    for px, py, pz in _positions(WALL_RADIUS, SHAPE_RADIUS):
        m = trs_matrix(
            translation=(
                px + extra_translation[0],
                py + extra_translation[1],
                pz + extra_translation[2],
            ),
            rotation=extra_rotation,
            scale=(
                SHAPE_RADIUS * extra_scale[0],
                SHAPE_RADIUS * extra_scale[1],
                SHAPE_RADIUS * extra_scale[2],
            ),
        )
        inv_ms.append(invert_rigid(m))

    quadrics = Quadrics(
        inv_matrix=jnp.stack(inv_ms),
        shape_k=jnp.asarray(shape_k, jnp.float32),
        color=jnp.ones((12, 3), jnp.float32),
        mat_type=jnp.full((12,), all_shapes_mat, jnp.int32),
    )
    return Scene(quads=quads, quadrics=quadrics)


def quadric_camera() -> Camera:
    """Demo start camera (Transformed_Quadric_Geometry.js:391-396)."""
    return Camera.look(
        position=(0.0, -20.0, -120.0), fov=0.8, aperture_size=0.0, focus_distance=113.0
    )
