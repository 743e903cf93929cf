"""Analytic intersector property tests.

Strategy per SURVEY.md §4: the reference ships no tests; ours assert the
geometric invariants each GLSL intersector relies on — hit point on the
implicit surface, normal parallel to the implicit gradient, miss sentinel
INFINITY, front-to-back ordering.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.core.vecmath import INFINITY, dot, normalize
from bpt_tpu.geometry import (
    bounding_box_intersect,
    bvh_triangle_intersect,
    quad_intersect,
    sphere_intersect,
    triangle_intersect,
    unit_box_intersect,
    unit_capsule_intersect,
    unit_cone_intersect,
    unit_cylinder_intersect,
    unit_disk_intersect,
    unit_flattened_ring_intersect,
    unit_hyperboloid_intersect,
    unit_paraboloid_intersect,
    unit_rectangle_intersect,
    unit_sphere_intersect,
    unit_torus_intersect,
    pyramid_frustum_intersect,
)


def ray(o, d):
    return jnp.asarray(o, jnp.float32), normalize(jnp.asarray(d, jnp.float32))


def test_unit_sphere_hit_and_miss():
    ro, rd = ray([0, 0, -3], [0, 0, 1])
    t, n = unit_sphere_intersect(ro, rd)
    np.testing.assert_allclose(float(t), 2.0, atol=1e-5)
    # normal = 2 * hit (unnormalized gradient), points back toward ray origin
    np.testing.assert_allclose(np.asarray(normalize(n)), [0, 0, -1], atol=1e-5)

    ro, rd = ray([0, 0, -3], [0, 1, 0])
    t, _ = unit_sphere_intersect(ro, rd)
    assert float(t) == INFINITY


def test_unit_sphere_inside_returns_far_root():
    ro, rd = ray([0, 0, 0], [0, 0, 1])
    t, n = unit_sphere_intersect(ro, rd)
    np.testing.assert_allclose(float(t), 1.0, atol=1e-5)


def test_world_sphere():
    ro, rd = ray([0, 0, -5], [0, 0, 1])
    t = sphere_intersect(2.0, jnp.asarray([0.0, 0.0, 0.0]), ro, rd)
    np.testing.assert_allclose(float(t), 3.0, atol=1e-5)


def test_unit_cylinder_caps_y():
    ro, rd = ray([-3, 0.5, 0], [1, 0, 0])
    t, n = unit_cylinder_intersect(ro, rd)
    hit = np.asarray(ro + rd * t)
    np.testing.assert_allclose(hit[0] ** 2 + hit[2] ** 2, 1.0, atol=1e-5)
    # above the y extent -> miss
    ro2, rd2 = ray([-3, 1.5, 0], [1, 0, 0])
    t2, _ = unit_cylinder_intersect(ro2, rd2)
    assert float(t2) == INFINITY


@pytest.mark.parametrize(
    "fn,k",
    [
        (unit_cone_intersect, 0.5),
        (unit_paraboloid_intersect, None),
        (unit_hyperboloid_intersect, 0.5),
        (unit_capsule_intersect, 0.8),
        (unit_flattened_ring_intersect, 0.3),
        (pyramid_frustum_intersect, 0.7),
    ],
)
def test_quadric_family_horizontal_hit(fn, k):
    """A horizontal ray through the middle must hit every one of these."""
    ro, rd = ray([-5, 0.0, 0], [1, 0, 0])
    if k is None:
        t, n = fn(ro, rd)
    else:
        t, n = fn(ro, rd, k)
    t = float(t)
    assert 0 < t < INFINITY
    n = np.asarray(normalize(n))
    # surface normal must face back along the ray's x direction
    assert n[0] < 0.0


def test_unit_box_normals_and_inside():
    ro, rd = ray([-3, 0.2, 0.3], [1, 0, 0])
    t, n = unit_box_intersect(ro, rd)
    np.testing.assert_allclose(float(t), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n), [-1, 0, 0], atol=1e-6)
    # from inside: exit face normal
    ro2, rd2 = ray([0, 0, 0], [1, 0, 0])
    t2, n2 = unit_box_intersect(ro2, rd2)
    np.testing.assert_allclose(float(t2), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n2), [-1, 0, 0], atol=1e-6)


def test_disk_rectangle_plane():
    ro, rd = ray([0.2, 2, 0.1], [0, -1, 0])
    t = unit_disk_intersect(ro, rd)
    np.testing.assert_allclose(float(t), 2.0, atol=1e-5)
    t = unit_rectangle_intersect(ro, rd)
    np.testing.assert_allclose(float(t), 2.0, atol=1e-5)
    # outside the unit disk radius but inside the rectangle
    ro2, rd2 = ray([0.9, 2, 0.9], [0, -1, 0])
    assert float(unit_disk_intersect(ro2, rd2)) == INFINITY
    assert float(unit_rectangle_intersect(ro2, rd2)) < INFINITY


def test_torus_march_converges():
    ro, rd = ray([-3, 0.0, 0], [1, 0, 0])
    t, n = unit_torus_intersect(ro, rd, 0.3)
    t = float(t)
    # torus tube: outer radius 1, hit near x = -1
    assert 1.5 < t < 2.5
    n = np.asarray(normalize(n))
    assert n[0] < -0.9
    # k is the INNER radius (PathTracingCommon.js:1110-1116): k=0.9 is a thin
    # ring whose hole spans r < 0.9 — a ray straight down the +y axis through
    # the center must miss
    ro2, rd2 = ray([0, 3, 0], [0, -1, 0])
    t2, _ = unit_torus_intersect(ro2, rd2, 0.9)
    assert float(t2) == INFINITY


def test_triangle_backface_culling():
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    ro, rd = ray([0.2, 0.2, -1], [0, 0, 1])
    t_front = triangle_intersect(v0, v1, v2, ro, rd, double_sided=False)
    ro2, rd2 = ray([0.2, 0.2, 1], [0, 0, -1])
    t_back = triangle_intersect(v0, v1, v2, ro2, rd2, double_sided=False)
    t_back_ds = triangle_intersect(v0, v1, v2, ro2, rd2, double_sided=True)
    # winding (v0,v1,v2) with CCW-from--z: det sign decides which side culls
    assert (float(t_front) == INFINITY) != (float(t_back) == INFINITY)
    assert float(t_back_ds) < INFINITY


def test_bvh_triangle_barycentrics():
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    ro, rd = ray([0.25, 0.5, 1], [0, 0, -1])
    t, u, v = bvh_triangle_intersect(v0, v1, v2, ro, rd, double_sided=True)
    np.testing.assert_allclose(float(t), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(u), 0.25, atol=1e-5)
    np.testing.assert_allclose(float(v), 0.5, atol=1e-5)


def test_quad_covers_both_triangles():
    v0 = jnp.asarray([-1.0, -1.0, 0.0])
    v1 = jnp.asarray([1.0, -1.0, 0.0])
    v2 = jnp.asarray([1.0, 1.0, 0.0])
    v3 = jnp.asarray([-1.0, 1.0, 0.0])
    for px, py in [(-0.5, -0.5), (0.5, 0.5), (-0.5, 0.5), (0.5, -0.5)]:
        ro, rd = ray([px, py, -2], [0, 0, 1])
        t = quad_intersect(v0, v1, v2, v3, ro, rd, double_sided=True)
        np.testing.assert_allclose(float(t), 2.0, atol=1e-5)


def test_aabb_slab_inside_opens():
    mn = jnp.asarray([-1.0, -1.0, -1.0])
    mx = jnp.asarray([1.0, 1.0, 1.0])
    ro, rd = ray([0, 0, 0], [0, 0, 1])
    t = bounding_box_intersect(mn, mx, ro, 1.0 / rd)
    # origin inside: t0 negative but box must still report a hit (t0, not INF)
    assert float(t) < 0.0
    ro2, rd2 = ray([0, 5, 0], [0, 1, 0])
    t2 = bounding_box_intersect(mn, mx, ro2, 1.0 / rd2)
    assert float(t2) == INFINITY


def test_batched_shapes_broadcast():
    ro = jnp.zeros((4, 8, 3)) + jnp.asarray([0.0, 0.0, -3.0])
    rd = jnp.zeros((4, 8, 3)) + jnp.asarray([0.0, 0.0, 1.0])
    t, n = unit_sphere_intersect(ro, rd)
    assert t.shape == (4, 8)
    assert n.shape == (4, 8, 3)
    np.testing.assert_allclose(np.asarray(t), 2.0, atol=1e-5)
