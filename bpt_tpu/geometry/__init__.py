"""Analytic ray-primitive intersectors.

jnp re-implementations of every GLSL intersector include in
/root/reference/js/PathTracingCommon.js (sphere, cylinder, cone, paraboloid,
hyperboloid, capsule, flattened ring, box, pyramid/frustum, disk, rectangle,
torus, triangle/quad, AABB).  All functions are vectorized over arbitrary
leading ray dimensions, return the reference's INFINITY sentinel (1e6) on
miss, and are differentiable w.r.t. ray and shape parameters away from
silhouettes.
"""

from bpt_tpu.geometry.quadrics import (
    solve_quadratic,
    sphere_intersect,
    unit_sphere_intersect,
    unit_cylinder_intersect,
    unit_cone_intersect,
    unit_paraboloid_intersect,
    unit_hyperboloid_intersect,
    unit_capsule_intersect,
    unit_flattened_ring_intersect,
    unit_box_intersect,
    pyramid_frustum_intersect,
    unit_disk_intersect,
    unit_rectangle_intersect,
    unit_torus_intersect,
    UNIT_INTERSECTORS,
)
from bpt_tpu.geometry.triangles import (
    triangle_intersect,
    quad_intersect,
    bvh_triangle_intersect,
    bounding_box_intersect,
)
