"""Triangle / quad / AABB intersectors.

Möller–Trumbore in the reference's exact formulation (inverse-determinant
first, backface cull via det sign) and the BVH slab test.
References: pathtracing_quad_intersect (PathTracingCommon.js:1166-1189),
pathtracing_bvhTriangle_intersect (:1212-1247),
pathtracing_boundingbox_intersect (:1192-1209).
"""

from __future__ import annotations

import jax.numpy as jnp

from bpt_tpu.core.vecmath import INFINITY, cross, dot, safe_inv


def triangle_intersect(v0, v1, v2, ro, rd, double_sided: bool = False):
    """Möller–Trumbore; returns t (INFINITY on miss).

    `double_sided=False` rejects det < 0 (backface cull), matching
    TriangleIntersect's `!isDoubleSided && det < 0.0` (PathTracingCommon.js:1174).
    Broadcasts over any combination of ray/triangle leading dims.
    """
    t, _, _ = _mt_core(v0, v1, v2, ro, rd, double_sided)
    return t


def bvh_triangle_intersect(v0, v1, v2, ro, rd, double_sided: bool = False):
    """Möller–Trumbore with barycentric (u, v) outputs for attribute lerp.

    Single-sided variant culls `det < 0` like BVH_TriangleIntersect
    (PathTracingCommon.js:1212-1228); double-sided keeps both windings
    (:1231-1247).
    Returns (t, u, v).
    """
    return _mt_core(v0, v1, v2, ro, rd, double_sided)


def _mt_core(v0, v1, v2, ro, rd, double_sided):
    edge1 = v1 - v0
    edge2 = v2 - v0
    pvec = cross(rd, edge2)
    raw_det = dot(edge1, pvec)
    det = safe_inv(raw_det)  # GLSL computes this unguarded; clamped for finite grads
    tvec = ro - v0
    u = dot(tvec, pvec) * det
    qvec = cross(tvec, edge1)
    v = dot(rd, qvec) * det
    t = dot(edge2, qvec) * det
    miss = (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0) | (t <= 0.0)
    if not double_sided:
        miss = miss | (raw_det < 0.0)
    # NaN (raw_det == 0) lanes: comparisons above are False for NaN, so force miss.
    miss = miss | jnp.isnan(t)
    return jnp.where(miss, INFINITY, t), u, v


def quad_intersect(v0, v1, v2, v3, ro, rd, double_sided: bool = False):
    """min of the two triangle fans (v0,v1,v2) and (v0,v2,v3)
    (PathTracingCommon.js:1184-1187)."""
    t_a = triangle_intersect(v0, v1, v2, ro, rd, double_sided)
    t_b = triangle_intersect(v0, v2, v3, ro, rd, double_sided)
    return jnp.minimum(t_a, t_b)


def bounding_box_intersect(min_corner, max_corner, ro, inv_dir):
    """AABB slab test: returns entry t0, or INFINITY if the box is missed or
    entirely behind the ray (`max(t0,0) > t1`, PathTracingCommon.js:1206).

    Note t0 may be negative when the origin is inside the box — the traversal
    relies on that (a containing node must still be opened).
    """
    near = (min_corner - ro) * inv_dir
    far = (max_corner - ro) * inv_dir
    tmin = jnp.minimum(near, far)
    tmax = jnp.maximum(near, far)
    t0 = jnp.max(tmin, axis=-1)
    t1 = jnp.min(tmax, axis=-1)
    return jnp.where(jnp.maximum(t0, 0.0) > t1, INFINITY, t0)
