"""Unit-space quadric intersectors (instanced via inverse object matrices).

Each function mirrors one GLSL include from
/root/reference/js/PathTracingCommon.js (line refs per function) and returns
``(t, n)``: the closest positive hit distance (INFINITY=1e6 on miss) and the
*unnormalized* object-space gradient normal, exactly as the GLSL outputs it —
callers normalize and transform to world space with the inverse-transpose.

Everything is branch-free (masked selects), vectorized over leading ray dims,
and `vmap`/`grad`/`jit`-compatible.  A shape-id dispatch table
(`UNIT_INTERSECTORS`) at the bottom serves the transformed-quadric scene,
which evaluates all twelve shapes per ray like the reference's sequential
SceneIntersect (/root/reference/js/TransformedQuadricGeometry_FragmentShader.js:77-317).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bpt_tpu.core.vecmath import INFINITY, dot, safe_inv, safe_sqrt


def _miss_n(ro):
    """Placeholder normal for miss lanes; value is irrelevant (masked out)."""
    return jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], ro.dtype), ro.shape)


def solve_quadratic(a, b, c):
    """Po-Shen-Loh-style stable quadratic roots (PathTracingCommon.js:627-643).

    GLSL quirk kept: when the discriminant is negative, *both* the sqrt term
    and -B/2 are zeroed, so t0 = t1 = 0 (an automatic miss since hits require
    t > 0).
    """
    inv_a = safe_inv(a)
    b = b * inv_a
    c = c * inv_a
    neg_half_b = -b * 0.5
    u2 = neg_half_b * neg_half_b - c
    real = u2 >= 0.0
    u = safe_sqrt(u2)
    neg_half_b = jnp.where(real, neg_half_b, 0.0)
    u = jnp.where(real, u, 0.0)
    return neg_half_b - u, neg_half_b + u


def _pick_two(t0, n0, ok0, t1, n1, ok1, ro):
    """Select t0 if valid else t1 if valid else INFINITY (GLSL if-chains)."""
    t = jnp.where(ok0, t0, jnp.where(ok1, t1, INFINITY))
    n = jnp.where(ok0[..., None], n0, jnp.where(ok1[..., None], n1, _miss_n(ro)))
    return t, n


def sphere_intersect(radius, pos, ro, rd):
    """World-space sphere; t only (PathTracingCommon.js:646-659)."""
    ell = ro - pos
    a = dot(rd, rd)
    b = 2.0 * dot(rd, ell)
    c = dot(ell, ell) - radius * radius
    t0, t1 = solve_quadratic(a, b, c)
    return jnp.where(t0 > 0.0, t0, jnp.where(t1 > 0.0, t1, INFINITY))


def unit_sphere_intersect(ro, rd):
    """Unit sphere at origin; n = 2*hit (PathTracingCommon.js:662-687)."""
    a = dot(rd, rd)
    b = 2.0 * dot(rd, ro)
    c = dot(ro, ro) - 1.0
    t0, t1 = solve_quadratic(a, b, c)
    h0 = ro + rd * t0[..., None]
    h1 = ro + rd * t1[..., None]
    return _pick_two(t0, 2.0 * h0, t0 > 0.0, t1, 2.0 * h1, t1 > 0.0, ro)


def _cyl_normal(hit):
    return jnp.stack([2.0 * hit[..., 0], jnp.zeros_like(hit[..., 1]), 2.0 * hit[..., 2]], axis=-1)


def unit_cylinder_intersect(ro, rd):
    """x^2+z^2=1, |y|<=1 (PathTracingCommon.js:690-716)."""
    a = rd[..., 0] ** 2 + rd[..., 2] ** 2
    b = 2.0 * (rd[..., 0] * ro[..., 0] + rd[..., 2] * ro[..., 2])
    c = ro[..., 0] ** 2 + ro[..., 2] ** 2 - 1.0
    t0, t1 = solve_quadratic(a, b, c)
    h0 = ro + rd * t0[..., None]
    h1 = ro + rd * t1[..., None]
    ok0 = (t0 > 0.0) & (jnp.abs(h0[..., 1]) <= 1.0)
    ok1 = (t1 > 0.0) & (jnp.abs(h1[..., 1]) <= 1.0)
    return _pick_two(t0, _cyl_normal(h0), ok0, t1, _cyl_normal(h1), ok1, ro)


def unit_cone_intersect(ro, rd, k):
    """Unit cone/frustum; k in [0.01, 1] sets apex sharpness
    (PathTracingCommon.js:719-750)."""
    k = jnp.clip(jnp.asarray(k, ro.dtype), 0.01, 1.0)
    j = 1.0 / k
    h = j * 2.0 - 1.0
    kq = k * 0.25
    a = j * rd[..., 0] ** 2 + j * rd[..., 2] ** 2 - kq * rd[..., 1] ** 2
    b = 2.0 * (j * rd[..., 0] * ro[..., 0] + j * rd[..., 2] * ro[..., 2] - kq * rd[..., 1] * (ro[..., 1] - h))
    c = j * ro[..., 0] ** 2 + j * ro[..., 2] ** 2 - kq * (ro[..., 1] - h) ** 2
    t0, t1 = solve_quadratic(a, b, c)

    def nrm(hit):
        return jnp.stack(
            [2.0 * hit[..., 0] * j, 2.0 * (h - hit[..., 1]) * kq, 2.0 * hit[..., 2] * j], axis=-1
        )

    h0 = ro + rd * t0[..., None]
    h1 = ro + rd * t1[..., None]
    ok0 = (t0 > 0.0) & (jnp.abs(h0[..., 1]) <= 1.0)
    ok1 = (t1 > 0.0) & (jnp.abs(h1[..., 1]) <= 1.0)
    return _pick_two(t0, nrm(h0), ok0, t1, nrm(h1), ok1, ro)


def unit_paraboloid_intersect(ro, rd):
    """Unit paraboloid, fixed k=0.5 (PathTracingCommon.js:753-780)."""
    k = 0.5
    a = rd[..., 0] ** 2 + rd[..., 2] ** 2
    b = 2.0 * (rd[..., 0] * ro[..., 0] + rd[..., 2] * ro[..., 2]) + k * rd[..., 1]
    c = ro[..., 0] ** 2 + ro[..., 2] ** 2 + k * (ro[..., 1] - 1.0)
    t0, t1 = solve_quadratic(a, b, c)

    def nrm(hit):
        return jnp.stack(
            [2.0 * hit[..., 0], jnp.full_like(hit[..., 1], 0.5), 2.0 * hit[..., 2]], axis=-1
        )

    h0 = ro + rd * t0[..., None]
    h1 = ro + rd * t1[..., None]
    ok0 = (t0 > 0.0) & (jnp.abs(h0[..., 1]) <= 1.0)
    ok1 = (t1 > 0.0) & (jnp.abs(h1[..., 1]) <= 1.0)
    return _pick_two(t0, nrm(h0), ok0, t1, nrm(h1), ok1, ro)


def unit_hyperboloid_intersect(ro, rd, k):
    """Unit hyperboloid; k remapped k^4*1000+1.2 (PathTracingCommon.js:783-813)."""
    k = jnp.asarray(k, ro.dtype)
    k = (k * k * k * k + 0.0012) * 1000.0
    j = k - 1.0
    a = k * rd[..., 0] ** 2 + k * rd[..., 2] ** 2 - j * rd[..., 1] ** 2
    b = 2.0 * (k * rd[..., 0] * ro[..., 0] + k * rd[..., 2] * ro[..., 2] - j * rd[..., 1] * ro[..., 1])
    c = (k * ro[..., 0] ** 2 + k * ro[..., 2] ** 2 - j * ro[..., 1] ** 2) - 1.0
    t0, t1 = solve_quadratic(a, b, c)

    def nrm(hit):
        return jnp.stack(
            [2.0 * hit[..., 0] * k, -2.0 * hit[..., 1] * j, 2.0 * hit[..., 2] * k], axis=-1
        )

    h0 = ro + rd * t0[..., None]
    h1 = ro + rd * t1[..., None]
    ok0 = (t0 > 0.0) & (jnp.abs(h0[..., 1]) <= 1.0)
    ok1 = (t1 > 0.0) & (jnp.abs(h1[..., 1]) <= 1.0)
    return _pick_two(t0, nrm(h0), ok0, t1, nrm(h1), ok1, ro)


def unit_capsule_intersect(ro, rd, k):
    """Two unit-radius sphere caps + cylinder; tests all t0's then all t1's
    (PathTracingCommon.js:816-892)."""
    k = jnp.asarray(k, ro.dtype) + 0.25

    def cap(center_y):
        # cap center is (0, center_y, 0); center_y broadcasts over ray dims
        ell = ro - center_y[..., None] * jnp.asarray([0.0, 1.0, 0.0], ro.dtype)
        a = dot(rd, rd)
        b = 2.0 * dot(rd, ell)
        c = dot(ell, ell) - 1.0
        return solve_quadratic(a, b, c)

    s0t0, s0t1 = cap(jnp.broadcast_to(k, jnp.shape(dot(ro, ro))))
    s1t0, s1t1 = cap(jnp.broadcast_to(-k, jnp.shape(dot(ro, ro))))

    a = rd[..., 0] ** 2 + rd[..., 2] ** 2
    b = 2.0 * (rd[..., 0] * ro[..., 0] + rd[..., 2] * ro[..., 2])
    c = ro[..., 0] ** 2 + ro[..., 2] ** 2 - 1.0
    t0, t1 = solve_quadratic(a, b, c)

    def cap_n(t, off):
        hit = ro + rd * t[..., None]
        return jnp.stack(
            [2.0 * hit[..., 0], 2.0 * (hit[..., 1] - off), 2.0 * hit[..., 2]], axis=-1
        )

    # Candidate list in the GLSL's priority order.
    cands = [
        (s0t0, cap_n(s0t0, k), (s0t0 > 0.0) & ((ro + rd * s0t0[..., None])[..., 1] >= k)),
        (s1t0, cap_n(s1t0, -k), (s1t0 > 0.0) & ((ro + rd * s1t0[..., None])[..., 1] <= -k)),
        (t0, _cyl_normal(ro + rd * t0[..., None]), (t0 > 0.0) & (jnp.abs((ro + rd * t0[..., None])[..., 1]) <= k)),
        (s0t1, cap_n(s0t1, k), (s0t1 > 0.0) & ((ro + rd * s0t1[..., None])[..., 1] >= k)),
        (s1t1, cap_n(s1t1, -k), (s1t1 > 0.0) & ((ro + rd * s1t1[..., None])[..., 1] <= -k)),
        (t1, _cyl_normal(ro + rd * t1[..., None]), (t1 > 0.0) & (jnp.abs((ro + rd * t1[..., None])[..., 1]) <= k)),
    ]
    t_out = jnp.full_like(t0, INFINITY)
    n_out = _miss_n(ro)
    for tc, nc, ok in reversed(cands):  # reversed so earlier entries win
        t_out = jnp.where(ok, tc, t_out)
        n_out = jnp.where(ok[..., None], nc, n_out)
    return t_out, n_out


def unit_flattened_ring_intersect(ro, rd, k):
    """CSG ring: outer cyl, annular disks, inner cyl, rear faces
    (PathTracingCommon.js:895-978).  k is the squared hole radius - 0.01."""
    k = jnp.asarray(k, ro.dtype) - 0.01
    a = rd[..., 0] ** 2 + rd[..., 2] ** 2
    b = 2.0 * (rd[..., 0] * ro[..., 0] + rd[..., 2] * ro[..., 2])
    c_outer = ro[..., 0] ** 2 + ro[..., 2] ** 2 - 1.0
    t0, t1 = solve_quadratic(a, b, c_outer)
    c0, c1 = solve_quadratic(a, b, c_outer + 1.0 - k)  # inner radius^2 = k

    d0 = -(ro[..., 1] - 1.0) * safe_inv(rd[..., 1])
    d1 = -(ro[..., 1] + 1.0) * safe_inv(rd[..., 1])

    def disk_ok(d):
        hit = ro + rd * d[..., None]
        x2z2 = hit[..., 0] ** 2 + hit[..., 2] ** 2
        return (d > 0.0) & (x2z2 <= 1.0) & (x2z2 > k)

    def side_ok(t):
        hit = ro + rd * t[..., None]
        return (t > 0.0) & (jnp.abs(hit[..., 1]) <= 1.0)

    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], ro.dtype), ro.shape)
    down = -up
    cands = [
        (t0, _cyl_normal(ro + rd * t0[..., None]), side_ok(t0)),
        (d0, up, (rd[..., 1] < 0.0) & disk_ok(d0)),
        (d1, down, (rd[..., 1] > 0.0) & disk_ok(d1)),
        (c0, _cyl_normal(ro + rd * c0[..., None]), side_ok(c0)),
        (c1, _cyl_normal(ro + rd * c1[..., None]), side_ok(c1)),
        (t1, _cyl_normal(ro + rd * t1[..., None]), side_ok(t1)),
        (d0, up, (rd[..., 1] > 0.0) & disk_ok(d0)),
        (d1, down, (rd[..., 1] < 0.0) & disk_ok(d1)),
    ]
    t_out = jnp.full_like(t0, INFINITY)
    n_out = _miss_n(ro)
    for tc, nc, ok in reversed(cands):
        t_out = jnp.where(ok, tc, t_out)
        n_out = jnp.where(ok[..., None], nc, n_out)
    return t_out, n_out


def unit_box_intersect(ro, rd):
    """Slab test on [-1,1]^3 with step-trick face normal
    (PathTracingCommon.js:981-1010)."""
    inv = safe_inv(rd)
    near = (-1.0 - ro) * inv
    far = (1.0 - ro) * inv
    tmin = jnp.minimum(near, far)
    tmax = jnp.maximum(near, far)
    t0 = jnp.max(tmin, axis=-1)
    t1 = jnp.min(tmax, axis=-1)

    def step(edge, x):
        return (x >= edge).astype(ro.dtype)

    def face_normal(tv):
        # -sign(rd) * step(tv.yzx, tv) * step(tv.zxy, tv)
        tv_yzx = jnp.roll(tv, -1, axis=-1)
        tv_zxy = jnp.roll(tv, -2, axis=-1)
        return -jnp.sign(rd) * step(tv_yzx, tv) * step(tv_zxy, tv)

    n_enter = face_normal(tmin)
    # exiting face uses step(tmax, tmax.yzx): true where tmax <= rolled
    tmax_yzx = jnp.roll(tmax, -1, axis=-1)
    tmax_zxy = jnp.roll(tmax, -2, axis=-1)
    n_exit = -jnp.sign(rd) * (tmax <= tmax_yzx).astype(ro.dtype) * (tmax <= tmax_zxy).astype(ro.dtype)

    ok = t0 < t1
    ok0 = ok & (t0 > 0.0)
    ok1 = ok & (t1 > 0.0)
    return _pick_two(t0, n_enter, ok0, t1, n_exit, ok1, ro)


def pyramid_frustum_intersect(ro, rd, k):
    """Pyramid/frustum: two orthogonal cone-like quadratics clipped to box
    extents; nearer of x-side/z-side wins (PathTracingCommon.js:1013-1074)."""
    k = jnp.clip(jnp.asarray(k, ro.dtype), 0.01, 1.0)
    j = 1.0 / k
    h = j * 2.0 - 1.0
    kq = k * 0.25

    def side(main, other):
        # main/other are component indices: (0, 2) for x-sides, (2, 0) for z.
        a = j * rd[..., main] ** 2 - kq * rd[..., 1] ** 2
        b = 2.0 * (j * rd[..., main] * ro[..., main] - kq * rd[..., 1] * (ro[..., 1] - h))
        c = j * ro[..., main] ** 2 - kq * (ro[..., 1] - h) ** 2
        t0, t1 = solve_quadratic(a, b, c)

        def valid(t):
            hit = ro + rd * t[..., None]
            inside_other = (j * hit[..., other] ** 2 - kq * (hit[..., 1] - h) ** 2) <= 0.0
            return (
                (t > 0.0)
                & (jnp.abs(hit[..., 0]) <= 1.0)
                & (jnp.abs(hit[..., 2]) <= 1.0)
                & (hit[..., 1] <= 1.0)
                & inside_other
            )

        def nrm(t):
            hit = ro + rd * t[..., None]
            comp_main = 2.0 * hit[..., main] * j
            comp_y = 2.0 * (hit[..., 1] - h) * -kq
            zeros = jnp.zeros_like(comp_y)
            if main == 0:
                return jnp.stack([comp_main, comp_y, zeros], axis=-1)
            return jnp.stack([zeros, comp_y, comp_main], axis=-1)

        ok0 = valid(t0)
        ok1 = valid(t1) & ~ok0
        t = jnp.where(ok0, t0, jnp.where(ok1, t1, INFINITY))
        n = jnp.where(ok0[..., None], nrm(t0), jnp.where(ok1[..., None], nrm(t1), _miss_n(ro)))
        return t, n

    xt, xn = side(0, 2)
    zt, zn = side(2, 0)
    use_x = xt <= zt
    return jnp.where(use_x, xt, zt), jnp.where(use_x[..., None], xn, zn)


def unit_disk_intersect(ro, rd):
    """y=0 disk, r<=1; caller supplies the normal
    (PathTracingCommon.js:1077-1086)."""
    t0 = -ro[..., 1] * safe_inv(rd[..., 1])
    hit = ro + rd * t0[..., None]
    ok = (t0 > 0.0) & (hit[..., 0] ** 2 + hit[..., 2] ** 2 <= 1.0)
    return jnp.where(ok, t0, INFINITY)


def unit_rectangle_intersect(ro, rd):
    """y=0 rectangle, |x|,|z|<=1 (PathTracingCommon.js:1089-1098)."""
    t0 = -ro[..., 1] * safe_inv(rd[..., 1])
    hit = ro + rd * t0[..., None]
    ok = (t0 > 0.0) & (jnp.abs(hit[..., 0]) <= 1.0) & (jnp.abs(hit[..., 2]) <= 1.0)
    return jnp.where(ok, t0, INFINITY)


def _map_torus(pos, k):
    """SDF: length(vec2(length(pos.xz) - (1-k), pos.y)) - k
    (PathTracingCommon.js:1105-1108)."""
    ring = jnp.sqrt(jnp.maximum(pos[..., 0] ** 2 + pos[..., 2] ** 2, 1e-20)) - (1.0 - k)
    return jnp.sqrt(jnp.maximum(ring * ring + pos[..., 1] ** 2, 1e-20)) - k


def unit_torus_intersect(ro, rd, k, max_steps: int = 500):
    """Hybrid analytic-bound + SDF ray march (PathTracingCommon.js:1101-1163).

    The GLSL marches up to 500 steps from the nearest of {bounding cylinder
    side, two cap disks}; we run a fixed-trip fori-style unrolled march whose
    step freezes once |d| < 0.01 — identical fixed point, static shape.
    """
    k = 1.0 - jnp.clip(jnp.asarray(k, ro.dtype), 0.01, 0.99)

    a = rd[..., 0] ** 2 + rd[..., 2] ** 2
    b = 2.0 * (rd[..., 0] * ro[..., 0] + rd[..., 2] * ro[..., 2])
    c = ro[..., 0] ** 2 + ro[..., 2] ** 2 - 1.0
    t0, t1 = solve_quadratic(a, b, c)
    h0y = (ro + rd * t0[..., None])[..., 1]
    h1y = (ro + rd * t1[..., None])[..., 1]
    tc = jnp.where(
        (t0 > 0.0) & (jnp.abs(h0y) <= k),
        t0,
        jnp.where((t1 > 0.0) & (jnp.abs(h1y) <= k), t1, INFINITY),
    )

    def disk(off):
        d = -(ro[..., 1] + off) * safe_inv(rd[..., 1])
        hit = ro + rd * d[..., None]
        ok = (d > 0.0) & (hit[..., 0] ** 2 + hit[..., 2] ** 2 <= 1.0)
        return jnp.where(ok, d, INFINITY)

    d0 = disk(k)
    d1 = disk(-k)
    t_start = jnp.minimum(jnp.minimum(d0, d1), tc)
    bounded = t_start < INFINITY
    # march start; unbounded lanes idle at 0 and freeze on the first step
    t_march0 = jnp.where(bounded, t_start, 0.0)

    def march_body(_, carry):
        # GLSL: d = map(ro + rd*t); if |d| < 0.01 break; t += d.
        # The break-without-advance is preserved: once |d_new| < 0.01 the lane
        # freezes (t unchanged, d holds the converged value).
        # Extra freeze vs the GLSL: lanes that leave the bounding volume
        # (t - t_start > 8, longer than any chord of the unit torus) stop
        # advancing — unbounded t doubles per step on miss lanes, overflows
        # f32 and NaN-poisons reverse-mode gradients through the masks.
        t, d = carry
        live = (jnp.abs(d) >= 0.01) & (t - t_march0 <= 8.0)
        d_new = _map_torus(ro + rd * t[..., None], k)
        t = jnp.where(live & (jnp.abs(d_new) >= 0.01), t + d_new, t)
        d = jnp.where(live, d_new, d)
        return t, d

    # Initial d large so the first iteration always evaluates.
    t_m, d_m = jax.lax.fori_loop(
        0, max_steps, march_body, (t_march0, jnp.full_like(t_start, INFINITY))
    )
    converged = bounded & (jnp.abs(d_m) < 0.01)
    pos = ro + rd * t_m[..., None]
    e = 0.5773 * 0.0002
    exyy = jnp.array([e, -e, -e], ro.dtype)
    eyyx = jnp.array([-e, -e, e], ro.dtype)
    eyxy = jnp.array([-e, e, -e], ro.dtype)
    exxx = jnp.array([e, e, e], ro.dtype)
    n = (
        exyy * _map_torus(pos + exyy, k)[..., None]
        + eyyx * _map_torus(pos + eyyx, k)[..., None]
        + eyxy * _map_torus(pos + eyxy, k)[..., None]
        + exxx * _map_torus(pos + exxx, k)[..., None]
    )
    t_out = jnp.where(converged, t_m, INFINITY)
    n_out = jnp.where(converged[..., None], n, _miss_n(ro))
    return t_out, n_out


def _disk_with_normal(ro, rd):
    # Reference supplies (0,1,0) for the disk plane normal at the call site
    # (TransformedQuadricGeometry_FragmentShader.js uses vec3(0,1,0)).
    t = unit_disk_intersect(ro, rd)
    return t, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], ro.dtype), ro.shape)


def _rect_with_normal(ro, rd):
    t = unit_rectangle_intersect(ro, rd)
    return t, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], ro.dtype), ro.shape)


# Shape ids for the transformed-quadric scene, in the reference's
# SceneIntersect order (TransformedQuadricGeometry_FragmentShader.js:77-317).
UNIT_INTERSECTORS = (
    ("sphere", lambda ro, rd, k: unit_sphere_intersect(ro, rd)),
    ("cylinder", lambda ro, rd, k: unit_cylinder_intersect(ro, rd)),
    ("cone", unit_cone_intersect),
    ("paraboloid", lambda ro, rd, k: unit_paraboloid_intersect(ro, rd)),
    ("hyperboloid", unit_hyperboloid_intersect),
    ("capsule", unit_capsule_intersect),
    ("flattened_ring", unit_flattened_ring_intersect),
    ("box", lambda ro, rd, k: unit_box_intersect(ro, rd)),
    ("pyramid_frustum", pyramid_frustum_intersect),
    ("disk", lambda ro, rd, k: _disk_with_normal(ro, rd)),
    ("rectangle", lambda ro, rd, k: _rect_with_normal(ro, rd)),
    ("torus", unit_torus_intersect),
)
