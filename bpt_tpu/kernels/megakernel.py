"""Fused Pallas ray-tile megakernel for the Cornell-, quadric- and
physical-sky-family scenes (quads + matrix-instanced unit spheres + the 12
transformed quadrics; quad-light NEE with env "none", or sun-lobe NEE with
the Preetham env "sky").

This is the TPU-native analog of the reference's compiled fragment shader
(BabylonPathTracing_FragmentShader.js + pathtracing_default_main): one
kernel program per row-tile computes ray-gen → N-bounce radiance → first-hit
records, holding ALL per-path state (ray, mask, accumulated color, flags) in
VMEM/registers for the whole bounce loop — no HBM round-trips between
bounces, which is what the unfused XLA graph pays for.

Layout: everything is component-form SoA — a 3-vector is three (TILE_ROWS, W)
planes — so the lane dimension is the image width (multiple of 128) and the
VPU sees full tiles.  Small scene constants (quad vertices, sphere inverse
matrices, camera) live in SMEM and are read as scalars.

RNG parity: the kernel consumes exactly the same fixed draw schedule as
bpt_tpu.integrator.radiance (4 ray-gen draws, then per bounce: blue-noise
gates ch (2b)%4,(2b+1)%4, hemisphere 2, quad-light 3), with the same
uint32 hash and mantissa-bitcast float construction — outputs match the jnp
reference to float tolerance (see tests/test_kernels.py).

Differentiation (path-replay, fused): with ``param_grads=True`` the SAME
forward kernel also emits, per object j and channel c, the plane
``s[j,c] = Σ_bounces-hitting-j ∂log f_b / ∂ color[j,c]`` — the path-replay
backpropagation sum computed during the forward replay itself (every
throughput factor is either independent of material color, linear in it,
or Beer-Lambert exp(k·log c), so ∂log f/∂c is 1/c resp. k/c).  The
custom_vjp backward is then pure elementwise math + a reduction:
``∂L/∂c[j] = Σ_pixels adj·color·s[j]`` (+ the first-hit record term via the
object-id plane) — no second kernel, no per-bounce residuals, O(1) memory
in bounce depth.  Exact for the integrator's detached-sampling estimator
wherever color > 0 (a zero channel zeroes the path's radiance, and its
gradient is detached — the documented PRB bias).  Camera/geometry params
fall back to the jnp integrator's AD (same draws ⇒ same program).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpt_tpu.integrator.config import IntegratorConfig
from bpt_tpu.scenes.types import (
    CLEARCOAT_DIFFUSE,
    DIFFUSE,
    LIGHT,
    METAL,
    TRANSPARENT,
    Scene,
)

INFINITY = 1.0e6
TWO_PI = 6.28318530717958648
# Woop leaf-row formulation switch (see _mesh_walk.woop_rows): the
# row-winner variant keeps fewer live planes and halves the improve-path
# ops; flip for A/B on real silicon (results are identical up to FP ties).
WOOP_ROW_WINNER = False


# ---------------------------------------------------------------------------
# component-form vector helpers ((TH, W) planes)
# ---------------------------------------------------------------------------

def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _rsqrt_safe(x):
    return jax.lax.rsqrt(jnp.maximum(x, 1e-20))


def _normalize(x, y, z):
    inv = _rsqrt_safe(_dot(x, y, z, x, y, z))
    return x * inv, y * inv, z * inv


def _safe_sqrt(x):
    return jnp.sqrt(jnp.where(x > 1e-20, x, 1e-20))


def _safe_inv(x):
    ax = jnp.abs(x)
    return jnp.sign(jnp.where(x == 0.0, 1.0, x)) / jnp.where(ax > 1e-12, ax, 1e-12)


def _reflect(ix, iy, iz, nx, ny, nz):
    d = 2.0 * _dot(nx, ny, nz, ix, iy, iz)
    return ix - d * nx, iy - d * ny, iz - d * nz


def _rng_next(sx, sy):
    """One hash draw; returns (value in [0,1), sx, sy). Matches core.rng.

    Python int literals (not jnp scalars) so the traced kernel has no
    captured array constants, which pallas_call rejects.
    """
    sx = sx + 1
    sy = sy + 1
    qx = ((sx >> 1) ^ sy) * 1103515245
    qy = ((sy >> 1) ^ sx) * 1103515245
    n = (qx ^ (qy >> 3)) * 1103515245
    bits = (n >> 9) | 0x3F800000
    return pltpu.bitcast(bits, jnp.float32) - 1.0, sx, sy


def _tent(x):
    return jnp.where(
        x < 0.5, _safe_sqrt(2.0 * x) - 1.0, 1.0 - _safe_sqrt(2.0 - 2.0 * x)
    )


# ---------------------------------------------------------------------------
# component-form unit-space quadric intersectors
#
# Mirrors bpt_tpu.geometry.quadrics (itself mirroring the GLSL includes of
# /root/reference/js/PathTracingCommon.js:646-1163) with every vec3 as three
# (TH, W) planes.  Each returns (t, nx, ny, nz); t = INFINITY on miss; the
# normal is the unnormalized object-space gradient.
# ---------------------------------------------------------------------------

def _solve_quadratic_c(a, b, c):
    inv_a = _safe_inv(a)
    b = b * inv_a
    c = c * inv_a
    nhb = -b * 0.5
    u2 = nhb * nhb - c
    real = u2 >= 0.0
    u = jnp.where(real, _safe_sqrt(u2), 0.0)
    nhb = jnp.where(real, nhb, 0.0)
    return nhb - u, nhb + u


def _pick2(t0, n0, ok0, t1, n1, ok1):
    t = jnp.where(ok0, t0, jnp.where(ok1, t1, INFINITY))
    n = tuple(
        jnp.where(ok0, a, jnp.where(ok1, b, m))
        for a, b, m in zip(n0, n1, (t * 0.0, t * 0.0 + 1.0, t * 0.0))
    )
    return t, n[0], n[1], n[2]


def _prio_chain(cands):
    """GLSL if-chain: first valid candidate wins (reversed-select loop)."""
    t_out = jnp.full_like(cands[0][0], INFINITY)
    nx = t_out * 0.0
    ny = nx + 1.0
    nz = nx
    for tc, (cx, cy, cz), ok in reversed(cands):
        t_out = jnp.where(ok, tc, t_out)
        nx = jnp.where(ok, cx, nx)
        ny = jnp.where(ok, cy, ny)
        nz = jnp.where(ok, cz, nz)
    return t_out, nx, ny, nz


def _hit_at(ro, rd, t):
    return tuple(o + d * t for o, d in zip(ro, rd))


def _q_sphere(ro, rd, k):
    a = _dot(*rd, *rd)
    b = 2.0 * _dot(*rd, *ro)
    c = _dot(*ro, *ro) - 1.0
    t0, t1 = _solve_quadratic_c(a, b, c)
    return _pick2(t0, _hit_at(ro, rd, t0), t0 > 0.0, t1, _hit_at(ro, rd, t1), t1 > 0.0)


def _cyl_parts(ro, rd, r2_minus=1.0):
    a = rd[0] * rd[0] + rd[2] * rd[2]
    b = 2.0 * (rd[0] * ro[0] + rd[2] * ro[2])
    c = ro[0] * ro[0] + ro[2] * ro[2] - r2_minus
    return _solve_quadratic_c(a, b, c)


def _cyl_n(h):
    return (2.0 * h[0], h[1] * 0.0, 2.0 * h[2])


def _q_cylinder(ro, rd, k):
    t0, t1 = _cyl_parts(ro, rd)
    h0 = _hit_at(ro, rd, t0)
    h1 = _hit_at(ro, rd, t1)
    ok0 = (t0 > 0.0) & (jnp.abs(h0[1]) <= 1.0)
    ok1 = (t1 > 0.0) & (jnp.abs(h1[1]) <= 1.0)
    return _pick2(t0, _cyl_n(h0), ok0, t1, _cyl_n(h1), ok1)


def _q_cone(ro, rd, k):
    k = jnp.clip(k, 0.01, 1.0)
    j = 1.0 / k
    h = j * 2.0 - 1.0
    kq = k * 0.25
    a = j * rd[0] * rd[0] + j * rd[2] * rd[2] - kq * rd[1] * rd[1]
    b = 2.0 * (j * rd[0] * ro[0] + j * rd[2] * ro[2] - kq * rd[1] * (ro[1] - h))
    c = j * ro[0] * ro[0] + j * ro[2] * ro[2] - kq * (ro[1] - h) * (ro[1] - h)
    t0, t1 = _solve_quadratic_c(a, b, c)

    def nrm(hh):
        return (2.0 * hh[0] * j, 2.0 * (h - hh[1]) * kq, 2.0 * hh[2] * j)

    h0 = _hit_at(ro, rd, t0)
    h1 = _hit_at(ro, rd, t1)
    ok0 = (t0 > 0.0) & (jnp.abs(h0[1]) <= 1.0)
    ok1 = (t1 > 0.0) & (jnp.abs(h1[1]) <= 1.0)
    return _pick2(t0, nrm(h0), ok0, t1, nrm(h1), ok1)


def _q_paraboloid(ro, rd, k):
    kp = 0.5
    a = rd[0] * rd[0] + rd[2] * rd[2]
    b = 2.0 * (rd[0] * ro[0] + rd[2] * ro[2]) + kp * rd[1]
    c = ro[0] * ro[0] + ro[2] * ro[2] + kp * (ro[1] - 1.0)
    t0, t1 = _solve_quadratic_c(a, b, c)

    def nrm(hh):
        return (2.0 * hh[0], hh[1] * 0.0 + 0.5, 2.0 * hh[2])

    h0 = _hit_at(ro, rd, t0)
    h1 = _hit_at(ro, rd, t1)
    ok0 = (t0 > 0.0) & (jnp.abs(h0[1]) <= 1.0)
    ok1 = (t1 > 0.0) & (jnp.abs(h1[1]) <= 1.0)
    return _pick2(t0, nrm(h0), ok0, t1, nrm(h1), ok1)


def _q_hyperboloid(ro, rd, k):
    k = (k * k * k * k + 0.0012) * 1000.0
    j = k - 1.0
    a = k * rd[0] * rd[0] + k * rd[2] * rd[2] - j * rd[1] * rd[1]
    b = 2.0 * (k * rd[0] * ro[0] + k * rd[2] * ro[2] - j * rd[1] * ro[1])
    c = k * ro[0] * ro[0] + k * ro[2] * ro[2] - j * ro[1] * ro[1] - 1.0

    t0, t1 = _solve_quadratic_c(a, b, c)

    def nrm(hh):
        return (2.0 * hh[0] * k, -2.0 * hh[1] * j, 2.0 * hh[2] * k)

    h0 = _hit_at(ro, rd, t0)
    h1 = _hit_at(ro, rd, t1)
    ok0 = (t0 > 0.0) & (jnp.abs(h0[1]) <= 1.0)
    ok1 = (t1 > 0.0) & (jnp.abs(h1[1]) <= 1.0)
    return _pick2(t0, nrm(h0), ok0, t1, nrm(h1), ok1)


def _q_capsule(ro, rd, k):
    k = k + 0.25
    a_s = _dot(*rd, *rd)

    def cap(off):
        ey = ro[1] - off
        b = 2.0 * (rd[0] * ro[0] + rd[1] * ey + rd[2] * ro[2])
        c = ro[0] * ro[0] + ey * ey + ro[2] * ro[2] - 1.0
        return _solve_quadratic_c(a_s, b, c)

    s0t0, s0t1 = cap(k)
    s1t0, s1t1 = cap(-k)
    t0, t1 = _cyl_parts(ro, rd)

    def cap_n(t, off):
        hh = _hit_at(ro, rd, t)
        return (2.0 * hh[0], 2.0 * (hh[1] - off), 2.0 * hh[2])

    def hy(t):
        return ro[1] + rd[1] * t

    cands = [
        (s0t0, cap_n(s0t0, k), (s0t0 > 0.0) & (hy(s0t0) >= k)),
        (s1t0, cap_n(s1t0, -k), (s1t0 > 0.0) & (hy(s1t0) <= -k)),
        (t0, _cyl_n(_hit_at(ro, rd, t0)), (t0 > 0.0) & (jnp.abs(hy(t0)) <= k)),
        (s0t1, cap_n(s0t1, k), (s0t1 > 0.0) & (hy(s0t1) >= k)),
        (s1t1, cap_n(s1t1, -k), (s1t1 > 0.0) & (hy(s1t1) <= -k)),
        (t1, _cyl_n(_hit_at(ro, rd, t1)), (t1 > 0.0) & (jnp.abs(hy(t1)) <= k)),
    ]
    return _prio_chain(cands)


def _q_flattened_ring(ro, rd, k):
    k = k - 0.01
    t0, t1 = _cyl_parts(ro, rd)
    c0, c1 = _cyl_parts(ro, rd, r2_minus=k)
    inv_rdy = _safe_inv(rd[1])
    d0 = -(ro[1] - 1.0) * inv_rdy
    d1 = -(ro[1] + 1.0) * inv_rdy

    def disk_ok(d):
        hh = _hit_at(ro, rd, d)
        x2z2 = hh[0] * hh[0] + hh[2] * hh[2]
        return (d > 0.0) & (x2z2 <= 1.0) & (x2z2 > k)

    def side_ok(t):
        return (t > 0.0) & (jnp.abs(ro[1] + rd[1] * t) <= 1.0)

    z = ro[0] * 0.0
    up = (z, z + 1.0, z)
    down = (z, z - 1.0, z)
    cands = [
        (t0, _cyl_n(_hit_at(ro, rd, t0)), side_ok(t0)),
        (d0, up, (rd[1] < 0.0) & disk_ok(d0)),
        (d1, down, (rd[1] > 0.0) & disk_ok(d1)),
        (c0, _cyl_n(_hit_at(ro, rd, c0)), side_ok(c0)),
        (c1, _cyl_n(_hit_at(ro, rd, c1)), side_ok(c1)),
        (t1, _cyl_n(_hit_at(ro, rd, t1)), side_ok(t1)),
        (d0, up, (rd[1] > 0.0) & disk_ok(d0)),
        (d1, down, (rd[1] < 0.0) & disk_ok(d1)),
    ]
    return _prio_chain(cands)


def _q_box(ro, rd, k):
    inv = tuple(_safe_inv(d) for d in rd)
    near = tuple((-1.0 - o) * i for o, i in zip(ro, inv))
    far = tuple((1.0 - o) * i for o, i in zip(ro, inv))
    tmin = tuple(jnp.minimum(n, f) for n, f in zip(near, far))
    tmax = tuple(jnp.maximum(n, f) for n, f in zip(near, far))
    t0 = jnp.maximum(jnp.maximum(tmin[0], tmin[1]), tmin[2])
    t1 = jnp.minimum(jnp.minimum(tmax[0], tmax[1]), tmax[2])

    def enter_n(i):
        a, b = (i + 1) % 3, (i + 2) % 3
        ge = (tmin[i] >= tmin[a]) & (tmin[i] >= tmin[b])
        return -jnp.sign(rd[i]) * jnp.where(ge, 1.0, 0.0)

    def exit_n(i):
        a, b = (i + 1) % 3, (i + 2) % 3
        le = (tmax[i] <= tmax[a]) & (tmax[i] <= tmax[b])
        return -jnp.sign(rd[i]) * jnp.where(le, 1.0, 0.0)

    ok = t0 < t1
    ok0 = ok & (t0 > 0.0)
    ok1 = ok & (t1 > 0.0)
    return _pick2(
        t0, (enter_n(0), enter_n(1), enter_n(2)), ok0,
        t1, (exit_n(0), exit_n(1), exit_n(2)), ok1,
    )


def _q_pyramid_frustum(ro, rd, k):
    k = jnp.clip(k, 0.01, 1.0)
    j = 1.0 / k
    h = j * 2.0 - 1.0
    kq = k * 0.25

    def side(main, other):
        a = j * rd[main] * rd[main] - kq * rd[1] * rd[1]
        b = 2.0 * (j * rd[main] * ro[main] - kq * rd[1] * (ro[1] - h))
        c = j * ro[main] * ro[main] - kq * (ro[1] - h) * (ro[1] - h)
        t0, t1 = _solve_quadratic_c(a, b, c)

        def valid(t):
            hh = _hit_at(ro, rd, t)
            inside_other = (j * hh[other] * hh[other] - kq * (hh[1] - h) * (hh[1] - h)) <= 0.0
            return (
                (t > 0.0)
                & (jnp.abs(hh[0]) <= 1.0)
                & (jnp.abs(hh[2]) <= 1.0)
                & (hh[1] <= 1.0)
                & inside_other
            )

        def nrm(t):
            hh = _hit_at(ro, rd, t)
            cm = 2.0 * hh[main] * j
            cy = 2.0 * (hh[1] - h) * -kq
            z = cy * 0.0
            return (cm, cy, z) if main == 0 else (z, cy, cm)

        ok0 = valid(t0)
        ok1 = valid(t1) & ~ok0
        return _pick2(t0, nrm(t0), ok0, t1, nrm(t1), ok1)

    xt, xnx, xny, xnz = side(0, 2)
    zt, znx, zny, znz = side(2, 0)
    use_x = xt <= zt
    return (
        jnp.where(use_x, xt, zt),
        jnp.where(use_x, xnx, znx),
        jnp.where(use_x, xny, zny),
        jnp.where(use_x, xnz, znz),
    )


def _plane_y0(ro, rd):
    return -ro[1] * _safe_inv(rd[1])


def _q_disk(ro, rd, k):
    t = _plane_y0(ro, rd)
    hh = _hit_at(ro, rd, t)
    ok = (t > 0.0) & (hh[0] * hh[0] + hh[2] * hh[2] <= 1.0)
    z = t * 0.0
    return jnp.where(ok, t, INFINITY), z, z + 1.0, z


def _q_rectangle(ro, rd, k):
    t = _plane_y0(ro, rd)
    hh = _hit_at(ro, rd, t)
    ok = (t > 0.0) & (jnp.abs(hh[0]) <= 1.0) & (jnp.abs(hh[2]) <= 1.0)
    z = t * 0.0
    return jnp.where(ok, t, INFINITY), z, z + 1.0, z


def _map_torus_c(px, py, pz, k):
    ring = _safe_sqrt(px * px + pz * pz) - (1.0 - k)
    return _safe_sqrt(ring * ring + py * py) - k


def _q_torus(ro, rd, k, max_steps=500):
    """Analytic bound + frozen-lane SDF march (PathTracingCommon.js:1101-1163);
    semantics of geometry.quadrics.unit_torus_intersect."""
    k = 1.0 - jnp.clip(k, 0.01, 0.99)
    t0, t1 = _cyl_parts(ro, rd)
    tc = jnp.where(
        (t0 > 0.0) & (jnp.abs(ro[1] + rd[1] * t0) <= k),
        t0,
        jnp.where((t1 > 0.0) & (jnp.abs(ro[1] + rd[1] * t1) <= k), t1, INFINITY),
    )
    inv_rdy = _safe_inv(rd[1])

    def disk(off):
        d = -(ro[1] + off) * inv_rdy
        hh = _hit_at(ro, rd, d)
        ok = (d > 0.0) & (hh[0] * hh[0] + hh[2] * hh[2] <= 1.0)
        return jnp.where(ok, d, INFINITY)

    t_start = jnp.minimum(jnp.minimum(disk(k), disk(-k)), tc)
    bounded = t_start < INFINITY
    t_m0 = jnp.where(bounded, t_start, 0.0)

    def cond(carry):
        # early exit once every lane froze (converged or out of range):
        # most tiles finish in tens of steps, not the 500-step worst case
        step, t, d = carry
        live = (jnp.abs(d) >= 0.01) & (t - t_m0 <= 8.0)
        return (step < max_steps) & jnp.any(live)

    def body(carry):
        step, t, d = carry
        live = (jnp.abs(d) >= 0.01) & (t - t_m0 <= 8.0)
        d_new = _map_torus_c(ro[0] + rd[0] * t, ro[1] + rd[1] * t, ro[2] + rd[2] * t, k)
        t = jnp.where(live & (jnp.abs(d_new) >= 0.01), t + d_new, t)
        d = jnp.where(live, d_new, d)
        return step + 1, t, d

    _, t_m, d_m = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t_m0, jnp.full_like(t_m0, INFINITY))
    )
    converged = bounded & (jnp.abs(d_m) < 0.01)
    px, py, pz = _hit_at(ro, rd, t_m)
    e = 0.5773 * 0.0002
    offs = ((e, -e, -e), (-e, -e, e), (-e, e, -e), (e, e, e))
    nx = px * 0.0
    ny = nx
    nz = nx
    for ox, oy, oz in offs:
        m = _map_torus_c(px + ox, py + oy, pz + oz, k)
        nx = nx + ox * m
        ny = ny + oy * m
        nz = nz + oz * m
    return (
        jnp.where(converged, t_m, INFINITY),
        jnp.where(converged, nx, 0.0),
        jnp.where(converged, ny, 1.0),
        jnp.where(converged, nz, 0.0),
    )


def _safe_inv_slab(x):
    """1/x for the AABB slab test: zeros map to a huge finite value whose
    sign is immaterial under the min/max slab ordering."""
    return jnp.where(jnp.abs(x) < 1e-20, 1e20, 1.0 / jnp.where(x == 0.0, 1.0, x))


def _mesh_walk(ro_o, rd_o, cull, nodes_f_ref, tris_ref, n_nodes_p, t_init, active=None, textured=False, stream=None, base=None, woop_ref=None):
    """Escape-linked packet walk of the dense clustered BVH for ONE
    sub-packet of rays — the fused-kernel analog of the reference's 28-deep
    per-pixel stack traversal (GLTFModelPathTracing_FragmentShader.js:206-298)
    recast for the VPU: the whole sub-packet shares a single scalar node
    cursor, every slab test / Möller-Trumbore burst is a full-width vector
    op, and subtrees no lane enters are skipped through the escape link
    (see bpt_tpu.accel.cluster).

    ro_o/rd_o: component tuples of (rows, cols) object-space planes (rd
    unnormalized so t is world-commensurate).  cull: traced bool scalar.
    t_init: current closest-hit plane — subtrees and triangles beyond it are
    pruned, and only strictly closer mesh hits are reported.  active (bool
    plane or None): lanes allowed to steer the shared cursor; inactive
    lanes' results are garbage the caller already masks out.

    Returns (t, nx, ny, nz, u, v, hit) with the interpolated *object-space*
    shading normal (unnormalized) and texture UV; hit = lane found a
    triangle closer than t_init.  With ``textured=True`` three more planes
    follow hit: the winning triangle's baked PBR decision attributes
    (mat_class, roughness, emissive_flag — record floats 24..26, see
    scenes.gltf_scene.bake_triangle_attrs).

    ``stream``: None keeps the whole triangle table VMEM-resident; a
    ``(scratch_ref (2, 16, 128), dma_sem (2,))`` pair instead treats
    ``tris_ref`` as HBM-resident and double-buffers a fixed 16-row window
    per leaf — discovering a leaf STARTS its copy and processes the
    PREVIOUS pending leaf, hiding the HBM round trip behind node stepping
    (same pipeline as kernels.traverse._make_hbm_kernel; requires the
    dense pack's 16-row over-padding and leaf_size <= 64).
    """
    rox, roy, roz = ro_o
    rdx, rdy, rdz = rd_o
    invx = _safe_inv_slab(rdx)
    invy = _safe_inv_slab(rdy)
    invz = _safe_inv_slab(rdz)
    shape = rox.shape
    zeros = jnp.zeros(shape, jnp.float32)
    n_extra = 3 if textured else 0

    def tri_rows(row_get, nrows, c3):
        """MT-test `nrows` packed rows (4 records each) against the packet."""

        def row_body(k, c4):
            t_best, nx, ny, nz, us, vs, *attrs = c4
            attrs = list(attrs)
            row = row_get(k)  # (1, 128): 4 records
            for j in range(4):
                o = 32 * j
                p0x, p0y, p0z = row[0, o + 0], row[0, o + 1], row[0, o + 2]
                e1x = row[0, o + 3] - p0x
                e1y = row[0, o + 4] - p0y
                e1z = row[0, o + 5] - p0z
                e2x = row[0, o + 6] - p0x
                e2y = row[0, o + 7] - p0y
                e2z = row[0, o + 8] - p0z
                pvx = rdy * e2z - rdz * e2y
                pvy = rdz * e2x - rdx * e2z
                pvz = rdx * e2y - rdy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = _safe_inv_slab(det)
                tvx, tvy, tvz = rox - p0x, roy - p0y, roz - p0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                miss = (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0) | (t <= 0.0)
                miss = miss | (cull & (det < 0.0))
                closer = jnp.logical_not(miss) & (t < t_best)
                w = 1.0 - u - v
                inx = w * row[0, o + 9] + u * row[0, o + 12] + v * row[0, o + 15]
                iny = w * row[0, o + 10] + u * row[0, o + 13] + v * row[0, o + 16]
                inz = w * row[0, o + 11] + u * row[0, o + 14] + v * row[0, o + 17]
                iu = w * row[0, o + 18] + u * row[0, o + 20] + v * row[0, o + 22]
                iv = w * row[0, o + 19] + u * row[0, o + 21] + v * row[0, o + 23]
                t_best = jnp.where(closer, t, t_best)
                nx = jnp.where(closer, inx, nx)
                ny = jnp.where(closer, iny, ny)
                nz = jnp.where(closer, inz, nz)
                us = jnp.where(closer, iu, us)
                vs = jnp.where(closer, iv, vs)
                if textured:
                    # baked PBR decision attrs (class, rough, emissive)
                    attrs = [
                        jnp.where(closer, row[0, o + 24 + a], attrs[a])
                        for a in range(3)
                    ]
            return (t_best, nx, ny, nz, us, vs, *attrs)

        return jax.lax.fori_loop(0, nrows, row_body, c3)

    def box_test(i, t_best):
        # `base` offsets into the per-octant near-first layout block
        # (accel.cluster.pack_clustered_dense_oct); links stay relative
        nf = nodes_f_ref[pl.ds(i if base is None else base + i, 1), :]  # (1, 16): min max esc row0 nrows
        tx0 = (nf[0, 0] - rox) * invx
        tx1 = (nf[0, 3] - rox) * invx
        ty0 = (nf[0, 1] - roy) * invy
        ty1 = (nf[0, 4] - roy) * invy
        tz0 = (nf[0, 2] - roz) * invz
        tz1 = (nf[0, 5] - roz) * invz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        box_hit = (jnp.maximum(tmin, 0.0) <= tmax) & (tmin < t_best)
        if active is not None:
            # dead lanes (terminated paths) must not drag the packet into
            # subtrees: their stale rays still intersect boxes otherwise
            box_hit = box_hit & active
        # link fields ride the float row (SMEM is 128 B/scalar — a mesh-
        # sized int side table would blow its 1 MB); exact for values < 2^24
        esc = nf[0, 6].astype(jnp.int32)
        row0 = nf[0, 7].astype(jnp.int32)
        nrows = nf[0, 8].astype(jnp.int32)
        return jnp.any(box_hit), esc, row0, nrows

    def cond(c):
        return c[0] < n_nodes_p

    # BVH4 inlined-leaf layout (accel.cluster.Bvh4OctBVH): 32-float records
    # with FOUR child AABBs — one row load + 4 slab tests make a 4-way
    # step decision, and leaf children (meta < 0) are processed inline at
    # the parent's step, so leaves cost no node visit.  Child masks use the
    # step-entry t_best (a leaf child's hits don't re-prune its later
    # siblings within the same step — weaker pruning only, never wrong).
    bvh4 = nodes_f_ref.shape[-1] == 32

    def bvh4_step(i, t_best):
        """Load record i, slab-test the 4 child boxes -> (per-child any-hit
        scalars, per-child meta floats, escape)."""
        nf = nodes_f_ref[pl.ds(i if base is None else base + i, 1), :]
        ms = []
        for k in range(4):
            o = 6 * k
            tx0 = (nf[0, o + 0] - rox) * invx
            tx1 = (nf[0, o + 3] - rox) * invx
            ty0 = (nf[0, o + 1] - roy) * invy
            ty1 = (nf[0, o + 4] - roy) * invy
            tz0 = (nf[0, o + 2] - roz) * invz
            tz1 = (nf[0, o + 5] - roz) * invz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            hit = (jnp.maximum(tmin, 0.0) <= tmax) & (tmin < t_best)
            if active is not None:
                hit = hit & active
            ms.append(jnp.any(hit))
        meta = [nf[0, 24 + k] for k in range(4)]
        esc = nf[0, 28].astype(jnp.int32)
        return ms, meta, esc

    def bvh4_next(ms, meta, esc):
        # descend into the FIRST hit inner child (children are near-first
        # ordered per octant layout); later hit inner children are reached
        # through the sibling escape chain
        next_i = esc
        for k in (3, 2, 1, 0):
            next_i = jnp.where(ms[k] & (meta[k] > 0.0),
                               meta[k].astype(jnp.int32), next_i)
        return next_i

    def woop_rows(row_get_w, dense_get, nrows_w, c3):
        """Woop leaf test, 'interp on improve': 8 affine unit-triangle
        transforms per woop row (accel.cluster.Bvh4OctBVH.woop) give
        (t, u, v, closer) in ~40 vector ops/tri — the REJECTION path — and
        the dense interp rows (2w, 2w+1: normals/uvs/attrs) are fetched by
        ``dense_get(k) -> (d0, d1)`` only when a row actually improves some
        lane (measured ~10-20% of visited rows), keeping the per-row floor
        at ~half of in-row MT."""

        def row_body_winner(k, c4):
            # ROW-WINNER formulation (gated by WOOP_ROW_WINNER): keep only
            # (t, u, v, argmin-j) live across the 8 tests and select the
            # winner's record scalars once in the improve path — fewer live
            # planes and ~half the interp ops vs the per-tri merge below.
            t_best = c4[0]
            wrow = row_get_w(k)
            t_row = jnp.full(shape, INFINITY, jnp.float32)
            u_row = zeros
            v_row = zeros
            j_row = zeros
            for j in range(8):
                o = 16 * j
                opx = wrow[0, o + 0] * rox + wrow[0, o + 1] * roy + wrow[0, o + 2] * roz + wrow[0, o + 9]
                opy = wrow[0, o + 3] * rox + wrow[0, o + 4] * roy + wrow[0, o + 5] * roz + wrow[0, o + 10]
                opz = wrow[0, o + 6] * rox + wrow[0, o + 7] * roy + wrow[0, o + 8] * roz + wrow[0, o + 11]
                dpx = wrow[0, o + 0] * rdx + wrow[0, o + 1] * rdy + wrow[0, o + 2] * rdz
                dpy = wrow[0, o + 3] * rdx + wrow[0, o + 4] * rdy + wrow[0, o + 5] * rdz
                dpz = wrow[0, o + 6] * rdx + wrow[0, o + 7] * rdy + wrow[0, o + 8] * rdz
                t = -opz * _safe_inv_slab(dpz)
                u = opx + t * dpx
                v = opy + t * dpy
                miss = (u < 0.0) | (v < 0.0) | (u + v > 1.0) | (t <= 0.0)
                miss = miss | (cull & (dpz > 0.0))
                ok = jnp.logical_not(miss) & (t < t_row)
                t_row = jnp.where(ok, t, t_row)
                u_row = jnp.where(ok, u, u_row)
                v_row = jnp.where(ok, v, v_row)
                j_row = jnp.where(ok, jnp.float32(j), j_row)
            closer = t_row < t_best
            t_best = jnp.where(closer, t_row, t_best)

            def interp_fn(c5, k=k, closer=closer, j_row=j_row,
                          u_row=u_row, v_row=v_row):
                nx, ny, nz, us, vs, *attrs = c5
                attrs = list(attrs)
                d0, d1 = dense_get(k)
                # record floats 9..23: n0 n1 n2 (3 each), uv0 uv1 uv2 (2
                # each); 24..26 baked PBR attrs
                n_sel = 18 if textured else 15
                sel = [zeros] * n_sel
                for j in range(8):
                    row = d0 if j < 4 else d1
                    o2 = 32 * (j % 4)
                    cl = closer & (j_row == jnp.float32(j))
                    for idx in range(15):
                        sel[idx] = jnp.where(cl, row[0, o2 + 9 + idx], sel[idx])
                    if textured:
                        for a in range(3):
                            sel[15 + a] = jnp.where(cl, row[0, o2 + 24 + a],
                                                    sel[15 + a])
                w = 1.0 - u_row - v_row
                inx = w * sel[0] + u_row * sel[3] + v_row * sel[6]
                iny = w * sel[1] + u_row * sel[4] + v_row * sel[7]
                inz = w * sel[2] + u_row * sel[5] + v_row * sel[8]
                iu = w * sel[9] + u_row * sel[11] + v_row * sel[13]
                iv = w * sel[10] + u_row * sel[12] + v_row * sel[14]
                nx = jnp.where(closer, inx, nx)
                ny = jnp.where(closer, iny, ny)
                nz = jnp.where(closer, inz, nz)
                us = jnp.where(closer, iu, us)
                vs = jnp.where(closer, iv, vs)
                if textured:
                    attrs = [
                        jnp.where(closer, sel[15 + a], attrs[a])
                        for a in range(3)
                    ]
                return (nx, ny, nz, us, vs, *attrs)

            rest = jax.lax.cond(jnp.any(closer), interp_fn,
                                lambda c5: c5, tuple(c4[1:]))
            return (t_best, *rest)

        def row_body(k, c4):
            t_best = c4[0]
            wrow = row_get_w(k)  # (1, 128): 8 tris
            closers, u_l, v_l = [], [], []
            for j in range(8):
                o = 16 * j
                opx = wrow[0, o + 0] * rox + wrow[0, o + 1] * roy + wrow[0, o + 2] * roz + wrow[0, o + 9]
                opy = wrow[0, o + 3] * rox + wrow[0, o + 4] * roy + wrow[0, o + 5] * roz + wrow[0, o + 10]
                opz = wrow[0, o + 6] * rox + wrow[0, o + 7] * roy + wrow[0, o + 8] * roz + wrow[0, o + 11]
                dpx = wrow[0, o + 0] * rdx + wrow[0, o + 1] * rdy + wrow[0, o + 2] * rdz
                dpy = wrow[0, o + 3] * rdx + wrow[0, o + 4] * rdy + wrow[0, o + 5] * rdz
                dpz = wrow[0, o + 6] * rdx + wrow[0, o + 7] * rdy + wrow[0, o + 8] * rdz
                t = -opz * _safe_inv_slab(dpz)
                u = opx + t * dpx
                v = opy + t * dpy
                # d'z = n.rd / |n|^2, so cull (det = -rd.n < 0) == d'z > 0
                miss = (u < 0.0) | (v < 0.0) | (u + v > 1.0) | (t <= 0.0)
                miss = miss | (cull & (dpz > 0.0))
                closer = jnp.logical_not(miss) & (t < t_best)
                t_best = jnp.where(closer, t, t_best)
                closers.append(closer)
                u_l.append(u)
                v_l.append(v)
            improved = closers[0]
            for j in range(1, 8):
                improved = improved | closers[j]

            def interp_fn(c5, k=k, closers=closers, u_l=u_l, v_l=v_l):
                nx, ny, nz, us, vs, *attrs = c5
                attrs = list(attrs)
                d0, d1 = dense_get(k)
                for j in range(8):
                    row = d0 if j < 4 else d1
                    o2 = 32 * (j % 4)
                    u, v, cl = u_l[j], v_l[j], closers[j]
                    w = 1.0 - u - v
                    inx = w * row[0, o2 + 9] + u * row[0, o2 + 12] + v * row[0, o2 + 15]
                    iny = w * row[0, o2 + 10] + u * row[0, o2 + 13] + v * row[0, o2 + 16]
                    inz = w * row[0, o2 + 11] + u * row[0, o2 + 14] + v * row[0, o2 + 17]
                    iu = w * row[0, o2 + 18] + u * row[0, o2 + 20] + v * row[0, o2 + 22]
                    iv = w * row[0, o2 + 19] + u * row[0, o2 + 21] + v * row[0, o2 + 23]
                    nx = jnp.where(cl, inx, nx)
                    ny = jnp.where(cl, iny, ny)
                    nz = jnp.where(cl, inz, nz)
                    us = jnp.where(cl, iu, us)
                    vs = jnp.where(cl, iv, vs)
                    if textured:
                        attrs = [
                            jnp.where(cl, row[0, o2 + 24 + a], attrs[a])
                            for a in range(3)
                        ]
                return (nx, ny, nz, us, vs, *attrs)

            rest = jax.lax.cond(jnp.any(improved), interp_fn,
                                lambda c5: c5, tuple(c4[1:]))
            return (t_best, *rest)

        body = row_body_winner if WOOP_ROW_WINNER else row_body
        return jax.lax.fori_loop(0, nrows_w, body, c3)

    if bvh4 and stream is None:
        use_woop = woop_ref is not None

        def body(c):
            i, t_best, nx, ny, nz, us, vs, *attrs = c
            ms, meta, esc = bvh4_step(i, t_best)
            st = (t_best, nx, ny, nz, us, vs, *attrs)
            for k in range(4):
                # meta < 0: inlined leaf, WOOP-row units (dense rows = 2x)
                enc = (-meta[k]).astype(jnp.int32)
                row0 = enc // 32
                nrows = enc - row0 * 32

                if use_woop:
                    def leaf_fn(c2, row0=row0, nrows=nrows):
                        return woop_rows(
                            lambda kk, row0=row0: woop_ref[pl.ds(row0 + kk, 1), :],
                            lambda kk, row0=row0: (
                                tris_ref[pl.ds(2 * (row0 + kk), 1), :],
                                tris_ref[pl.ds(2 * (row0 + kk) + 1, 1), :],
                            ),
                            nrows, c2)
                else:
                    def leaf_fn(c2, row0=row0, nrows=nrows):
                        return tri_rows(
                            lambda kk: tris_ref[pl.ds(2 * row0 + kk, 1), :],
                            2 * nrows, c2
                        )

                st = jax.lax.cond(ms[k] & (meta[k] < 0.0), leaf_fn,
                                  lambda c2: c2, st)
            t_best, nx, ny, nz, us, vs, *attrs = st
            return (bvh4_next(ms, meta, esc), t_best, nx, ny, nz, us, vs, *attrs)

        carry = (jnp.int32(0), t_init, zeros, zeros, zeros, zeros, zeros)
        carry = carry + (zeros,) * n_extra
        _, t_best, nx, ny, nz, us, vs, *attrs = jax.lax.while_loop(cond, body, carry)
        return (t_best, nx, ny, nz, us, vs, t_best < t_init, *attrs)

    if bvh4 and woop_ref is not None:
        # HBM-streaming Woop walk (reference-capacity meshes): leaves
        # double-buffer 8-woop-row windows (half the bytes of the dense
        # window), and the interp-on-improve dense rows (2w, 2w+1) are
        # fetched by a short blocking DMA only when a row improves a lane.
        wscr, wsem, iscr, isem = stream

        def leaf_dma_w(row0w, slot):
            return pltpu.make_async_copy(
                woop_ref.at[pl.ds(row0w, 8), :], wscr.at[slot], wsem.at[slot]
            )

        def process_leaf_w(pr0w, pnrw, slot, st):
            def dense_get(k):
                cp = pltpu.make_async_copy(
                    tris_ref.at[pl.ds(2 * (pr0w + k), 2), :], iscr, isem
                )
                cp.start()
                cp.wait()
                return iscr[pl.ds(0, 1), :], iscr[pl.ds(1, 1), :]

            return woop_rows(
                lambda kk: wscr[slot, pl.ds(kk, 1), :], dense_get, pnrw, st
            )

        def body(c):
            i, pr0, pnr, slot, t_best, nx, ny, nz, us, vs, *attrs = c
            ms, meta, esc = bvh4_step(i, t_best)
            st = (t_best, nx, ny, nz, us, vs, *attrs)
            c2 = (pr0, pnr, slot, st)
            for k in range(4):
                enc = (-meta[k]).astype(jnp.int32)
                row0 = enc // 32
                nrows = enc - row0 * 32

                def leaf_fn(c3, row0=row0, nrows=nrows):
                    pr0, pnr, slot, st = c3
                    leaf_dma_w(row0, 1 - slot).start()

                    def drain(st):
                        leaf_dma_w(pr0, slot).wait()
                        return process_leaf_w(pr0, pnr, slot, st)

                    st = jax.lax.cond(pnr > 0, drain, lambda s: s, st)
                    return (row0, nrows, 1 - slot, st)

                c2 = jax.lax.cond(ms[k] & (meta[k] < 0.0), leaf_fn,
                                  lambda c3: c3, c2)
            pr0, pnr, slot, st = c2
            t_best, nx, ny, nz, us, vs, *attrs = st
            return (bvh4_next(ms, meta, esc), pr0, pnr, slot,
                    t_best, nx, ny, nz, us, vs, *attrs)

        carry = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(1),
                 t_init, zeros, zeros, zeros, zeros, zeros)
        carry = carry + (zeros,) * n_extra
        _, pr0, pnr, slot, t_best, nx, ny, nz, us, vs, *attrs = (
            jax.lax.while_loop(cond, body, carry)
        )

        def final_drain_w(c3):
            leaf_dma_w(pr0, slot).wait()
            return process_leaf_w(pr0, pnr, slot, c3)

        t_best, nx, ny, nz, us, vs, *attrs = jax.lax.cond(
            pnr > 0, final_drain_w, lambda c3: c3,
            (t_best, nx, ny, nz, us, vs, *attrs),
        )
        return (t_best, nx, ny, nz, us, vs, t_best < t_init, *attrs)

    if bvh4:
        scratch, sem = stream

        def leaf_dma4(row0, slot):
            return pltpu.make_async_copy(
                tris_ref.at[pl.ds(row0, 16), :], scratch.at[slot], sem.at[slot]
            )

        def body(c):
            i, pr0, pnr, slot, t_best, nx, ny, nz, us, vs, *attrs = c
            ms, meta, esc = bvh4_step(i, t_best)
            st = (t_best, nx, ny, nz, us, vs, *attrs)
            c2 = (pr0, pnr, slot, st)
            for k in range(4):
                # meta is WOOP-row units; the stream path walks the dense
                # Moller-Trumbore rows (2 per woop row)
                enc = (-meta[k]).astype(jnp.int32)
                row0 = 2 * (enc // 32)
                nrows = 2 * (enc - (enc // 32) * 32)

                def leaf_fn(c3, row0=row0, nrows=nrows):
                    pr0, pnr, slot, st = c3
                    # start this leaf's copy, drain the pending one (same
                    # double-buffer pipeline as the binary walk)
                    leaf_dma4(row0, 1 - slot).start()

                    def drain(st):
                        leaf_dma4(pr0, slot).wait()
                        return tri_rows(
                            lambda kk: scratch[slot, pl.ds(kk, 1), :], pnr, st
                        )

                    st = jax.lax.cond(pnr > 0, drain, lambda s: s, st)
                    return (row0, nrows, 1 - slot, st)

                c2 = jax.lax.cond(ms[k] & (meta[k] < 0.0), leaf_fn,
                                  lambda c3: c3, c2)
            pr0, pnr, slot, st = c2
            t_best, nx, ny, nz, us, vs, *attrs = st
            return (bvh4_next(ms, meta, esc), pr0, pnr, slot,
                    t_best, nx, ny, nz, us, vs, *attrs)

        carry = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(1),
                 t_init, zeros, zeros, zeros, zeros, zeros)
        carry = carry + (zeros,) * n_extra
        _, pr0, pnr, slot, t_best, nx, ny, nz, us, vs, *attrs = (
            jax.lax.while_loop(cond, body, carry)
        )

        def final_drain4(c3):
            leaf_dma4(pr0, slot).wait()
            return tri_rows(lambda kk: scratch[slot, pl.ds(kk, 1), :], pnr, c3)

        t_best, nx, ny, nz, us, vs, *attrs = jax.lax.cond(
            pnr > 0, final_drain4, lambda c3: c3,
            (t_best, nx, ny, nz, us, vs, *attrs),
        )
        return (t_best, nx, ny, nz, us, vs, t_best < t_init, *attrs)

    if stream is None:
        def body(c):
            i, t_best, nx, ny, nz, us, vs, *attrs = c
            any_hit, esc, row0, nrows = box_test(i, t_best)
            is_leaf = nrows > 0

            def leaf_fn(c2):
                return tri_rows(
                    lambda k: tris_ref[pl.ds(row0 + k, 1), :], nrows, c2
                )

            leaf_state = (t_best, nx, ny, nz, us, vs, *attrs)
            t_best, nx, ny, nz, us, vs, *attrs = jax.lax.cond(
                any_hit & is_leaf, leaf_fn, lambda c2: c2, leaf_state
            )
            next_i = jnp.where(any_hit & jnp.logical_not(is_leaf), i + 1, esc)
            return (next_i, t_best, nx, ny, nz, us, vs, *attrs)

        # NB: no boolean plane rides the carry (Mosaic cannot yield
        # vector<i1>); "found a hit" is recovered as t_best < t_init
        # afterwards — exact, since any accepted triangle strictly lowered
        # t from its t_init start.
        carry = (jnp.int32(0), t_init, zeros, zeros, zeros, zeros, zeros)
        carry = carry + (zeros,) * n_extra
        _, t_best, nx, ny, nz, us, vs, *attrs = jax.lax.while_loop(cond, body, carry)
        return (t_best, nx, ny, nz, us, vs, t_best < t_init, *attrs)

    scratch, sem = stream

    def leaf_dma(row0, slot):
        return pltpu.make_async_copy(
            tris_ref.at[pl.ds(row0, 16), :], scratch.at[slot], sem.at[slot]
        )

    def body(c):
        i, pr0, pnr, slot, t_best, nx, ny, nz, us, vs, *attrs = c
        any_hit, esc, row0, nrows = box_test(i, t_best)
        is_leaf = nrows > 0
        take_leaf = any_hit & is_leaf

        def leaf_fn(c2):
            # start THIS leaf's copy, then drain the pending leaf whose DMA
            # has been in flight since its discovery (t_best is a pure min-
            # reduction, so deferred processing changes nothing but pruning
            # strength; leaves still process in discovery order)
            leaf_dma(row0, 1 - slot).start()

            def drain(c3):
                leaf_dma(pr0, slot).wait()
                return tri_rows(
                    lambda k: scratch[slot, pl.ds(k, 1), :], pnr, c3
                )

            return jax.lax.cond(pnr > 0, drain, lambda c3: c3, c2)

        leaf_state = (t_best, nx, ny, nz, us, vs, *attrs)
        t_best, nx, ny, nz, us, vs, *attrs = jax.lax.cond(
            take_leaf, leaf_fn, lambda c2: c2, leaf_state
        )
        pr0 = jnp.where(take_leaf, row0, pr0)
        pnr = jnp.where(take_leaf, nrows, pnr)
        slot = jnp.where(take_leaf, 1 - slot, slot)
        next_i = jnp.where(any_hit & jnp.logical_not(is_leaf), i + 1, esc)
        return (next_i, pr0, pnr, slot, t_best, nx, ny, nz, us, vs, *attrs)

    carry = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(1),
             t_init, zeros, zeros, zeros, zeros, zeros)
    carry = carry + (zeros,) * n_extra
    _, pr0, pnr, slot, t_best, nx, ny, nz, us, vs, *attrs = (
        jax.lax.while_loop(cond, body, carry)
    )

    def final_drain(c3):
        leaf_dma(pr0, slot).wait()
        return tri_rows(lambda k: scratch[slot, pl.ds(k, 1), :], pnr, c3)

    t_best, nx, ny, nz, us, vs, *attrs = jax.lax.cond(
        pnr > 0, final_drain, lambda c3: c3,
        (t_best, nx, ny, nz, us, vs, *attrs),
    )
    return (t_best, nx, ny, nz, us, vs, t_best < t_init, *attrs)


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _acos01(x):
    """acos for x in [0, 1]: Abramowitz & Stegun 4.4.45 (|err| < 6.8e-5 rad).
    Mosaic has no acos lowering; the error is far inside the sky's tolerance."""
    return _safe_sqrt(1.0 - x) * (
        1.5707288 + x * (-0.2121144 + x * (0.0742610 - 0.0187293 * x))
    )


def _pow_c(x, p):
    """x**p for x >= 0 via exp/log (Mosaic has no general pow lowering)."""
    return jnp.exp(p * jnp.log(jnp.maximum(x, 1e-20)))


def _sky_color_c(rdx, rdy, rdz, sunx, suny, sunz, sun_e, gamma, blend):
    """Preetham sky in component form — Get_Sky_Color
    (PathTracingCommon.js:430-475), same math as bpt_tpu.sky.get_sky_color.

    rd* are unit-direction planes; sun* are SMEM scalars; sun_e (sun
    intensity), gamma (sunfade exponent) and blend (horizon mix weight) are
    precomputed host-side scalars (pure functions of the sun direction).
    Returns (r, g, b) radiance planes.
    """
    import math

    from bpt_tpu import sky as _sky

    import numpy as _np

    mie_const = _np.array([1.8399918514433978e14, 2.7798023919660528e14, 4.0790479543861094e14])
    total_mie = 0.434 * ((0.2 * _sky.TURBIDITY) * 10e-18) * mie_const
    rayleigh = _np.array([5.804542996261093e-6, 1.3562911419845635e-5, 3.0265902468824876e-5])
    rayleigh_at = [float(v) * _sky.RAYLEIGH_COEFFICIENT for v in rayleigh]
    mie_at = [float(v) * _sky.MIE_COEFFICIENT for v in total_mie]
    night = (0.0, 0.0003, 0.00075)

    cos_vs = rdx * sunx + rdy * suny + rdz * sunz
    x_uv = jnp.clip(jnp.maximum(0.0, rdy), 0.0, 1.0)
    zenith = _acos01(x_uv)
    # cos(zenith) == x_uv by construction
    inverse = 1.0 / (
        x_uv + 0.15 * _pow_c(jnp.maximum(93.885 - zenith * (180.0 / math.pi), 1e-6), -1.253)
    )
    r_opt = _sky.RAYLEIGH_ZENITH_LENGTH * inverse
    m_opt = _sky.MIE_ZENITH_LENGTH * inverse

    r_phase = 3.0 / (16.0 * math.pi) * (1.0 + (cos_vs * 0.5 + 0.5) ** 2)
    g2 = _sky.MIE_DIRECTIONAL_G * _sky.MIE_DIRECTIONAL_G
    hg_x = jnp.maximum(0.0, 1.0 - 2.0 * _sky.MIE_DIRECTIONAL_G * cos_vs + g2)
    hg_den = hg_x * _safe_sqrt(hg_x)
    m_phase = (1.0 / (4.0 * math.pi)) * ((1.0 - g2) / jnp.maximum(hg_den, 1e-20))

    sundisk = _smoothstep(
        _sky.SUN_ANGULAR_DIAMETER_COS, _sky.SUN_ANGULAR_DIAMETER_COS + 0.00002, cos_vs
    )

    out = []
    for c in range(3):
        fex = jnp.exp(-(rayleigh_at[c] * r_opt + mie_at[c] * m_opt))
        ratio = (rayleigh_at[c] * r_phase + mie_at[c] * m_phase) / (
            rayleigh_at[c] + mie_at[c]
        )
        y = jnp.maximum(sun_e * ratio * (1.0 - fex), 0.0)
        lin = y * _safe_sqrt(y)
        lin = lin * (
            (1.0 - blend) + blend * _safe_sqrt(jnp.maximum(sun_e * ratio * fex, 0.0))
        )
        l0 = 0.1 * fex + sun_e * 19000.0 * fex * sundisk
        tex = (lin + l0) * 0.04 + night[c]
        out.append(_pow_c(tex, gamma))
    return out[0], out[1], out[2]


# In the reference's SceneIntersect order
# (TransformedQuadricGeometry_FragmentShader.js:77-317) — must match
# bpt_tpu.geometry.quadrics.UNIT_INTERSECTORS.
_QUADRIC_INTERSECTORS = (
    _q_sphere,
    _q_cylinder,
    _q_cone,
    _q_paraboloid,
    _q_hyperboloid,
    _q_capsule,
    _q_flattened_ring,
    _q_box,
    _q_pyramid_frustum,
    _q_disk,
    _q_rectangle,
    _q_torus,
)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _state_layout(cfg: IntegratorConfig, mesh_textured: bool, n_sg: int = 0) -> list:
    """Per-lane state plane order at staged-phase boundaries.

    The staged (sorted-wavefront) mode splits the bounce loop into phases
    so the driver can REORDER rays between bounces (direction-octant +
    hit-position sort — the round-3 'ray reordering' lever); everything a
    path carries across a phase boundary is one f32 plane per key here.
    Booleans ride as 0/1 floats, d_cnt as a float int, px/py as exact
    (< 2^24) float pixel coordinates (the RNG re-seed needs them after
    permutation)."""
    keys = [
        "rox", "roy", "roz", "rdx", "rdy", "rdz",
        "m_r", "m_g", "m_b", "acc_r", "acc_g", "acc_b",
        "alive", "spec", "samp_l", "coat", "d_cnt", "sharp",
        "prev_metal", "px", "py", "fr", "fslot",
        "obj_nx", "obj_ny", "obj_nz", "obj_cr", "obj_cg", "obj_cb", "obj_id",
    ]
    if cfg.env in ("sky", "hdri"):
        keys.append("prev_trans")
    if cfg.env == "hdri":
        keys += ["mw_r", "mw_g", "mw_b", "md_x", "md_y", "md_z"]
    if mesh_textured:
        keys += ["em_r", "em_g", "em_b", "em_u", "em_v"]
        for b in range(cfg.bounces):
            keys += [f"alb_u{b}", f"alb_v{b}"]
    # staged path-replay VJP: the per-object ∂log-throughput accumulators
    # (hit counts + Beer sums — see the `sg`/`sgb` comment in _make_kernel)
    # are per-lane state like everything else; they ride the group-8
    # permutations and scatter home with the lane identity.
    for j in range(n_sg):
        keys.append(f"sg{j}")
    return keys


def _make_kernel(cfg: IntegratorConfig, n_quads: int, n_spheres: int, n_quadrics: int, tile_rows: int, tile_cols: int, width: int, height: int, param_grads: bool = False, has_mesh: bool = False, n_nodes_p: int = 0, fast_quads: bool = False, mesh_textured: bool = False, sub_rows: int = 0, bounce_lo: int = 0, bounce_hi: int | None = None, staged: bool = False, mesh_stream: bool = False, mesh_oct: bool = False, mesh_woop: bool = False):
    eps = cfg.eps_intersect
    if sub_rows <= 0:
        sub_rows = tile_rows
    light_i = cfg.light_index if cfg.light_index >= 0 else n_quads - 1
    n_obj = n_spheres + n_quadrics + n_quads
    env_sky = cfg.env == "sky"
    env_hdri = cfg.env == "hdri"
    has_quad_light = cfg.nee == "quad"
    # env importance-sampling NEE (wavefront radiance.py:267-284): the
    # inverse-CDF draw is a pure function of (pixel, frame, bounce) under the
    # fixed schedule, so it is precomputed OUTSIDE the kernel
    # (trace_image_pallas) and arrives as 4 extra planes per bounce appended
    # to the blue-noise stack: direction xyz + weight-base 1/(pi*max(pdf,eps)).
    env_nee = cfg.nee == "env"
    assert not (env_nee and has_quad_light)
    use_lobe = (cfg.nee in ("sun", "env")) or cfg.metal_roughness_lobe
    if bounce_hi is None:
        bounce_hi = cfg.bounces
    state_in = staged and bounce_lo > 0
    n_sg = (n_obj if cfg.transparent_tint else 2 * n_obj) if param_grads else 0
    layout = _state_layout(cfg, mesh_textured, n_sg if staged else 0) if staged else None
    assert mesh_stream <= staged and mesh_stream <= has_mesh

    def kernel(*args):
        # cam (16,) SMEM: pos3 right3 up3 fwd3 ulen vlen aperture focus
        # scalars (10,) SMEM: frame_counter, camera_is_moving (0/1), shape_k,
        #   sun_dir xyz, sun_power, sky sun_e, sky gamma, sky horizon blend
        # quads (n_quads, 20) SMEM: n3 v0..v3(12) color3 mat pad
        # [spheres] (n_spheres, 21) SMEM: inv 4x4 row-major (16) color3 mat pad
        # [quadrics] (12, 20) SMEM: inv(16) color3 mat, UNIT_INTERSECTORS order
        # [mesh] mesh_s (18,) SMEM: inv(16) mat cull; nodes_f (Np, 16) VMEM
        #   (aabb + float-encoded escape/row links); tris_d (Rp, 128) VMEM
        #   (accel.cluster dense layout)
        # bn (4, TH, W) VMEM; then 11 (TH, W) outputs (+6 miss-weight/dir
        # planes when env == "hdri": the equirect fetch is deferred to XLA —
        # a path misses at most once, so one set of planes is exact);
        # param_grads appends one (n_sg, TH, W) ∂log-throughput output:
        # n_obj linear-hit-count planes (+ n_obj Beer Σ0.01·t planes when
        # absorption is on); the 1/color factors are applied in f_bwd
        cam_ref, scalars_ref, quads_ref = args[0:3]
        i_arg = 3
        sph_ref = qdr_ref = None
        if n_spheres:
            sph_ref = args[i_arg]
            i_arg += 1
        if n_quadrics:
            qdr_ref = args[i_arg]
            i_arg += 1
        mesh_s_ref = mnodes_f_ref = mtris_ref = mwoop_ref = None
        if has_mesh:
            mesh_s_ref, mnodes_f_ref, mtris_ref = args[i_arg:i_arg + 3]
            i_arg += 3
            if mesh_woop:
                mwoop_ref = args[i_arg]
                i_arg += 1
        bn_ref = args[i_arg]
        i_arg += 1
        st_in_ref = st_out_ref = pix_ref = stream_refs = None
        if staged:
            # staged (sorted-wavefront) phase: per-lane state rides ONE
            # (S, TH, W) plane stack in and out; the driver permutes lanes
            # between phases (the ray-reordering seam).  The ray-gen phase
            # instead takes a (4, TH, W) pixel stack [px, py, frame, fslot]
            # — the driver chooses the lane↔(frame, pixel) layout freely
            # (multi-frame fusion, block-contiguous orderings), and the
            # kernel never consults program_id for identity.
            if state_in:
                st_in_ref = args[i_arg]
                i_arg += 1
            else:
                pix_ref = args[i_arg]
                i_arg += 1
            st_out_ref = args[i_arg]
            i_arg += 1
            if mesh_stream:
                n_scr = 4 if mesh_woop else 2
                stream_refs = args[i_arg:i_arg + n_scr]
                i_arg += n_scr
        else:
            (col_r, col_g, col_b, onx, ony, onz, ocr, ocg, ocb, oid, osh) = args[i_arg:i_arg + 11]
            i_arg += 11
            if env_hdri:
                (mw_r_o, mw_g_o, mw_b_o, md_x_o, md_y_o, md_z_o) = args[i_arg:i_arg + 6]
                i_arg += 6
            if mesh_textured:
                # deferred PBR records: per-bounce albedo-factor UVs (u < 0 ⇒
                # no factor this bounce) + one emissive-terminal record
                # (throughput + UV) — the texel fetches happen outside the
                # kernel, exactly once per plane (see trace_image_pallas).
                alb_uv_o = args[i_arg:i_arg + 2 * cfg.bounces]
                i_arg += 2 * cfg.bounces
                (em_r_o, em_g_o, em_b_o, em_u_o, em_v_o) = args[i_arg:i_arg + 5]
                i_arg += 5
            maybe_sg = args[i_arg:]
        f32 = jnp.float32

        moving = scalars_ref[1] > 0.5
        if staged:
            # per-lane pixel identity AND frame counter (multi-frame lane
            # pools fuse several progressive frames into one sorted
            # wavefront; each lane's RNG is keyed by ITS (frame, pixel))
            src = st_in_ref if state_in else pix_ref
            if state_in:
                px_f = src[layout.index("px")]
                py_f = src[layout.index("py")]
                frame = src[layout.index("fr")]
                fslot = src[layout.index("fslot")]
            else:
                px_f, py_f, frame, fslot = src[0], src[1], src[2], src[3]
        else:
            frame = scalars_ref[0]
        fu = frame.astype(jnp.int32).astype(jnp.uint32)

        if not state_in:
            if staged:
                pxu = px_f.astype(jnp.int32).astype(jnp.uint32)
                pyu = py_f.astype(jnp.int32).astype(jnp.uint32)
            else:
                row0 = pl.program_id(0) * tile_rows
                col0 = pl.program_id(1) * tile_cols
                py_i = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, tile_cols), 0) + row0
                px_i = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, tile_cols), 1) + col0
                px_f = px_i.astype(f32)
                py_f = py_i.astype(f32)
                pxu = px_i.astype(jnp.uint32)
                pyu = py_i.astype(jnp.uint32)
            # --- RNG seeds (absolute pixel coords) -----------------------
            sx = fu * pxu
            sy = (fu + 1) * pyu
        else:
            # lanes are permuted: absolute pixel coords ride the state, and
            # the fixed schedule lets the stream resume at a pure offset —
            # draw j uses seed + j, so seed + draws_before(bounce_lo).
            dpb = 2 + (3 if has_quad_light else 0) + (2 if use_lobe else 0)
            off = 4 + bounce_lo * dpb
            sx = fu * px_f.astype(jnp.int32).astype(jnp.uint32) + off
            sy = (fu + 1) * py_f.astype(jnp.int32).astype(jnp.uint32) + off

        zeros = jnp.zeros((tile_rows, tile_cols), f32)
        ones = jnp.ones((tile_rows, tile_cols), f32)
        if not state_in:
            # --- ray-gen: tent AA + thin-lens DoF (4 draws) --------------
            tx, sx, sy = _rng_next(sx, sy)
            ty, sx, sy = _rng_next(sx, sy)
            ox = _tent(tx)
            oy = _tent(ty)
            ndc_x = ((px_f + 0.5 + ox) / width) * 2.0 - 1.0
            ndc_y = ((py_f + 0.5 + oy) / height) * 2.0 - 1.0
            ulen = cam_ref[12]
            vlen = cam_ref[13]
            rdx = ndc_x * cam_ref[3] * ulen + ndc_y * cam_ref[6] * vlen + cam_ref[9]
            rdy = ndc_x * cam_ref[4] * ulen + ndc_y * cam_ref[7] * vlen + cam_ref[10]
            rdz = ndc_x * cam_ref[5] * ulen + ndc_y * cam_ref[8] * vlen + cam_ref[11]
            rdx, rdy, rdz = _normalize(rdx, rdy, rdz)
            ra, sx, sy = _rng_next(sx, sy)
            rr, sx, sy = _rng_next(sx, sy)
            angle = ra * TWO_PI
            radius = rr * cam_ref[14]
            sr = _safe_sqrt(radius)
            apx = (jnp.cos(angle) * cam_ref[3] + jnp.sin(angle) * cam_ref[6]) * sr
            apy = (jnp.cos(angle) * cam_ref[4] + jnp.sin(angle) * cam_ref[7]) * sr
            apz = (jnp.cos(angle) * cam_ref[5] + jnp.sin(angle) * cam_ref[8]) * sr
            focus = cam_ref[15]
            rdx, rdy, rdz = _normalize(focus * rdx - apx, focus * rdy - apy, focus * rdz - apz)
            rox = cam_ref[0] + apx
            roy = cam_ref[1] + apy
            roz = cam_ref[2] + apz

            # --- per-path state ------------------------------------------
            acc_r = zeros
            acc_g = zeros
            acc_b = zeros
            m_r = ones
            m_g = ones
            m_b = ones
            alive = ones > 0.0
            spec = ones > 0.0
            samp_l = zeros > 1.0
            coat = zeros > 1.0
            d_cnt = jnp.zeros((tile_rows, tile_cols), jnp.int32)
            sharp = zeros
            obj_nx = zeros
            obj_ny = zeros
            obj_nz = zeros
            obj_cr = zeros
            obj_cg = zeros
            obj_cb = zeros
            obj_id = jnp.full((tile_rows, tile_cols), -INFINITY, f32)
            prev_metal = zeros > 1.0
            if env_sky or env_hdri:
                # only the env miss chains read prev_trans; keeping the
                # carry in the Cornell-family compile costs real vector ops
                # per bounce
                prev_trans = zeros > 1.0
        else:
            # --- resume per-path state from the (permuted) plane stack ---
            def L(name):
                return st_in_ref[layout.index(name)]

            rox, roy, roz = L("rox"), L("roy"), L("roz")
            rdx, rdy, rdz = L("rdx"), L("rdy"), L("rdz")
            m_r, m_g, m_b = L("m_r"), L("m_g"), L("m_b")
            acc_r, acc_g, acc_b = L("acc_r"), L("acc_g"), L("acc_b")
            alive = L("alive") > 0.5
            spec = L("spec") > 0.5
            samp_l = L("samp_l") > 0.5
            coat = L("coat") > 0.5
            d_cnt = L("d_cnt").astype(jnp.int32)
            sharp = L("sharp")
            prev_metal = L("prev_metal") > 0.5
            obj_nx, obj_ny, obj_nz = L("obj_nx"), L("obj_ny"), L("obj_nz")
            obj_cr, obj_cg, obj_cb = L("obj_cr"), L("obj_cg"), L("obj_cb")
            obj_id = L("obj_id")
            if env_sky or env_hdri:
                prev_trans = L("prev_trans") > 0.5

        if has_quad_light:
            lv0x = quads_ref[light_i, 3]
            lv0y = quads_ref[light_i, 4]
            lv0z = quads_ref[light_i, 5]
            lv2x = quads_ref[light_i, 9]
            lv2y = quads_ref[light_i, 10]
            lv2z = quads_ref[light_i, 11]
            lv1x = quads_ref[light_i, 6]
            lv1y = quads_ref[light_i, 7]
            lv1z = quads_ref[light_i, 8]
            lv3x = quads_ref[light_i, 12]
            lv3y = quads_ref[light_i, 13]
            lv3z = quads_ref[light_i, 14]
            # light normal (normalized host-side)
            lnx = quads_ref[light_i, 0]
            lny = quads_ref[light_i, 1]
            lnz = quads_ref[light_i, 2]
        if env_sky or env_hdri:
            sunx = scalars_ref[3]
            suny = scalars_ref[4]
            sunz = scalars_ref[5]
            if env_sky:
                sky_sun_e = scalars_ref[7]
                sky_gamma = scalars_ref[8]
                sky_blend = scalars_ref[9]
            # ONB about the sun (cross-trick, PathTracingCommon.js:527-528)
            s_up = jnp.abs(suny) < 0.9
            shx = jnp.where(s_up, 0.0, 1.0)
            shy = jnp.where(s_up, 1.0, 0.0)
            sux = shy * sunz
            suy = -shx * sunz
            suz = shx * suny - shy * sunx
            s_inv = 1.0 / jnp.sqrt(jnp.maximum(sux * sux + suy * suy + suz * suz, 1e-20))
            sux, suy, suz = sux * s_inv, suy * s_inv, suz * s_inv
            svx = suny * suz - sunz * suy
            svy = sunz * sux - sunx * suz
            svz = sunx * suy - suny * sux

        if env_hdri:
            # deferred-env records: weight + direction at the (single) miss
            if state_in:
                mw_r, mw_g, mw_b = L("mw_r"), L("mw_g"), L("mw_b")
                md_x, md_y, md_z = L("md_x"), L("md_y"), L("md_z")
            else:
                mw_r = zeros
                mw_g = zeros
                mw_b = zeros
                md_x = zeros
                md_y = zeros
                md_z = zeros

        if mesh_textured:
            # alb_uv[b]: this bounce's deferred albedo-factor record
            # (u-or-minus-one, v); non-executed bounces keep the sentinel /
            # pass through the incoming state
            if state_in:
                em_w_r, em_w_g, em_w_b = L("em_r"), L("em_g"), L("em_b")
                em_u, em_v = L("em_u"), L("em_v")
                alb_uv = {
                    b: (L(f"alb_u{b}"), L(f"alb_v{b}")) for b in range(cfg.bounces)
                }
            else:
                em_w_r = zeros
                em_w_g = zeros
                em_w_b = zeros
                em_u = zeros
                em_v = zeros
                alb_uv = {b: (zeros - 1.0, zeros) for b in range(cfg.bounces)}

        # path-replay ∂log-throughput accumulators.  One plane per OBJECT
        # (not per object-channel): every linear throughput factor equals
        # the hit object's color *constant* color[j, c], so the per-channel
        # 1/color division is deferred to the host-side backward — the
        # kernel only counts hits (and, for Beer-Lambert, sums 0.01·t).
        if param_grads and state_in:
            # staged resume: accumulators ride the state planes
            sg = [st_in_ref[layout.index(f"sg{j}")] for j in range(n_obj)]
            sgb = (
                [st_in_ref[layout.index(f"sg{n_obj + j}")] for j in range(n_obj)]
                if not cfg.transparent_tint
                else None
            )
        else:
            sg = [zeros for _ in range(n_obj)] if param_grads else None
            sgb = (
                [zeros for _ in range(n_obj)]
                if param_grads and not cfg.transparent_tint
                else None
            )

        for bounce in range(bounce_lo, bounce_hi):
            # ---- scene intersect: all quads + spheres, keep nearest -----
            t_best = jnp.full((tile_rows, tile_cols), INFINITY, f32)
            nx = zeros
            ny = ones
            nz = zeros
            hc_r = zeros
            hc_g = zeros
            hc_b = zeros
            mat = jnp.full((tile_rows, tile_cols), -100.0, f32)
            hid = jnp.full((tile_rows, tile_cols), -INFINITY, f32)

            oid_counter = 0
            for s in range(n_spheres):
                # object space transform by the 4x4 inverse matrix (scalars)
                def M(r, c, _s=s):
                    return sph_ref[_s, r * 4 + c]

                ro_ox = M(0, 0) * rox + M(0, 1) * roy + M(0, 2) * roz + M(0, 3)
                ro_oy = M(1, 0) * rox + M(1, 1) * roy + M(1, 2) * roz + M(1, 3)
                ro_oz = M(2, 0) * rox + M(2, 1) * roy + M(2, 2) * roz + M(2, 3)
                rd_ox = M(0, 0) * rdx + M(0, 1) * rdy + M(0, 2) * rdz
                rd_oy = M(1, 0) * rdx + M(1, 1) * rdy + M(1, 2) * rdz
                rd_oz = M(2, 0) * rdx + M(2, 1) * rdy + M(2, 2) * rdz
                a = _dot(rd_ox, rd_oy, rd_oz, rd_ox, rd_oy, rd_oz)
                b = 2.0 * _dot(rd_ox, rd_oy, rd_oz, ro_ox, ro_oy, ro_oz)
                c = _dot(ro_ox, ro_oy, ro_oz, ro_ox, ro_oy, ro_oz) - 1.0
                inv_a = _safe_inv(a)
                nb = -b * inv_a * 0.5
                u2 = nb * nb - c * inv_a
                real = u2 >= 0.0
                u = jnp.where(real, _safe_sqrt(u2), 0.0)
                nbv = jnp.where(real, nb, 0.0)
                t0 = nbv - u
                t1 = nbv + u
                t_s = jnp.where(t0 > 0.0, t0, jnp.where(t1 > 0.0, t1, INFINITY))
                hx = ro_ox + rd_ox * t_s
                hy = ro_oy + rd_oy * t_s
                hz = ro_oz + rd_oz * t_s
                # world normal: transpose(inv) @ n_obj (n_obj = hit point)
                wnx = M(0, 0) * hx + M(1, 0) * hy + M(2, 0) * hz
                wny = M(0, 1) * hx + M(1, 1) * hy + M(2, 1) * hz
                wnz = M(0, 2) * hx + M(1, 2) * hy + M(2, 2) * hz
                wnx, wny, wnz = _normalize(wnx, wny, wnz)
                closer = t_s < t_best
                t_best = jnp.where(closer, t_s, t_best)
                nx = jnp.where(closer, wnx, nx)
                ny = jnp.where(closer, wny, ny)
                nz = jnp.where(closer, wnz, nz)
                hc_r = jnp.where(closer, sph_ref[s, 16], hc_r)
                hc_g = jnp.where(closer, sph_ref[s, 17], hc_g)
                hc_b = jnp.where(closer, sph_ref[s, 18], hc_b)
                mat = jnp.where(closer, sph_ref[s, 19], mat)
                hid = jnp.where(closer, f32(oid_counter), hid)
                oid_counter += 1

            for qi in range(n_quadrics):
                # object space via the shape's 4x4 inverse matrix (scalars),
                # TransformedQuadricGeometry_FragmentShader.js:77-317 order
                def M(r, c, _q=qi):
                    return qdr_ref[_q, r * 4 + c]

                ro_o = (
                    M(0, 0) * rox + M(0, 1) * roy + M(0, 2) * roz + M(0, 3),
                    M(1, 0) * rox + M(1, 1) * roy + M(1, 2) * roz + M(1, 3),
                    M(2, 0) * rox + M(2, 1) * roy + M(2, 2) * roz + M(2, 3),
                )
                rd_o = (
                    M(0, 0) * rdx + M(0, 1) * rdy + M(0, 2) * rdz,
                    M(1, 0) * rdx + M(1, 1) * rdy + M(1, 2) * rdz,
                    M(2, 0) * rdx + M(2, 1) * rdy + M(2, 2) * rdz,
                )
                t_s, qnx, qny, qnz = _QUADRIC_INTERSECTORS[qi](
                    ro_o, rd_o, scalars_ref[2]
                )
                # world normal: transpose(inv3x3) @ n_obj, then normalize
                wnx = M(0, 0) * qnx + M(1, 0) * qny + M(2, 0) * qnz
                wny = M(0, 1) * qnx + M(1, 1) * qny + M(2, 1) * qnz
                wnz = M(0, 2) * qnx + M(1, 2) * qny + M(2, 2) * qnz
                wnx, wny, wnz = _normalize(wnx, wny, wnz)
                closer = t_s < t_best
                t_best = jnp.where(closer, t_s, t_best)
                nx = jnp.where(closer, wnx, nx)
                ny = jnp.where(closer, wny, ny)
                nz = jnp.where(closer, wnz, nz)
                hc_r = jnp.where(closer, qdr_ref[qi, 16], hc_r)
                hc_g = jnp.where(closer, qdr_ref[qi, 17], hc_g)
                hc_b = jnp.where(closer, qdr_ref[qi, 18], hc_b)
                mat = jnp.where(closer, qdr_ref[qi, 19], mat)
                hid = jnp.where(closer, f32(oid_counter), hid)
                oid_counter += 1

            for q in range(n_quads):
                def Q(j, _q=q):
                    return quads_ref[_q, j]

                if fast_quads:
                    # Parallelogram fast path (statically verified host-side:
                    # v2 - v1 == v3 - v0 for every quad): ONE plane
                    # intersection + dual-basis inside test, analytically
                    # identical to the two Möller-Trumbore fans below —
                    # including the cull (both fans' dets equal -rd·(e1×e3))
                    # — at ~1/3 the vector-op count.  Scalar (SMEM) algebra
                    # is hoisted out of the vector pipeline by Mosaic.
                    e1x, e1y, e1z = Q(6) - Q(3), Q(7) - Q(4), Q(8) - Q(5)
                    e3x, e3y, e3z = Q(12) - Q(3), Q(13) - Q(4), Q(14) - Q(5)
                    ngx = e1y * e3z - e1z * e3y
                    ngy = e1z * e3x - e1x * e3z
                    ngz = e1x * e3y - e1y * e3x
                    # dual basis (handles skewed parallelograms): a/b are the
                    # e1/e3 parameters of the hit point
                    d1x = e3y * ngz - e3z * ngy
                    d1y = e3z * ngx - e3x * ngz
                    d1z = e3x * ngy - e3y * ngx
                    d3x = ngy * e1z - ngz * e1y
                    d3y = ngz * e1x - ngx * e1z
                    d3z = ngx * e1y - ngy * e1x
                    den1 = e1x * d1x + e1y * d1y + e1z * d1z
                    den3 = e3x * d3x + e3y * d3y + e3z * d3z
                    k1 = 1.0 / jnp.where(jnp.abs(den1) > 1e-20, den1, 1.0)
                    k3 = 1.0 / jnp.where(jnp.abs(den3) > 1e-20, den3, 1.0)
                    c0 = Q(3) * ngx + Q(4) * ngy + Q(5) * ngz
                    denom = rdx * ngx + rdy * ngy + rdz * ngz
                    ron = rox * ngx + roy * ngy + roz * ngz
                    tt = (c0 - ron) * _safe_inv(denom)
                    hxq = rox + rdx * tt - Q(3)
                    hyq = roy + rdy * tt - Q(4)
                    hzq = roz + rdz * tt - Q(5)
                    aa = (hxq * d1x + hyq * d1y + hzq * d1z) * k1
                    bb = (hxq * d3x + hyq * d3y + hzq * d3z) * k3
                    miss = (
                        (tt <= 0.0)
                        | (aa < 0.0) | (aa > 1.0)
                        | (bb < 0.0) | (bb > 1.0)
                        | (denom > 0.0)  # backface cull: det = -rd·ng < 0
                    )
                    t_q = jnp.where(miss, INFINITY, tt)
                else:
                    # two Möller-Trumbore fans: (v0,v1,v2) and (v0,v2,v3)
                    t_q = jnp.full((tile_rows, tile_cols), INFINITY, f32)
                    for (ax_, ay_, az_, bx_, by_, bz_) in (
                        (Q(6) - Q(3), Q(7) - Q(4), Q(8) - Q(5), Q(9) - Q(3), Q(10) - Q(4), Q(11) - Q(5)),
                        (Q(9) - Q(3), Q(10) - Q(4), Q(11) - Q(5), Q(12) - Q(3), Q(13) - Q(4), Q(14) - Q(5)),
                    ):
                        pvx, pvy, pvz = _cross(rdx, rdy, rdz, bx_, by_, bz_)
                        det = ax_ * pvx + ay_ * pvy + az_ * pvz
                        inv_det = _safe_inv(det)
                        tvx = rox - Q(3)
                        tvy = roy - Q(4)
                        tvz = roz - Q(5)
                        uu = _dot(tvx, tvy, tvz, pvx, pvy, pvz) * inv_det
                        qvx, qvy, qvz = _cross(tvx, tvy, tvz, ax_, ay_, az_)
                        vv = _dot(rdx, rdy, rdz, qvx, qvy, qvz) * inv_det
                        tt = (bx_ * qvx + by_ * qvy + bz_ * qvz) * inv_det
                        miss = (uu < 0.0) | (uu > 1.0) | (vv < 0.0) | (uu + vv > 1.0) | (tt <= 0.0)
                        miss = miss | (det < 0.0)  # backface cull like the jnp path
                        t_q = jnp.minimum(t_q, jnp.where(miss, INFINITY, tt))
                closer = t_q < t_best
                t_best = jnp.where(closer, t_q, t_best)
                nx = jnp.where(closer, Q(0), nx)
                ny = jnp.where(closer, Q(1), ny)
                nz = jnp.where(closer, Q(2), nz)
                hc_r = jnp.where(closer, Q(15), hc_r)
                hc_g = jnp.where(closer, Q(16), hc_g)
                hc_b = jnp.where(closer, Q(17), hc_b)
                mat = jnp.where(closer, Q(18), mat)
                hid = jnp.where(closer, f32(oid_counter), hid)
                oid_counter += 1

            if has_mesh:
                # BVH mesh, walked last so t_best already prunes subtrees
                # (SceneIntersect model section,
                # GLTFModelPathTracing_FragmentShader.js:201-344).
                def MM(r, c):
                    return mesh_s_ref[r * 4 + c]

                mro_x = MM(0, 0) * rox + MM(0, 1) * roy + MM(0, 2) * roz + MM(0, 3)
                mro_y = MM(1, 0) * rox + MM(1, 1) * roy + MM(1, 2) * roz + MM(1, 3)
                mro_z = MM(2, 0) * rox + MM(2, 1) * roy + MM(2, 2) * roz + MM(2, 3)
                mrd_x = MM(0, 0) * rdx + MM(0, 1) * rdy + MM(0, 2) * rdz
                mrd_y = MM(1, 0) * rdx + MM(1, 1) * rdy + MM(1, 2) * rdz
                mrd_z = MM(2, 0) * rdx + MM(2, 1) * rdy + MM(2, 2) * rdz
                cull_m = mesh_s_ref[17] > 0.5
                # Packet granularity: a shared scalar cursor over more lanes
                # skips fewer subtrees.  sub_rows == tile_rows → one
                # whole-tile packet (least code, every scalar fetch once per
                # tile — fastest for coherent/small meshes like the teapot);
                # sub_rows == 8 → per-(8, cols) sub-packets whose unions stay
                # tight under secondary-bounce divergence (measured ~2× on
                # DamagedHelmet-class meshes, worth the repeated fetches).
                stream = (
                    tuple(stream_refs) if mesh_stream else None
                )

                def pkt_base(rx, ry, rz, act_b):
                    """Majority direction octant of the packet's live lanes
                    -> base row of the matching near-first node layout.
                    Any octant yields CORRECT hits (all layouts walk the
                    same tree); the majority one maximizes early-t pruning
                    for direction-sorted packets."""
                    if not mesh_oct:
                        return None
                    if act_b is None:
                        tot = float(rx.shape[0] * rx.shape[1])
                        cnt = lambda v: jnp.sum(jnp.where(v > 0.0, 1.0, 0.0))
                    else:
                        a = act_b
                        tot = jnp.sum(jnp.where(a, 1.0, 0.0))
                        cnt = lambda v: jnp.sum(
                            jnp.where(a & (v > 0.0), 1.0, 0.0))
                    oct = (
                        (2.0 * cnt(rx) > tot).astype(jnp.int32) * 4
                        + (2.0 * cnt(ry) > tot).astype(jnp.int32) * 2
                        + (2.0 * cnt(rz) > tot).astype(jnp.int32)
                    )
                    return oct * n_nodes_p

                if sub_rows >= tile_rows:
                    act_w = alive if bounce else None
                    walk = _mesh_walk(
                        (mro_x, mro_y, mro_z), (mrd_x, mrd_y, mrd_z),
                        cull_m, mnodes_f_ref, mtris_ref,
                        n_nodes_p, t_best, active=act_w,
                        textured=mesh_textured, stream=stream,
                        base=pkt_base(mrd_x, mrd_y, mrd_z, act_w),
                        woop_ref=mwoop_ref,
                    )
                else:
                    parts = []
                    for s0 in range(0, tile_rows, sub_rows):
                        sl = slice(s0, s0 + sub_rows)
                        act_w = alive[sl] if bounce else None
                        walk_s = _mesh_walk(
                            (mro_x[sl], mro_y[sl], mro_z[sl]),
                            (mrd_x[sl], mrd_y[sl], mrd_z[sl]),
                            cull_m, mnodes_f_ref, mtris_ref,
                            n_nodes_p, t_best[sl],
                            active=act_w,
                            textured=mesh_textured, stream=stream,
                            base=pkt_base(mrd_x[sl], mrd_y[sl], mrd_z[sl], act_w),
                            woop_ref=mwoop_ref,
                        )
                        parts.append(walk_s)
                    walk = tuple(
                        jnp.concatenate([p[k] for p in parts], axis=0)
                        for k in range(len(parts[0]))
                    )
                t_m, mnx, mny, mnz, m_u, m_v, hit_m = walk[:7]
                hit_m = hit_m & alive if bounce else hit_m
                # world shading normal: transpose(inv3x3) @ n_obj
                wnx = MM(0, 0) * mnx + MM(1, 0) * mny + MM(2, 0) * mnz
                wny = MM(0, 1) * mnx + MM(1, 1) * mny + MM(2, 1) * mnz
                wnz = MM(0, 2) * mnx + MM(1, 2) * mny + MM(2, 2) * mnz
                wnx, wny, wnz = _normalize(wnx, wny, wnz)
                t_best = jnp.where(hit_m, t_m, t_best)
                nx = jnp.where(hit_m, wnx, nx)
                ny = jnp.where(hit_m, wny, ny)
                nz = jnp.where(hit_m, wnz, nz)
                # hitColor forced to white — slots 6-7 reserved-but-unused in
                # the reference too (GLTFModelPathTracing_FragmentShader.js:334);
                # textured albedo is DEFERRED (uv planes), so hc stays white
                # on the fused path too.
                hc_r = jnp.where(hit_m, 1.0, hc_r)
                hc_g = jnp.where(hit_m, 1.0, hc_g)
                hc_b = jnp.where(hit_m, 1.0, hc_b)
                if mesh_textured:
                    # per-triangle baked decisions (wavefront decode analog,
                    # radiance.py PBR block / GLTF...js:434-462): class is
                    # the already-thresholded DIFFUSE/METAL/CLEARCOAT id
                    cls_pl, rough_pl, emis_pl = walk[7:10]
                    mat = jnp.where(hit_m, cls_pl, mat)
                    pbr_hit = hit_m
                    # wrap UVs to [0,1) NOW: sampling REPEAT-wraps anyway
                    # (exactly — the pixel index shifts by a whole texture
                    # period), and it keeps the deferred records' u >= 0 so
                    # the -1 'no factor' sentinel cannot collide with
                    # legitimate negative glTF UVs
                    m_u = m_u - jnp.floor(m_u)
                    m_v = m_v - jnp.floor(m_v)
                else:
                    mat = jnp.where(hit_m, mesh_s_ref[16], mat)
                hid = jnp.where(hit_m, f32(oid_counter), hid)
                oid_counter += 1

            miss = t_best >= INFINITY
            # n is unit for all sources; face-forward
            flip = _dot(nx, ny, nz, rdx, rdy, rdz) < 0.0
            nlx = jnp.where(flip, nx, -nx)
            nly = jnp.where(flip, ny, -ny)
            nlz = jnp.where(flip, nz, -nz)
            xx = rox + rdx * t_best
            xy = roy + rdy * t_best
            xz = roz + rdz * t_best

            if env_sky:
                # environment on miss: Preetham sky with the reference's
                # first-match case chain (PhysicalSkyModel_FragmentShader.js:
                # 157-193), mirroring integrator.radiance exactly.
                m_env = alive & miss
                sky_r, sky_g, sky_b = _sky_color_c(
                    rdx, rdy, rdz, sunx, suny, sunz, sky_sun_e, sky_gamma, sky_blend
                )
                if bounce == 0:
                    acc_r = jnp.where(m_env, sky_r, acc_r)
                    acc_g = jnp.where(m_env, sky_g, acc_g)
                    acc_b = jnp.where(m_env, sky_b, acc_b)
                    sharp = jnp.where(m_env, 1.01, sharp)
                else:
                    cos_vs = rdx * sunx + rdy * suny + rdz * sunz
                    c2 = (d_cnt == 0) & spec
                    c3 = samp_l
                    c4 = (d_cnt == 1) & prev_trans & spec
                    c5 = d_cnt > 0
                    sun_clip = jnp.where(cos_vs < 0.99, 1.0, 0.0)
                    full = c2 | c3 | c4
                    env_w = jnp.where(full, 1.0, jnp.where(c5, sun_clip, 0.0))
                    acc_r = jnp.where(m_env, m_r * sky_r * env_w, acc_r)
                    acc_g = jnp.where(m_env, m_g * sky_g * env_w, acc_g)
                    acc_b = jnp.where(m_env, m_b * sky_b * env_w, acc_b)
                    sharp = jnp.where(m_env & c2, 1.01, sharp)

            if env_hdri:
                # HDRI miss: record direction + throughput-weighted case
                # weight; the equirect fetch happens outside the kernel.
                # Case chain = HDRIEnvironmentPathTracing_FragmentShader.js:
                # 412-437 (c4 additionally gated bounces < 3).
                m_env = alive & miss
                if bounce == 0:
                    mw_r = jnp.where(m_env, 1.0, mw_r)
                    mw_g = jnp.where(m_env, 1.0, mw_g)
                    mw_b = jnp.where(m_env, 1.0, mw_b)
                    sharp = jnp.where(m_env, 1.01, sharp)
                else:
                    cos_vs = rdx * sunx + rdy * suny + rdz * sunz
                    c2 = (d_cnt == 0) & spec
                    c3 = samp_l
                    c4 = (d_cnt == 1) & prev_trans & spec if bounce < 3 else None
                    c5 = d_cnt > 0
                    if env_nee:
                        # env NEE covers the whole map at every diffuse
                        # vertex — BSDF-sampled env hits after a diffuse
                        # bounce would double count (radiance.py:166-172)
                        sun_clip = zeros
                    else:
                        sun_clip = jnp.where(cos_vs < 0.99, 1.0, 0.0)
                    full = (c2 | c3 | c4) if c4 is not None else (c2 | c3)
                    env_w = jnp.where(full, 1.0, jnp.where(c5, sun_clip, 0.0))
                    mw_r = jnp.where(m_env, m_r * env_w, mw_r)
                    mw_g = jnp.where(m_env, m_g * env_w, mw_g)
                    mw_b = jnp.where(m_env, m_b * env_w, mw_b)
                    sharp = jnp.where(m_env & c2, 1.01, sharp)
                    if c4 is not None:
                        sharp = jnp.where(
                            m_env & ~c2 & ~c3 & c4 & (cos_vs > 0.99), 1.01, sharp
                        )
                md_x = jnp.where(m_env, rdx, md_x)
                md_y = jnp.where(m_env, rdy, md_y)
                md_z = jnp.where(m_env, rdz, md_z)

            alive = alive & ~miss
            lane = alive

            # ---- first-hit records --------------------------------------
            if bounce == 0:
                obj_nx = jnp.where(lane, nlx, obj_nx)
                obj_ny = jnp.where(lane, nly, obj_ny)
                obj_nz = jnp.where(lane, nlz, obj_nz)
                obj_cr = jnp.where(lane, hc_r, obj_cr)
                obj_cg = jnp.where(lane, hc_g, obj_cg)
                obj_cb = jnp.where(lane, hc_b, obj_cb)
                obj_id = jnp.where(lane, hid, obj_id)
            if bounce == 1:
                am = lane & prev_metal
                obj_nx = jnp.where(am, nlx, obj_nx)
                obj_ny = jnp.where(am, nly, obj_ny)
                obj_nz = jnp.where(am, nlz, obj_nz)
                obj_id = jnp.where(am, hid, obj_id)

            # ---- light hit ----------------------------------------------
            if has_quad_light:
                is_light = lane & (mat == f32(LIGHT))
                sharp = jnp.where(is_light & (d_cnt == 0), 1.01, sharp)
                lit = is_light & (spec | samp_l)
                acc_r = jnp.where(lit, m_r * hc_r, acc_r)
                acc_g = jnp.where(lit, m_g * hc_g, acc_g)
                acc_b = jnp.where(lit, m_b * hc_b, acc_b)
                alive = alive & ~is_light
                lane = alive
            else:
                lit = zeros > 1.0

            # ---- failed shadow ray --------------------------------------
            alive = alive & ~(lane & samp_l)
            lane = alive

            # ---- PBR emissive terminal (deferred value fetch) -----------
            if mesh_textured:
                # decision from the baked per-triangle flag; the emission
                # VALUE is fetched texel-exact outside the kernel
                # (radiance.py emissive block / GLTF...js:439-447)
                em_hit = lane & pbr_hit & spec & (emis_pl > 0.5)
                em_w_r = jnp.where(em_hit, m_r, em_w_r)
                em_w_g = jnp.where(em_hit, m_g, em_w_g)
                em_w_b = jnp.where(em_hit, m_b, em_w_b)
                em_u = jnp.where(em_hit, m_u, em_u)
                em_v = jnp.where(em_hit, m_v, em_v)
                sharp = jnp.where(em_hit, 1.01, sharp)
                alive = alive & ~em_hit
                lane = alive

            # ---- fixed-schedule draws -----------------------------------
            ch1 = (2 * bounce) % 4
            ch2 = (2 * bounce + 1) % 4
            gate1 = bn_ref[ch1]
            gate2 = bn_ref[ch2]
            hr, sx, sy = _rng_next(sx, sy)
            hp, sx, sy = _rng_next(sx, sy)
            # cosine hemisphere about nl
            r_ = _safe_sqrt(hr)
            phi = hp * TWO_PI
            hx_ = r_ * jnp.cos(phi)
            hy_ = r_ * jnp.sin(phi)
            hz_ = _safe_sqrt(1.0 - hx_ * hx_ - hy_ * hy_)
            # ONB about nl (cross-trick)
            up_y = jnp.abs(nly) < 0.9
            helx = jnp.where(up_y, 0.0, 1.0)
            hely = jnp.where(up_y, 1.0, 0.0)
            ux, uy, uz = _cross(helx, hely, zeros, nlx, nly, nlz)
            ux, uy, uz = _normalize(ux, uy, uz)
            vx, vy, vz = _cross(nlx, nly, nlz, ux, uy, uz)
            hemx = hx_ * ux + hy_ * vx + hz_ * nlx
            hemy = hx_ * uy + hy_ * vy + hz_ * nly
            hemz = hx_ * uz + hy_ * vz + hz_ * nlz
            hemx, hemy, hemz = _normalize(hemx, hemy, hemz)
            if has_quad_light:
                # quad light sample (3 draws)
                qx_, sx, sy = _rng_next(sx, sy)
                qy_, sx, sy = _rng_next(sx, sy)
                qz_, sx, sy = _rng_next(sx, sy)
                rpx = lv0x + (lv2x - lv0x) * jnp.clip(qx_, 0.1, 0.9)
                rpy = lv0y + (lv2y - lv0y) * jnp.clip(qy_, 0.1, 0.9)
                rpz = lv0z + (lv2z - lv0z) * jnp.clip(qz_, 0.1, 0.9)
                dlx = rpx - xx
                dly = rpy - xy
                dlz = rpz - xz
                e1 = _safe_sqrt(
                    (lv1x - lv0x) ** 2 + (lv1y - lv0y) ** 2 + (lv1z - lv0z) ** 2
                )
                e2 = _safe_sqrt(
                    (lv3x - lv0x) ** 2 + (lv3y - lv0y) ** 2 + (lv3z - lv0z) ** 2
                )
                r2 = e1 * e2
                d2 = _dot(dlx, dly, dlz, dlx, dly, dlz)
                cos_a_max = _safe_sqrt(1.0 - jnp.clip(r2 / jnp.maximum(d2, 1e-20), 0.0, 1.0))
                dlx, dly, dlz = _normalize(dlx, dly, dlz)
                dot_nl = jnp.maximum(0.0, _dot(nlx, nly, nlz, dlx, dly, dlz))
                lw = 2.0 * (1.0 - cos_a_max) * jnp.maximum(
                    0.0, -(dlx * lnx + dly * lny + dlz * lnz)
                ) * dot_nl
                lw = jnp.clip(lw, 0.0, 1.0)
            # lobe draws shared by sun/env NEE and the PBR metal lobe,
            # exactly as the wavefront's single use_lobe draw site
            # (radiance.py) — with nee == "env" the pair is still consumed
            # in-kernel (stream parity + the metal lobe), while the env
            # sample they seed was computed host-side from the SAME draws.
            # (`use_lobe` is hoisted to _make_kernel scope: the staged-mode
            # RNG offset needs it before the loop.)
            if use_lobe:
                lc_, sx, sy = _rng_next(sx, sy)
                lp_, sx, sy = _rng_next(sx, sy)
            if env_nee:
                # precomputed inverse-CDF sample planes for this bounce
                dlx = bn_ref[4 + 4 * bounce + 0]
                dly = bn_ref[4 + 4 * bounce + 1]
                dlz = bn_ref[4 + 4 * bounce + 2]
                # Lambertian weight cos/(pi*pdf) (radiance.py:283-284)
                lw = (
                    jnp.maximum(0.0, _dot(dlx, dly, dlz, nlx, nly, nlz))
                    * bn_ref[4 + 4 * bounce + 3]
                )
            elif not has_quad_light:
                # sun NEE: specular lobe about uSunDirection, roughness 0.1,
                # weight cosθ·0.05 (PhysicalSkyModel_FragmentShader.js:250-256)
                import math as _math

                rough = cfg.sun_lobe_roughness
                exponent = 7.0 * (1.0 - _math.sqrt(rough))
                power = 1.0 / (_math.exp(exponent) + 1.0)
                ct = _pow_c(lc_, power)
                st = _safe_sqrt(1.0 - ct * ct)
                phi_l = lp_ * TWO_PI
                lx = (
                    sux * (jnp.cos(phi_l) * st)
                    + svx * (jnp.sin(phi_l) * st)
                    + sunx * ct
                )
                ly = (
                    suy * (jnp.cos(phi_l) * st)
                    + svy * (jnp.sin(phi_l) * st)
                    + suny * ct
                )
                lz = (
                    suz * (jnp.cos(phi_l) * st)
                    + svz * (jnp.sin(phi_l) * st)
                    + sunz * ct
                )
                dlx = sunx + (lx - sunx) * rough
                dly = suny + (ly - suny) * rough
                dlz = sunz + (lz - sunz) * rough
                dlx, dly, dlz = _normalize(dlx, dly, dlz)
                cos_w = jnp.maximum(0.0, _dot(dlx, dly, dlz, nlx, nly, nlz))
                if cfg.sun_weight_mode == "hdri":
                    sp = scalars_ref[6]
                    lw = cos_w * (sp * sp * 1.0e-7)
                else:
                    lw = cos_w * 0.05

            # ---- material branches --------------------------------------
            b_diff = lane & (mat == f32(DIFFUSE))
            b_metal = lane & (mat == f32(METAL))
            b_trans = lane & (mat == f32(TRANSPARENT))
            b_coat = lane & (mat == f32(CLEARCOAT_DIFFUSE))

            # DIFFUSE
            dcnt_d = d_cnt + 1
            go_ind = (dcnt_d <= cfg.diffuse_indirect_max) & (gate1 < 0.5)
            rd_dx = jnp.where(go_ind, hemx, dlx)
            rd_dy = jnp.where(go_ind, hemy, dly)
            rd_dz = jnp.where(go_ind, hemz, dlz)
            mw = jnp.where(go_ind, 1.0, lw)
            md_r = m_r * hc_r * mw
            md_g = m_g * hc_g * mw
            md_b = m_b * hc_b * mw
            sl_d = ~go_ind

            # METAL (perfect mirror in the Cornell family)
            rfx, rfy, rfz = _reflect(rdx, rdy, rdz, nlx, nly, nlz)
            if cfg.metal_roughness_lobe:
                # randomDirectionInSpecularLobe(reflect, roughness) with the
                # per-lane baked PBR roughness (0 off-mesh ⇒ exact mirror),
                # mirroring core.sampling.specular_lobe_from_uniforms
                mrough = jnp.clip(rough_pl if mesh_textured else zeros, 0.0, 1.0)
                mexp = 7.0 * (1.0 - _safe_sqrt(mrough))
                mct = _pow_c(lc_, 1.0 / (jnp.exp(mexp) + 1.0))
                mst = _safe_sqrt(1.0 - mct * mct)
                mphi = lp_ * TWO_PI
                r_up = jnp.abs(rfy) < 0.9
                rhx = jnp.where(r_up, 0.0, 1.0)
                rhy = jnp.where(r_up, 1.0, 0.0)
                rux, ruy, ruz = _cross(rhx, rhy, zeros, rfx, rfy, rfz)
                rux, ruy, ruz = _normalize(rux, ruy, ruz)
                rvx, rvy, rvz = _cross(rfx, rfy, rfz, rux, ruy, ruz)
                lbx = rux * (jnp.cos(mphi) * mst) + rvx * (jnp.sin(mphi) * mst) + rfx * mct
                lby = ruy * (jnp.cos(mphi) * mst) + rvy * (jnp.sin(mphi) * mst) + rfy * mct
                lbz = ruz * (jnp.cos(mphi) * mst) + rvz * (jnp.sin(mphi) * mst) + rfz * mct
                rmx, rmy, rmz = _normalize(
                    rfx + (lbx - rfx) * mrough,
                    rfy + (lby - rfy) * mrough,
                    rfz + (lbz - rfz) * mrough,
                )
            else:
                rmx, rmy, rmz = rfx, rfy, rfz

            # TRANSPARENT: Fresnel with geometric n
            cosi = jnp.clip(_dot(rdx, rdy, rdz, nx, ny, nz), -1.0, 1.0)
            inside = cosi > 0.0
            ei = jnp.where(inside, 1.5, 1.0)
            et = jnp.where(inside, 1.0, 1.5)
            ratio = ei / et
            sint = ratio * _safe_sqrt(1.0 - cosi * cosi)
            tir = sint >= 1.0
            cost = _safe_sqrt(1.0 - sint * sint)
            cia = jnp.abs(cosi)
            rs = (et * cia - ei * cost) / jnp.maximum(et * cia + ei * cost, 1e-20)
            rp = (ei * cia - et * cost) / jnp.maximum(ei * cia + et * cost, 1e-20)
            re_t = jnp.where(tir, 1.0, jnp.clip(0.5 * (rs * rs + rp * rp), 0.0, 1.0))
            p_t = 0.25 + 0.5 * re_t
            go_refl_t = gate1 < p_t
            # refract(rd, nl, ratio)
            cosr = _dot(nlx, nly, nlz, rdx, rdy, rdz)
            kk = 1.0 - ratio * ratio * (1.0 - cosr * cosr)
            sq = _safe_sqrt(kk)
            tdx = ratio * rdx - (ratio * cosr + sq) * nlx
            tdy = ratio * rdy - (ratio * cosr + sq) * nly
            tdz = ratio * rdz - (ratio * cosr + sq) * nlz
            tdx = jnp.where(kk < 0.0, 0.0, tdx)
            tdy = jnp.where(kk < 0.0, 0.0, tdy)
            tdz = jnp.where(kk < 0.0, 0.0, tdz)
            if cfg.transparent_tint:
                ab_r, ab_g, ab_b = hc_r, hc_g, hc_b
            else:
                ab_r = jnp.where(inside, jnp.exp(jnp.log(jnp.clip(hc_r, 0.01, 0.99)) * 0.01 * t_best), 1.0)
                ab_g = jnp.where(inside, jnp.exp(jnp.log(jnp.clip(hc_g, 0.01, 0.99)) * 0.01 * t_best), 1.0)
                ab_b = jnp.where(inside, jnp.exp(jnp.log(jnp.clip(hc_b, 0.01, 0.99)) * 0.01 * t_best), 1.0)
            tr_t = 1.0 - re_t
            mt_refl = re_t / p_t
            mt_refr = tr_t / (1.0 - p_t)
            mt_r = jnp.where(go_refl_t, m_r * mt_refl, m_r * ab_r * mt_refr)
            mt_g = jnp.where(go_refl_t, m_g * mt_refl, m_g * ab_g * mt_refr)
            mt_b = jnp.where(go_refl_t, m_b * mt_refl, m_b * ab_b * mt_refr)
            rd_tx = jnp.where(go_refl_t, rfx, tdx)
            rd_ty = jnp.where(go_refl_t, rfy, tdy)
            rd_tz = jnp.where(go_refl_t, rfz, tdz)
            off_t = jnp.where(go_refl_t, eps, -eps)
            # bool select -> logical ops (Mosaic can't lower vector i1 selects)
            spec_t = spec | (~go_refl_t & (d_cnt == 1))
            sharp_t = jnp.where(
                (d_cnt == 0) & ~coat & (not cfg.camera_is_moving),
                1.01,
                jnp.where(d_cnt > 0, 0.0, -1.0),
            )

            # CLEARCOAT (Fresnel with nl, IOR 1.4)
            cosc = jnp.clip(_dot(rdx, rdy, rdz, nlx, nly, nlz), -1.0, 1.0)
            in_c = cosc > 0.0
            ei_c = jnp.where(in_c, 1.4, 1.0)
            et_c = jnp.where(in_c, 1.0, 1.4)
            ratio_c = ei_c / et_c
            sint_c = ratio_c * _safe_sqrt(1.0 - cosc * cosc)
            cost_c = _safe_sqrt(1.0 - sint_c * sint_c)
            cca = jnp.abs(cosc)
            rs_c = (et_c * cca - ei_c * cost_c) / jnp.maximum(et_c * cca + ei_c * cost_c, 1e-20)
            rp_c = (ei_c * cca - et_c * cost_c) / jnp.maximum(ei_c * cca + et_c * cost_c, 1e-20)
            re_c = jnp.where(sint_c >= 1.0, 1.0, jnp.clip(0.5 * (rs_c * rs_c + rp_c * rp_c), 0.0, 1.0))
            p_c = 0.25 + 0.5 * re_c
            go_refl_c = gate1 < p_c
            dcnt_c = d_cnt + 1
            go_ind_c = (dcnt_c <= cfg.diffuse_indirect_max) & (gate2 < 0.5)
            mc_base = (1.0 - re_c) / (1.0 - p_c)
            mw_c = jnp.where(go_ind_c, 1.0, lw)
            mc_r = jnp.where(go_refl_c, m_r * re_c / p_c, m_r * mc_base * hc_r * mw_c)
            mc_g = jnp.where(go_refl_c, m_g * re_c / p_c, m_g * mc_base * hc_g * mw_c)
            mc_b = jnp.where(go_refl_c, m_b * re_c / p_c, m_b * mc_base * hc_b * mw_c)
            rd_cx = jnp.where(go_refl_c, rfx, jnp.where(go_ind_c, hemx, dlx))
            rd_cy = jnp.where(go_refl_c, rfy, jnp.where(go_ind_c, hemy, dly))
            rd_cz = jnp.where(go_refl_c, rfz, jnp.where(go_ind_c, hemz, dlz))
            dcnt_sel_c = jnp.where(go_refl_c, d_cnt, dcnt_c)
            spec_c = go_refl_c & spec
            sl_c = ~go_refl_c & ~go_ind_c & (bounce < 3)
            sharp_c = jnp.where(
                go_refl_c,
                jnp.where(d_cnt == 0, jnp.where(frame > 500.0, 1.01, -1.0), 0.0),
                0.0,
            )

            if mesh_textured:
                # deferred albedo factor: branches that multiply throughput
                # by hit_color on a textured-mesh hit (DIFFUSE, METAL,
                # CLEARCOAT base) — composed outside as Π albedo(uv_b)^flag
                alb_f = pbr_hit & (b_diff | b_metal | (b_coat & ~go_refl_c))
                alb_uv[bounce] = (
                    jnp.where(alb_f, m_u, -1.0), jnp.where(alb_f, m_v, 0.0)
                )

            # ---- merge --------------------------------------------------
            new_rdx = jnp.where(b_diff, rd_dx, jnp.where(b_metal, rmx, jnp.where(b_trans, rd_tx, jnp.where(b_coat, rd_cx, rdx))))
            new_rdy = jnp.where(b_diff, rd_dy, jnp.where(b_metal, rmy, jnp.where(b_trans, rd_ty, jnp.where(b_coat, rd_cy, rdy))))
            new_rdz = jnp.where(b_diff, rd_dz, jnp.where(b_metal, rmz, jnp.where(b_trans, rd_tz, jnp.where(b_coat, rd_cz, rdz))))
            off = jnp.where(b_trans, off_t, eps)
            new_rox = xx + nlx * off
            new_roy = xy + nly * off
            new_roz = xz + nlz * off
            new_mr = jnp.where(b_diff, md_r, jnp.where(b_metal, m_r * hc_r, jnp.where(b_trans, mt_r, jnp.where(b_coat, mc_r, m_r))))
            new_mg = jnp.where(b_diff, md_g, jnp.where(b_metal, m_g * hc_g, jnp.where(b_trans, mt_g, jnp.where(b_coat, mc_g, m_g))))
            new_mb = jnp.where(b_diff, md_b, jnp.where(b_metal, m_b * hc_b, jnp.where(b_trans, mt_b, jnp.where(b_coat, mc_b, m_b))))
            new_spec = ~b_diff & ((b_trans & spec_t) | (b_coat & spec_c) | (~b_trans & ~b_coat & spec))
            new_sl = (b_diff & sl_d) | (~b_diff & b_coat & sl_c)
            new_dc = jnp.where(b_diff, dcnt_d, jnp.where(b_coat, dcnt_sel_c, d_cnt))
            new_sharp = jnp.where(b_trans, sharp_t, jnp.where(b_coat, sharp_c, sharp))
            coat = coat | b_coat
            known = b_diff | b_metal | b_trans | b_coat
            alive = alive & known

            rdx = jnp.where(lane, new_rdx, rdx)
            rdy = jnp.where(lane, new_rdy, rdy)
            rdz = jnp.where(lane, new_rdz, rdz)
            rox = jnp.where(lane, new_rox, rox)
            roy = jnp.where(lane, new_roy, roy)
            roz = jnp.where(lane, new_roz, roz)
            m_r = jnp.where(lane, new_mr, m_r)
            m_g = jnp.where(lane, new_mg, m_g)
            m_b = jnp.where(lane, new_mb, m_b)
            spec = (lane & new_spec) | (~lane & spec)
            samp_l = (lane & new_sl) | (~lane & samp_l)
            d_cnt = jnp.where(lane, new_dc, d_cnt)
            sharp = jnp.where(lane, new_sharp, sharp)
            prev_metal = (lane & b_metal) | (~lane & prev_metal)
            if env_sky or env_hdri:
                prev_trans = (lane & b_trans) | (~lane & prev_trans)

            if param_grads:
                # every factor touching the hit object's color this bounce:
                # DIFFUSE m*=hc·w, METAL m*=hc, CLEARCOAT base m*=base·hc·w,
                # TRANSPARENT tinted refract m*=hc·tr/(1-p)  → ∂log f/∂c = 1/c;
                # light hit acc=m·e → 1/e;  Beer-Lambert exp(0.01·t·log clip c)
                # → 0.01·t/c gated to the clip's linear region.  The 1/c (and
                # the per-channel clip gate) are applied host-side in f_bwd —
                # c is the hit object's color constant, not per-lane data.
                g_lin = b_diff | b_metal | (b_coat & ~go_refl_c) | lit
                if cfg.transparent_tint:
                    g_lin = g_lin | (b_trans & ~go_refl_t)
                g_lin_f = jnp.where(g_lin, 1.0, 0.0)
                if not cfg.transparent_tint:
                    beer_f = jnp.where(
                        b_trans & ~go_refl_t & inside, 0.01 * t_best, 0.0
                    )
                for j in range(n_obj):
                    mj = hid == f32(j)
                    sg[j] = sg[j] + jnp.where(mj, g_lin_f, 0.0)
                    if not cfg.transparent_tint:
                        sgb[j] = sgb[j] + jnp.where(mj, beer_f, 0.0)

        if staged:
            def bf(b):
                return jnp.where(b, ones, zeros)

            vals = {
                "rox": rox, "roy": roy, "roz": roz,
                "rdx": rdx, "rdy": rdy, "rdz": rdz,
                "m_r": m_r, "m_g": m_g, "m_b": m_b,
                "acc_r": acc_r, "acc_g": acc_g, "acc_b": acc_b,
                "alive": bf(alive), "spec": bf(spec), "samp_l": bf(samp_l),
                "coat": bf(coat), "d_cnt": d_cnt.astype(f32), "sharp": sharp,
                "prev_metal": bf(prev_metal), "px": px_f, "py": py_f,
                "fr": frame, "fslot": fslot,
                "obj_nx": obj_nx, "obj_ny": obj_ny, "obj_nz": obj_nz,
                "obj_cr": obj_cr, "obj_cg": obj_cg, "obj_cb": obj_cb,
                "obj_id": obj_id,
            }
            if env_sky or env_hdri:
                vals["prev_trans"] = bf(prev_trans)
            if env_hdri:
                vals.update(mw_r=mw_r, mw_g=mw_g, mw_b=mw_b,
                            md_x=md_x, md_y=md_y, md_z=md_z)
            if mesh_textured:
                vals.update(em_r=em_w_r, em_g=em_w_g, em_b=em_w_b,
                            em_u=em_u, em_v=em_v)
                for b in range(cfg.bounces):
                    vals[f"alb_u{b}"], vals[f"alb_v{b}"] = alb_uv[b]
            if param_grads:
                for j in range(n_obj):
                    vals[f"sg{j}"] = sg[j]
                    if sgb is not None:
                        vals[f"sg{n_obj + j}"] = sgb[j]
            for k, name in enumerate(layout):
                st_out_ref[k] = vals[name]
            return

        col_r[:] = jnp.maximum(acc_r, 0.0)
        col_g[:] = jnp.maximum(acc_g, 0.0)
        col_b[:] = jnp.maximum(acc_b, 0.0)
        onx[:] = obj_nx
        ony[:] = obj_ny
        onz[:] = obj_nz
        ocr[:] = obj_cr
        ocg[:] = obj_cg
        ocb[:] = obj_cb
        oid[:] = obj_id
        osh[:] = sharp
        if env_hdri:
            mw_r_o[:] = mw_r
            mw_g_o[:] = mw_g
            mw_b_o[:] = mw_b
            md_x_o[:] = md_x
            md_y_o[:] = md_y
            md_z_o[:] = md_z
        if mesh_textured:
            for b in range(cfg.bounces):
                au, av = alb_uv[b]
                alb_uv_o[2 * b][:] = au
                alb_uv_o[2 * b + 1][:] = av
            em_r_o[:] = em_w_r
            em_g_o[:] = em_w_g
            em_b_o[:] = em_w_b
            em_u_o[:] = em_u
            em_v_o[:] = em_v
        if param_grads:
            sg_ref = maybe_sg[0]
            for j in range(n_obj):
                sg_ref[j] = sg[j]
                if sgb is not None:
                    sg_ref[n_obj + j] = sgb[j]

    return kernel


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def pack_scene(scene: Scene):
    """Scene pytree -> SMEM-friendly packs (quads (Nq,20), spheres (Ns,21)
    or None, quadrics (12,20) or None)."""
    q = scene.quads
    from bpt_tpu.core.vecmath import normalize as _n

    qn = jnp.asarray(_n(q.normal))
    quads = jnp.concatenate(
        [qn, q.v0, q.v1, q.v2, q.v3, q.color, q.mat_type.astype(jnp.float32)[:, None],
         jnp.zeros((q.v0.shape[0], 1), jnp.float32)],
        axis=1,
    )
    sph = qdr = None
    if scene.spheres is not None:
        s = scene.spheres
        sph = jnp.concatenate(
            [s.inv_matrix.reshape(-1, 16), s.color, s.mat_type.astype(jnp.float32)[:, None],
             jnp.zeros((s.color.shape[0], 1), jnp.float32)],
            axis=1,
        )
    if scene.quadrics is not None:
        d = scene.quadrics
        qdr = jnp.concatenate(
            [d.inv_matrix.reshape(-1, 16), d.color,
             d.mat_type.astype(jnp.float32)[:, None]],
            axis=1,
        )
    return quads, sph, qdr


def pack_mesh(scene: Scene, use_oct: bool = False):
    """TriangleMesh -> kernel inputs (mesh_s (18,) f32, nodes, tris_dense)
    or None.  mesh_s = inv 4x4 row-major, mat_type, backface-cull flag
    (cull unless untextured TRANSPARENT,
    GLTFModelPathTracing_FragmentShader.js:284-287).  ``use_oct`` selects
    the (8*Np, 16) octant near-first node layouts (see
    accel.cluster.OctDenseClusteredBVH) instead of the preorder table."""
    m = scene.mesh
    if m is None:
        return None
    if m.fz_nodes_f is None:
        raise ValueError("mesh lacks the dense clustered pack (fz_*); "
                         "rebuild it with scenes.gltf_scene.mesh_from_model")
    mt = m.mat_type.astype(jnp.float32)
    has_albedo = m.albedo is not None
    cull = jnp.where(
        (not has_albedo) & (m.mat_type == TRANSPARENT), 0.0, 1.0
    ).astype(jnp.float32)
    mesh_s = jnp.concatenate(
        [m.inv_matrix.reshape(16).astype(jnp.float32), mt[None], cull[None]]
    )
    nodes = m.fz_nodes_oct if use_oct else m.fz_nodes_f
    return mesh_s, nodes, m.fz_tris, m.fz_woop


def pack_cornell_scene(scene: Scene):
    """Back-compat alias: (quads, spheres) packs of the Cornell family."""
    quads, sph, _ = pack_scene(scene)
    return quads, sph


def pack_camera(camera, width: int, height: int):
    from bpt_tpu.camera import film_extents

    ulen, vlen = film_extents(camera, width, height)
    return jnp.concatenate(
        [
            camera.position,
            camera.right,
            camera.up,
            camera.forward,
            jnp.stack([ulen, vlen, camera.aperture_size, camera.focus_distance]),
        ]
    ).astype(jnp.float32)


def _all_parallelograms(quads) -> bool:
    """Static host-side check gating the kernel's single-plane quad fast
    path: every quad must satisfy v2 - v1 == v3 - v0 (a parallelogram, as
    all reference demo quads do).  Returns False when the vertices are
    traced (e.g. differentiating w.r.t. quad geometry) or non-concrete —
    the kernel then keeps the generic two-fan Möller-Trumbore."""
    import numpy as np

    if quads is None:
        return False
    try:
        v0, v1, v2, v3 = (np.asarray(v) for v in (quads.v0, quads.v1, quads.v2, quads.v3))
    except Exception:
        return False
    return bool(np.allclose(v2 - v1, v3 - v0, atol=1e-5))


def _blue_noise_planes(blue_noise, height, width, rand_vec2):
    """Per-pixel decision texel: (4, H, W).

    The fetch index is (pixel + shared_offset) mod size — a uniform SHIFT of
    the whole table, not a per-pixel gather — so it lowers to roll + tile
    (pure data movement; XLA's per-element gather costs ~15 cycles/texel and
    would dominate small frames)."""
    size = blue_noise.shape[0]
    ox = jnp.floor(rand_vec2[0] * size).astype(jnp.int32)
    oy = jnp.floor(rand_vec2[1] * size).astype(jnp.int32)
    rolled = jnp.roll(jnp.mod(blue_noise, 1.0), shift=(-oy, -ox), axis=(0, 1))
    reps_y = -(-height // size)
    reps_x = -(-width // size)
    tiled = jnp.tile(rolled, (reps_y, reps_x, 1))[:height, :width]
    return jnp.moveaxis(tiled, -1, 0)


def _env_nee_planes(scene, cfg, frame_counter, height, width):
    """Precomputed env importance-sampling draws for the fused kernel.

    The fixed RNG schedule makes the per-bounce lobe pair (lc, lp) a pure
    function of (pixel, frame): draw j of iq's hash uses state
    (frame*px + j, (frame+1)*py + j).  For the HDRI family (no quad light,
    use_lobe on) the pair sits at draws 4 + 4b + {3, 4} — 4 ray-gen draws,
    then hem 2 + lobe 2 per bounce.  Replaying those draws host-side and
    pushing them through `sample_env_cdf` gives the EXACT sample the
    wavefront integrator (radiance.py:267-284) takes in-loop, so fused and
    wavefront keep float-level parity; the kernel consumes the same lc/lp
    draws for stream position and reads the resulting direction/pdf from
    these planes (Mosaic has no per-lane gather for the CDF search).

    Returns (4 * bounces, H, W): per bounce [dir.x, dir.y, dir.z,
    1/(pi*max(pdf, 1e-8))].
    """
    from bpt_tpu.core.rng import RngState, rng_next
    from bpt_tpu.env import EnvCDF, sample_env_cdf

    fu = jnp.asarray(frame_counter, jnp.float32).astype(jnp.int32).astype(jnp.uint32)
    px = jax.lax.broadcasted_iota(jnp.uint32, (height, width), 1)
    py = jax.lax.broadcasted_iota(jnp.uint32, (height, width), 0)
    sx0 = fu * px
    sy0 = (fu + jnp.uint32(1)) * py
    cdf = EnvCDF(*scene.env.env_cdf)
    planes = []
    for b in range(cfg.bounces):
        j = jnp.uint32(4 + 4 * b + 2)  # draws consumed before lc
        st = RngState(sx0 + j, sy0 + j)
        lc, st = rng_next(st)
        lp, _ = rng_next(st)
        d, pdf = sample_env_cdf(cdf, lc, lp)
        wb = 1.0 / (jnp.pi * jnp.maximum(pdf, 1e-8))
        planes.extend([d[..., 0], d[..., 1], d[..., 2], wb])
    return jax.lax.stop_gradient(jnp.stack(planes))


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width", "tile_rows", "tile_cols", "interpret", "param_grads", "fast_quads", "mesh_textured", "sub_rows", "mesh_oct"))
def _pallas_forward(packs, cam, scalars, bn_planes, cfg, height, width, tile_rows, tile_cols, interpret=False, param_grads=False, fast_quads=False, mesh_textured=False, sub_rows=0, mesh_oct=False):
    quads, sph, qdr, mesh = packs
    n_quads = quads.shape[0]
    n_spheres = sph.shape[0] if sph is not None else 0
    n_quadrics = qdr.shape[0] if qdr is not None else 0
    n_obj = n_quads + n_spheres + n_quadrics
    has_mesh = mesh is not None
    n_nodes_p = (mesh[1].shape[0] // (8 if mesh_oct else 1)) if has_mesh else 0
    if has_mesh and tile_rows % 8:
        raise ValueError(
            "mesh scenes need tile_rows % 8 == 0 (the f32 VMEM row tiling "
            "is (8, 128); tile heights must align to whole sublane tiles)"
        )
    has_woop = has_mesh and len(mesh) > 3 and mesh[3] is not None
    if has_mesh:
        # whole dense pack must fit VMEM alongside the path state (~16 MB/core)
        mesh_bytes = (mesh[1].size + mesh[2].size
                      + (mesh[3].size if has_woop else 0)) * 4
        if mesh_bytes > 12 * 1024 * 1024:
            raise ValueError(
                f"mesh pack is {mesh_bytes / 1e6:.0f} MB — beyond the fused "
                "kernel's VMEM budget (~12 MB for node+triangle tables); "
                "use the wavefront path (its packet kernel streams per-tile)"
            )
    n_out = 17 if cfg.env == "hdri" else 11
    if mesh_textured:
        n_out += 2 * cfg.bounces + 5  # per-bounce albedo UVs + emissive terminal
    kernel = _make_kernel(cfg, n_quads, n_spheres, n_quadrics, tile_rows, tile_cols, width, height, param_grads, has_mesh=has_mesh, n_nodes_p=n_nodes_p, fast_quads=fast_quads, mesh_textured=mesh_textured, sub_rows=sub_rows, mesh_oct=mesh_oct, mesh_woop=has_woop)
    grid = (height // tile_rows, width // tile_cols)
    plane = jax.ShapeDtypeStruct((height, width), jnp.float32)
    out_shape = [plane] * n_out
    out_specs = [
        pl.BlockSpec((tile_rows, tile_cols), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    ] * n_out
    if param_grads:
        n_sg = n_obj if cfg.transparent_tint else 2 * n_obj
        out_shape.append(jax.ShapeDtypeStruct((n_sg, height, width), jnp.float32))
        out_specs.append(
            pl.BlockSpec((n_sg, tile_rows, tile_cols), lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
        )
    inputs = [cam, scalars, quads]
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem, smem, smem]
    if n_spheres:
        inputs.append(sph)
        in_specs.append(smem)
    if n_quadrics:
        inputs.append(qdr)
        in_specs.append(smem)
    if has_mesh:
        mesh_s, nodes_f, tris_d = mesh[:3]
        inputs.extend([mesh_s, nodes_f, tris_d])
        in_specs.extend([
            smem,
            pl.BlockSpec(nodes_f.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris_d.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ])
        if has_woop:
            inputs.append(mesh[3])
            in_specs.append(
                pl.BlockSpec(mesh[3].shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
            )
    inputs.append(bn_planes)
    # 4 blue-noise planes, + 4 env-NEE sample planes per bounce when
    # cfg.nee == "env" (see _make_kernel)
    in_specs.append(
        pl.BlockSpec((bn_planes.shape[0], tile_rows, tile_cols),
                     lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    )
    grid_spec = pl.GridSpec(grid=grid, in_specs=in_specs, out_specs=out_specs)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)


# ---------------------------------------------------------------------------
# staged (sorted-wavefront) mode: per-bounce-range phases + ray reordering
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "cfg", "img_height", "img_width", "tile_rows", "tile_cols", "interpret",
    "fast_quads", "mesh_textured", "sub_rows", "bounce_lo", "bounce_hi",
    "mesh_stream", "mesh_oct", "param_grads"))
def _pallas_forward_staged(packs, cam, scalars, bn_planes, state, pix, cfg,
                           img_height, img_width, tile_rows, tile_cols,
                           interpret=False, fast_quads=False,
                           mesh_textured=False, sub_rows=0, bounce_lo=0,
                           bounce_hi=None, mesh_stream=False, mesh_oct=False,
                           param_grads=False):
    """One staged phase: bounces [bounce_lo, bounce_hi) with per-lane state
    riding an (S, R, W) plane stack.  The lane grid (R, W) is decoupled from
    the image: R = frames * img_height when several progressive frames fuse
    into one lane pool.  The ray-gen phase takes ``pix`` (4, R, W):
    [px, py, frame, fslot] and state=None; later phases the reverse.  With
    ``mesh_stream`` the triangle table stays in HBM and leaves are
    double-buffer-DMA'd (reference-capacity meshes on the fused path)."""
    quads, sph, qdr, mesh = packs
    n_quads = quads.shape[0]
    n_spheres = sph.shape[0] if sph is not None else 0
    n_quadrics = qdr.shape[0] if qdr is not None else 0
    has_mesh = mesh is not None
    n_nodes_p = (mesh[1].shape[0] // (8 if mesh_oct else 1)) if has_mesh else 0
    n_obj = n_quads + n_spheres + n_quadrics
    n_sg = (n_obj if cfg.transparent_tint else 2 * n_obj) if param_grads else 0
    layout = _state_layout(cfg, mesh_textured, n_sg)
    S = len(layout)
    rows, wcols = (pix.shape[1:] if state is None else state.shape[1:])
    # woop leaf-test rows: VMEM-resident normally; with mesh_stream both
    # the woop and dense tables stay in HBM (8-woop-row leaf windows +
    # blocking interp-row fetches)
    has_woop = has_mesh and len(mesh) > 3 and mesh[3] is not None
    kernel = _make_kernel(
        cfg, n_quads, n_spheres, n_quadrics, tile_rows, tile_cols, img_width,
        img_height, param_grads, has_mesh=has_mesh, n_nodes_p=n_nodes_p,
        fast_quads=fast_quads, mesh_textured=mesh_textured, sub_rows=sub_rows,
        bounce_lo=bounce_lo, bounce_hi=bounce_hi, staged=True,
        mesh_stream=mesh_stream, mesh_oct=mesh_oct, mesh_woop=has_woop,
    )
    # a non-divisible lane pool would silently leave trailing rows untraced
    # AND feed their uninitialized (px, py, fslot) identity planes into the
    # final group-8 scatter — garbage indices overwriting valid pixels
    # (advisor r4 finding); fail loudly instead
    if rows % tile_rows or wcols % tile_cols:
        raise ValueError(
            f"staged lane pool ({rows}, {wcols}) is not divisible by the "
            f"({tile_rows}, {tile_cols}) tile — pick tile sizes dividing "
            "frames*height and min(width, 256)"
        )
    grid = (rows // tile_rows, wcols // tile_cols)
    out_shape = [jax.ShapeDtypeStruct((S, rows, wcols), jnp.float32)]
    out_specs = [pl.BlockSpec((S, tile_rows, tile_cols), lambda i, j: (0, i, j),
                              memory_space=pltpu.VMEM)]
    inputs = [cam, scalars, quads]
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem, smem, smem]
    if n_spheres:
        inputs.append(sph)
        in_specs.append(smem)
    if n_quadrics:
        inputs.append(qdr)
        in_specs.append(smem)
    if has_mesh:
        mesh_s, nodes_f, tris_d = mesh[:3]
        inputs.extend([mesh_s, nodes_f, tris_d])
        in_specs.extend([
            smem,
            pl.BlockSpec(nodes_f.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY) if mesh_stream else
            pl.BlockSpec(tris_d.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ])
        if has_woop:
            inputs.append(mesh[3])
            in_specs.append(
                pl.BlockSpec(memory_space=pl.ANY) if mesh_stream else
                pl.BlockSpec(mesh[3].shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
            )
    inputs.append(bn_planes)
    in_specs.append(
        pl.BlockSpec((bn_planes.shape[0], tile_rows, tile_cols),
                     lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    )
    if state is not None:
        inputs.append(state)
        in_specs.append(
            pl.BlockSpec((S, tile_rows, tile_cols), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
        )
    else:
        inputs.append(pix)
        in_specs.append(
            pl.BlockSpec((4, tile_rows, tile_cols), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
        )
    scratch_shapes = []
    if mesh_stream:
        if has_woop:
            scratch_shapes = [
                pltpu.VMEM((2, 8, 128), jnp.float32),   # woop leaf windows
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, 128), jnp.float32),      # interp row pair
                pltpu.SemaphoreType.DMA,
            ]
        else:
            scratch_shapes = [
                pltpu.VMEM((2, 16, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
    (out,) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*inputs)
    return out


def _sort_key(state, layout, mode="oct-morton"):
    """Per-lane reorder key: dead lanes last (compaction), live lanes
    clustered so each (sub_rows, cols) packet's BVH subtree union stays
    tight under secondary-bounce divergence.  The fixed-schedule RNG is
    keyed by absolute pixel id (carried in the state), so reordering cannot
    perturb any draw.

    Key modes (most-significant field first):
      'oct-morton'  — direction octant, then 4-bit/axis Morton of origin
                      (direction-coherent packets; measured best on the
                      divergent-mesh family)
      'morton-oct'  — origin Morton, then octant
      'dir-morton'  — 2-bit/axis quantized direction, then origin Morton
    """

    def P(name):
        return state[layout.index(name)]

    alive = P("alive") > 0.5
    big = jnp.float32(1e9)
    ro = [P("rox"), P("roy"), P("roz")]
    rd = [P("rdx"), P("rdy"), P("rdz")]
    qs = []
    for v in ro:
        lo = jnp.min(jnp.where(alive, v, big))
        hi = jnp.max(jnp.where(alive, v, -big))
        qs.append(jnp.clip(
            (v - lo) / jnp.maximum(hi - lo, 1e-6) * 64.0, 0.0, 63.0
        ).astype(jnp.int32))

    def spread(x):  # 6-bit Morton spread: bit k -> bit 3k
        out = x & 1
        for k in range(1, 6):
            out = out | (((x >> k) & 1) << (3 * k))
        return out

    # 18-bit Morton: fine enough that a multi-frame pool's 2048-lane
    # packets sit well inside one cell's population
    morton = (spread(qs[0]) << 2) | (spread(qs[1]) << 1) | spread(qs[2])
    octant = (
        ((rd[0] > 0).astype(jnp.int32) << 2)
        | ((rd[1] > 0).astype(jnp.int32) << 1)
        | (rd[2] > 0).astype(jnp.int32)
    )
    if mode == "morton-oct":
        key = (morton << 3) | octant
    elif mode == "oct-morton":
        key = (octant << 18) | morton
    elif mode == "dir-morton":
        qd = [jnp.clip((v * 0.5 + 0.5) * 4.0, 0.0, 3.0).astype(jnp.int32)
              for v in rd]
        dir6 = (qd[0] << 4) | (qd[1] << 2) | qd[2]
        key = (dir6 << 18) | morton
    else:
        raise ValueError(mode)
    return jnp.where(alive, key, jnp.int32(1) << 30)


def _trace_staged(packs, cam, scalars, bn_stack, frames, cfg, height, width,
                  tile_rows, tile_cols, interpret, fast_quads, mesh_textured,
                  sub_rows, splits, mesh_stream, reorder_key="oct-morton",
                  sub_rows_primary=None, mesh_oct=False, img_height=None,
                  row_offset=0, param_grads=False):
    """Staged driver over a MULTI-FRAME lane pool.

    ``frames``: (F,) frame counters; ``bn_stack``: (C, F, H, W) per-frame
    draw planes (blue noise [+ env-NEE samples]).  All F progressive frames
    fuse into one lane pool of F*H*W rays: the pool is laid out in
    interleaved 8-row blocks (block-major, frame-minor) so a whole-tile
    primary packet bundles the F frames' near-identical camera rays, and
    between bounces the WHOLE pool sorts together — an F× larger sort pool
    cuts each packet's key span (and so its BVH footprint) by ~F on the
    divergent bounces.  Phase 0 runs in layout order; later phases run on
    sorted lanes; the final state scatters straight to (F, H, W) via the
    per-lane (fslot, py, px) identity.

    Returns the monolithic kernel's `outs` tuple with a leading F axis, so
    the composition tail (deferred equirect / PBR texel fetches) is shared
    verbatim."""
    quads_p, sph_p, qdr_p, _mesh_p = packs
    n_obj = (quads_p.shape[0]
             + (sph_p.shape[0] if sph_p is not None else 0)
             + (qdr_p.shape[0] if qdr_p is not None else 0))
    n_sg = (n_obj if cfg.transparent_tint else 2 * n_obj) if param_grads else 0
    layout = _state_layout(cfg, mesh_textured, n_sg)
    S = len(layout)
    F = frames.shape[0]
    M = F * height * width
    lane_w = min(width, 256)
    rows_total = M // lane_w
    assert height % 8 == 0 and M % lane_w == 0
    nb_c = bn_stack.shape[0]

    # Lane layout for phase 0 (the driver owns the lane↔pixel map; the
    # kernel reads identity from the pix planes).  Primary packets share a
    # BVH cursor per (sub_rows, lane_w) row group, so lanes are ordered in
    # SQUARE-ISH 32x64 pixel blocks (2048 lanes = one (8, 256) sub-packet)
    # rather than full-width strips — a strip spans the whole silhouette
    # and its subtree union approaches the whole tree, a block covers ~2%
    # of it.  Frames interleave block-major so a whole-tile cursor bundles
    # the F frames' near-identical rays of one block.
    bh, bw = 32, 64
    blocked = (height % bh == 0) and (width % bw == 0) and lane_w == 256

    def to_lanes(x):
        c = x.shape[0]
        if blocked:
            # (C,F,H,W) -> blocks of (bh, bw), block-major, frame-minor
            x = x.reshape(c, F, height // bh, bh, width // bw, bw)
            x = x.transpose(0, 2, 4, 1, 3, 5)  # (c, nbh, nbw, F, bh, bw)
            return x.reshape(c, rows_total, lane_w)
        # fallback: 8-row strips, block-major frame-minor
        x = x.reshape(c, F, height // 8, 8, width)
        x = x.transpose(0, 2, 1, 3, 4)
        return x.reshape(c, rows_total, lane_w)

    px0 = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    # absolute image rows (row_offset != 0 under row-sharded shard_map —
    # the RNG and NDC are keyed by absolute pixel coordinates)
    py0 = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + row_offset
    ones_f = jnp.ones((F, height, width), jnp.float32)
    pix = jnp.stack([
        px0[None] * ones_f,
        py0[None] * ones_f,
        frames.astype(jnp.float32)[:, None, None] * jnp.ones((height, width), jnp.float32),
        jnp.arange(F, dtype=jnp.float32)[:, None, None] * jnp.ones((height, width), jnp.float32),
    ])  # (4, F, H, W)
    pix = to_lanes(pix)
    nb = to_lanes(bn_stack)

    # clamp BEFORE capturing kw so every phase's pallas grid sees the
    # clamped tile (advisor r4: a post-capture clamp only reached phase 0's
    # sub_rows default)
    tile_rows = min(tile_rows, rows_total)
    kw = dict(cfg=cfg, img_height=img_height or height, img_width=width,
              tile_rows=tile_rows, tile_cols=tile_cols, interpret=interpret,
              fast_quads=fast_quads, mesh_textured=mesh_textured,
              mesh_stream=mesh_stream, mesh_oct=mesh_oct,
              param_grads=param_grads)
    bounds = [0] + list(splits) + [cfg.bounces]
    # primary packets are camera-coherent (and bundle F frames of the same
    # pixel block): default to one whole-tile shared cursor
    sr0 = tile_rows if sub_rows_primary is None else sub_rows_primary
    state = _pallas_forward_staged(packs, cam, scalars, nb, None, pix,
                                   bounce_lo=0, bounce_hi=bounds[1],
                                   sub_rows=sr0, **kw)
    # Permutations move GROUPS of 8 consecutive-x lanes, never single lanes:
    # a per-lane row gather over the (M, S+C) bundle costs ~15 cycles/row on
    # TPU (~16 ms at 1M lanes), group-8 rows cost 1/8th of that.  Groups of
    # 8 adjacent pixels are maximally coherent anyway, and because every
    # layout above emits aligned 8-pixel runs, groups survive all sorts
    # intact — including the final scatter home.
    G = 8
    C_all = S + nb_c
    for lo, hi in zip(bounds[1:-1], bounds[2:]):
        key = _sort_key(state, layout, reorder_key).reshape(M // G, G)
        gperm = jnp.argsort(jnp.min(key, axis=1))
        bundle = jnp.concatenate([state, nb], axis=0).reshape(C_all, M).T
        bundle = jnp.take(bundle.reshape(M // G, G * C_all), gperm, axis=0)
        bundle = bundle.reshape(M, C_all).T
        state = bundle[:S].reshape(S, rows_total, lane_w)
        nb = bundle[S:].reshape(nb_c, rows_total, lane_w)
        state = _pallas_forward_staged(packs, cam, scalars, nb, state, None,
                                       bounce_lo=lo, bounce_hi=hi,
                                       sub_rows=sub_rows, **kw)
    # scatter the final state straight to image order via the per-lane
    # (frame-slot, pixel) identity — groups land as 8-pixel runs
    fslot = state[layout.index("fslot")].astype(jnp.int32)
    py = state[layout.index("py")].astype(jnp.int32)
    px = state[layout.index("px")].astype(jnp.int32)
    flat = ((fslot * height + (py - row_offset)) * width + px).reshape(M)
    rows = state.reshape(S, M).T.reshape(M // G, G * S)
    gdst = flat.reshape(M // G, G)[:, 0] // G
    rows = jnp.zeros_like(rows).at[gdst].set(rows)
    state = rows.reshape(M, S).T.reshape(S, F, height, width)

    def P(name):
        return state[layout.index(name)]

    outs = [jnp.maximum(P("acc_r"), 0.0), jnp.maximum(P("acc_g"), 0.0),
            jnp.maximum(P("acc_b"), 0.0),
            P("obj_nx"), P("obj_ny"), P("obj_nz"),
            P("obj_cr"), P("obj_cg"), P("obj_cb"), P("obj_id"), P("sharp")]
    if cfg.env == "hdri":
        outs += [P("mw_r"), P("mw_g"), P("mw_b"),
                 P("md_x"), P("md_y"), P("md_z")]
    if mesh_textured:
        for b in range(cfg.bounces):
            outs += [P(f"alb_u{b}"), P(f"alb_v{b}")]
        outs += [P("em_r"), P("em_g"), P("em_b"), P("em_u"), P("em_v")]
    if param_grads:
        # (n_sg, F, H, W) — monolithic sgrad with a leading F axis folded in
        outs.append(jnp.stack([P(f"sg{j}") for j in range(n_sg)]))
    return tuple(outs)


# ---------------------------------------------------------------------------
# custom-VJP (path-replay parameter gradients, see module docstring)
# ---------------------------------------------------------------------------

def _zeros_ct(x):
    """Zero cotangent matching JAX's convention: float0 for integer leaves."""
    import numpy as np

    if x is None:
        return None
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.lru_cache(maxsize=64)
def _prb_fn(cfg: IntegratorConfig, height: int, width: int, tile_rows: int, tile_cols: int, interpret: bool, fast_quads: bool = False, mesh_textured: bool = False, sub_rows: int = 0, mesh_oct: bool = False):
    """Returns radiance(quads, sph, cam, scalars, bn) differentiable w.r.t.
    the packed material-color columns (quads[:,15:18], sph[:,16:19]) — the
    emission/albedo parameters of the Cornell-family inverse problem
    (BASELINE.json config #1/#5 shape).  With env "hdri", the deferred
    miss-weight planes carry the same ∂log-throughput sum, so env-terminated
    paths contribute material gradients too (the outer equirect composition
    adds exact HDR/exposure gradients by plain AD).  Other leaves get zero
    cotangents; use the jnp integrator for camera/geometry gradients."""

    kw = dict(cfg=cfg, height=height, width=width, tile_rows=tile_rows,
              tile_cols=tile_cols, interpret=interpret, fast_quads=fast_quads,
              mesh_textured=mesh_textured, sub_rows=sub_rows,
              mesh_oct=mesh_oct)
    env_hdri = cfg.env == "hdri"
    # index of the emissive-terminal throughput planes among the outputs
    em_idx = (17 if env_hdri else 11) + 2 * cfg.bounces if mesh_textured else None
    # blue-noise planes + precomputed env-NEE sample planes (nee == "env")
    n_draw = 4 + (4 * cfg.bounces if cfg.nee == "env" else 0)

    @jax.custom_vjp
    def f(packs, cam, scalars, bn_planes):
        return tuple(_pallas_forward(packs, cam, scalars, bn_planes, **kw))

    def f_fwd(packs, cam, scalars, bn_planes):
        *outs, sgrad = _pallas_forward(
            packs, cam, scalars, bn_planes, param_grads=True, **kw
        )
        mw = (outs[11], outs[12], outs[13]) if env_hdri else None
        emw = (outs[em_idx], outs[em_idx + 1], outs[em_idx + 2]) if em_idx else None
        quads, sph, qdr, _mesh = packs
        # (n_obj, 3) material colors in object-id order (spheres, quadrics,
        # quads) — the constants the kernel's hit counts implicitly divide by.
        parts = []
        if sph is not None:
            parts.append(sph[:, 16:19])
        if qdr is not None:
            parts.append(qdr[:, 16:19])
        parts.append(quads[:, 15:18])
        colors = jnp.concatenate(parts, axis=0)
        res = (outs[0], outs[1], outs[2], outs[9], mw, emw, sgrad, colors,
               jax.tree.map(_zeros_ct, packs, is_leaf=lambda x: x is None))
        return tuple(outs), res

    def f_bwd(res, cot):
        cr, cg, cb, oid_plane, mw, emw, sgrad, colors, zpacks = res
        zq, zs, zqd, _zmesh = zpacks
        n_s = zs.shape[0] if zs is not None else 0
        n_qd = zqd.shape[0] if zqd is not None else 0
        n_q = zq.shape[0]
        n_obj = n_q + n_s + n_qd
        adj_col = jnp.stack(cot[0:3])  # (3, H, W) radiance cotangent
        color = jnp.stack([cr, cg, cb])
        weighted = adj_col * color
        if env_hdri:
            # env-terminated paths: mw = m * env_w shares the path's
            # ∂log-throughput planes
            weighted = weighted + jnp.stack(cot[11:14]) * jnp.stack(mw)
        if emw is not None:
            # emissive-terminated paths likewise: em_w = m at termination
            weighted = weighted + jnp.stack(cot[em_idx:em_idx + 3]) * jnp.stack(emw)
        inv_c = 1.0 / jnp.maximum(colors, 1e-8)  # (n_obj, 3)
        # ∂log f/∂c = 1/c per linear hit; + 0.01·t/c in the Beer clip's
        # linear region (kernel planes carry the counts / Σ0.01·t).
        gcol = jnp.einsum("chw,jhw->jc", weighted, sgrad[:n_obj]) * inv_c
        if sgrad.shape[0] > n_obj:  # Beer-Lambert planes (absorption mode)
            beer_gate = ((colors > 0.01) & (colors < 0.99)).astype(jnp.float32)
            gcol = gcol + jnp.einsum(
                "chw,jhw->jc", weighted, sgrad[n_obj:]
            ) * beer_gate * inv_c
        # first-hit object_color record: d record_c / d color[j,c] = [oid == j]
        adj_oc = jnp.stack(cot[6:9])
        onehot = (oid_plane[None] == jnp.arange(n_obj, dtype=jnp.float32)[:, None, None])
        gcol = gcol + jnp.einsum("chw,jhw->jc", adj_oc, onehot.astype(jnp.float32))
        # object-id order: spheres, quadrics, quads (intersect.py numbering)
        gq = zq.at[:, 15:18].set(gcol[n_s + n_qd:])
        gs = zs.at[:, 16:19].set(gcol[:n_s]) if zs is not None else None
        gqd = zqd.at[:, 16:19].set(gcol[n_s:n_s + n_qd]) if zqd is not None else None
        return ((gq, gs, gqd, _zmesh), jnp.zeros(16, jnp.float32),
                jnp.zeros(10, jnp.float32), jnp.zeros((n_draw, height, width), jnp.float32))

    f.defvjp(f_fwd, f_bwd)
    return f


@functools.lru_cache(maxsize=64)
def _prb_staged_fn(cfg: IntegratorConfig, height: int, width: int,
                   tile_rows: int, tile_cols: int, interpret: bool,
                   fast_quads: bool, mesh_textured: bool, sub_rows: int,
                   splits: tuple, mesh_stream: bool, reorder_key: str,
                   sub_rows_primary, mesh_oct: bool, img_height: int):
    """Path-replay VJP for the STAGED (sorted-wavefront) path — the same
    ∂log-throughput planes as _prb_fn, but accumulated as per-lane state
    carries (`sg{j}` in _state_layout) so they ride the group-8 permutations
    and scatter home with the lane identity.  f(packs, cam, scalars,
    bn_stack, frames, row_offset) returns _trace_staged's outs tuple
    (leading F axis); row_offset is DYNAMIC (it is an axis_index under a
    row-sharded shard_map); gradients flow to the packed material-color
    columns exactly as in the monolithic VJP (verified bit-equal by
    tests/test_fused_gradients.py)."""
    env_hdri = cfg.env == "hdri"
    em_idx = (17 if env_hdri else 11) + 2 * cfg.bounces if mesh_textured else None
    n_draw = 4 + (4 * cfg.bounces if cfg.nee == "env" else 0)

    kw = dict(cfg=cfg, height=height, width=width, tile_rows=tile_rows,
              tile_cols=tile_cols, interpret=interpret, fast_quads=fast_quads,
              mesh_textured=mesh_textured, sub_rows=sub_rows,
              splits=splits, mesh_stream=mesh_stream, reorder_key=reorder_key,
              sub_rows_primary=sub_rows_primary, mesh_oct=mesh_oct,
              img_height=img_height)

    @jax.custom_vjp
    def f(packs, cam, scalars, bn_stack, frames, row_offset):
        return tuple(_trace_staged(packs, cam, scalars, bn_stack, frames,
                                   row_offset=row_offset, **kw))

    def f_fwd(packs, cam, scalars, bn_stack, frames, row_offset):
        *outs, sgrad = _trace_staged(packs, cam, scalars, bn_stack, frames,
                                     row_offset=row_offset,
                                     param_grads=True, **kw)
        mw = (outs[11], outs[12], outs[13]) if env_hdri else None
        emw = (outs[em_idx], outs[em_idx + 1], outs[em_idx + 2]) if em_idx else None
        quads, sph, qdr, _mesh = packs
        parts = []
        if sph is not None:
            parts.append(sph[:, 16:19])
        if qdr is not None:
            parts.append(qdr[:, 16:19])
        parts.append(quads[:, 15:18])
        colors = jnp.concatenate(parts, axis=0)
        res = (outs[0], outs[1], outs[2], outs[9], mw, emw, sgrad, colors,
               jax.tree.map(_zeros_ct, packs, is_leaf=lambda x: x is None))
        return tuple(outs), res

    def f_bwd(res, cot):
        cr, cg, cb, oid_plane, mw, emw, sgrad, colors, zpacks = res
        F = sgrad.shape[1]
        zq, zs, zqd, _zmesh = zpacks
        n_s = zs.shape[0] if zs is not None else 0
        n_qd = zqd.shape[0] if zqd is not None else 0
        n_q = zq.shape[0]
        n_obj = n_q + n_s + n_qd
        adj_col = jnp.stack(cot[0:3])  # (3, F, H, W)
        color = jnp.stack([cr, cg, cb])
        weighted = adj_col * color
        if env_hdri:
            weighted = weighted + jnp.stack(cot[11:14]) * jnp.stack(mw)
        if emw is not None:
            weighted = weighted + jnp.stack(cot[em_idx:em_idx + 3]) * jnp.stack(emw)
        inv_c = 1.0 / jnp.maximum(colors, 1e-8)
        gcol = jnp.einsum("cfhw,jfhw->jc", weighted, sgrad[:n_obj]) * inv_c
        if sgrad.shape[0] > n_obj:
            beer_gate = ((colors > 0.01) & (colors < 0.99)).astype(jnp.float32)
            gcol = gcol + jnp.einsum(
                "cfhw,jfhw->jc", weighted, sgrad[n_obj:]
            ) * beer_gate * inv_c
        adj_oc = jnp.stack(cot[6:9])
        onehot = (oid_plane[None]
                  == jnp.arange(n_obj, dtype=jnp.float32)[:, None, None, None])
        gcol = gcol + jnp.einsum("cfhw,jfhw->jc", adj_oc, onehot.astype(jnp.float32))
        gq = zq.at[:, 15:18].set(gcol[n_s + n_qd:])
        gs = zs.at[:, 16:19].set(gcol[:n_s]) if zs is not None else None
        gqd = zqd.at[:, 16:19].set(gcol[n_s:n_s + n_qd]) if zqd is not None else None
        import numpy as _np

        return ((gq, gs, gqd, _zmesh), jnp.zeros(16, jnp.float32),
                jnp.zeros(10, jnp.float32),
                jnp.zeros((n_draw, F, height, width), jnp.float32),
                jnp.zeros((F,), jnp.float32),
                _np.zeros((), jax.dtypes.float0))

    f.defvjp(f_fwd, f_bwd)
    return f


def _setup_inputs(scene: Scene, camera, cfg: IntegratorConfig, width, height,
                  frame_counter, want_oct: bool = False):
    """Shared packing/validation for the fused entry points: (packs, cam,
    scalars)."""
    assert cfg.env in ("none", "sky", "hdri")
    assert cfg.nee in ("quad", "sun", "env")
    assert (cfg.env == "none") == (cfg.nee == "quad")
    if cfg.nee == "env":
        assert cfg.env == "hdri" and scene.env is not None and scene.env.env_cdf is not None, (
            "nee='env' needs an HDRI environment with a built env_cdf "
            "(bpt_tpu.env.build_env_cdf; hdri_scene does this)")
    if cfg.metal_roughness_lobe:
        assert scene.mesh is not None and scene.mesh.albedo is not None, (
            "metal_roughness_lobe needs a textured mesh (per-lane roughness)"
        )
    # octant near-first layouts: 8x the node table — staged-path only
    # (the monolithic kernel's ~24 live output buffers leave no VMEM for
    # the replicated table), and only when small enough to leave room for
    # the rest of the kernel
    use_oct = (
        want_oct
        and scene.mesh is not None
        and scene.mesh.fz_nodes_oct is not None
        and scene.mesh.fz_nodes_oct.size * 4 <= 8 * 1024 * 1024
    )
    packs = pack_scene(scene) + (pack_mesh(scene, use_oct),)
    cam = pack_camera(camera, width, height)
    shape_k = (
        jnp.asarray(scene.quadrics.shape_k, jnp.float32)
        if scene.quadrics is not None
        else jnp.asarray(0.5, jnp.float32)
    )
    if scene.env is not None and scene.env.sun_direction is not None:
        sun = jnp.asarray(scene.env.sun_direction, jnp.float32)
        sun_power = jnp.asarray(scene.env.sun_power, jnp.float32)
    else:
        sun = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
        sun_power = jnp.asarray(1.0, jnp.float32)
    if cfg.env == "sky":
        # Scalar sky terms (pure functions of the sun direction) precomputed
        # host-side: Mosaic has no acos lowering for SunIntensity's arccos.
        from bpt_tpu import sky as _sky

        sun_e = _sky.sun_intensity(sun[1])
        sunfade = 1.0 - jnp.clip(1.0 - jnp.exp(sun[1] / 450000.0), 0.0, 1.0)
        sky_gamma = 1.0 / (1.2 + 1.2 * sunfade)
        sky_blend = jnp.clip((1.0 - sun[1]) ** 5, 0.0, 1.0)
    else:
        sun_e = sky_gamma = sky_blend = jnp.asarray(0.0, jnp.float32)
    scalars = jnp.stack(
        [
            jnp.asarray(frame_counter, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            shape_k,
            sun[0],
            sun[1],
            sun[2],
            sun_power,
            jnp.asarray(sun_e, jnp.float32),
            jnp.asarray(sky_gamma, jnp.float32),
            jnp.asarray(sky_blend, jnp.float32),
        ]
    )
    return packs, cam, scalars, use_oct


def trace_frames_pallas(
    scene: Scene,
    camera,
    cfg: IntegratorConfig,
    width: int,
    height: int,
    frame_counters,
    rand_vec2s,
    blue_noise,
    tile_rows: int = 32,
    tile_cols: int = 256,
    interpret: bool = False,
    mesh_sub_rows: int | None = None,
    fast_quads: bool | None = None,
    reorder_splits: tuple | None = None,
    reorder_key: str = "oct-morton",
    full_height: int | None = None,
    row_offset=0,
    mesh_stream: bool | None = None,
    differentiable: bool = False,
):
    """Fused MULTI-FRAME render on the staged sorted-wavefront path.

    Traces F progressive frames in ONE lane pool of F*H*W rays (see
    _trace_staged): primary packets bundle the F frames' near-identical
    camera rays under one shared BVH cursor, and the between-bounce sort
    sees an F× larger pool, so divergent-bounce packets stay F× tighter —
    the multi-sample generalization of ray reordering, and the natural
    shape for progressive accumulation (the renderer batches frames per
    dispatch anyway).

    frame_counters: (F,) floats; rand_vec2s: (F, 2) per-frame blue-noise
    offsets.  Returns a RadianceResult whose leaves have a leading F axis —
    numerically identical (lane-for-lane) to F single-frame
    trace_image_pallas calls.
    """
    frame_counters = jnp.asarray(frame_counters, jnp.float32)
    rand_vec2s = jnp.asarray(rand_vec2s, jnp.float32)
    F = int(frame_counters.shape[0])
    h_img = full_height if full_height is not None else height
    packs, cam, scalars, use_oct = _setup_inputs(
        scene, camera, cfg, width, h_img, frame_counters[0], want_oct=True
    )
    bn = jnp.asarray(blue_noise)
    stacks = []
    for f in range(F):
        # draw planes are built for the FULL image and row-sliced, so a
        # row-sharded shard (row_offset != 0) consumes identical draws
        planes = _blue_noise_planes(bn, h_img, width, rand_vec2s[f])
        if cfg.nee == "env":
            planes = jnp.concatenate(
                [planes,
                 _env_nee_planes(scene, cfg, frame_counters[f], h_img, width)],
                axis=0,
            )
        planes = jax.lax.dynamic_slice_in_dim(planes, row_offset, height, axis=1)
        stacks.append(planes)
    bn_stack = jnp.stack(stacks, axis=1)  # (C, F, H, W)
    if scene.mesh is not None:
        # mesh scenes carry BVH tables + the (S, tile, 256) state stacks in
        # VMEM: 16-row tiles leave headroom (32-row tiles OOM at ~17 MB with
        # the octant node layouts) and measure FASTER on the divergent
        # meshes (helmet 7.2 vs 6.4 Mrays/s)
        tile_rows = min(tile_rows, 16)
    tile_rows = min(tile_rows, F * height)
    tile_cols = min(tile_cols, width)
    if fast_quads is None:
        fast_quads = _all_parallelograms(scene.quads)
    mesh_textured = scene.mesh is not None and scene.mesh.albedo is not None
    sub_rows = 8 if (scene.mesh is not None and scene.mesh.fz_tris is not None
                     and int(scene.mesh.fz_tris.shape[0]) > 2048) else 0
    if mesh_sub_rows is not None:
        sub_rows = mesh_sub_rows
    splits = (tuple(reorder_splits) if reorder_splits is not None
              else tuple(range(1, cfg.bounces)))
    if mesh_stream is None:
        mesh_stream = False
        if scene.mesh is not None:
            mesh_bytes = (packs[3][1].size + packs[3][2].size
                          + (packs[3][3].size if packs[3][3] is not None else 0)) * 4
            mesh_stream = mesh_bytes > 12 * 1024 * 1024
    if differentiable:
        # staged path-replay VJP: material-color gradients through the
        # sg-plane state carries; texture-map gradients through the
        # deferred composition below by plain AD (same coverage as the
        # monolithic differentiable=True)
        f = _prb_staged_fn(cfg, height, width, tile_rows, tile_cols,
                           interpret, fast_quads, mesh_textured, sub_rows,
                           splits, mesh_stream, reorder_key, None, use_oct,
                           h_img)
        outs = f(packs, cam, scalars, bn_stack, frame_counters,
                 jnp.asarray(row_offset, jnp.int32))
    else:
        outs = _trace_staged(
            packs, cam, scalars, bn_stack, frame_counters, cfg, height, width,
            tile_rows, tile_cols, interpret, fast_quads, mesh_textured,
            sub_rows, splits, mesh_stream, reorder_key, mesh_oct=use_oct,
            img_height=h_img, row_offset=row_offset,
        )
    return _compose_result(outs, scene, cfg, mesh_textured)


def trace_image_pallas(
    scene: Scene,
    camera,
    cfg: IntegratorConfig,
    width: int,
    height: int,
    frame_counter,
    rand_vec2,
    blue_noise,
    tile_rows: int = 32,
    tile_cols: int = 256,
    interpret: bool = False,
    differentiable: bool = False,
    mesh_sub_rows: int | None = None,
    fast_quads: bool | None = None,
    reorder: bool = False,
    reorder_splits: tuple | None = None,
    reorder_key: str = "oct-morton",
):
    """Pallas forward of the Cornell-, quadric-, sky-, glTF- and HDRI-family
    radiance pass.

    Returns the same RadianceResult as integrator.frame.trace_image (same
    RNG schedule, float-level parity).  Covers scenes built from quads +
    matrix-instanced unit spheres + the 12-shape transformed-quadric set +
    one untextured BVH triangle mesh (walked in-loop by the escape-linked
    packet traversal), with env 'none' + quad NEE (Cornell /
    Transformed_Quadric_Geometry / GLTF_Model demos), env 'sky' + sun NEE
    (Physical_Sky_Model: Preetham miss shading with the 5-case chain), or
    env 'hdri' + sun NEE or env-CDF NEE (HDRI_Environment: the kernel defers
    the equirect fetch by emitting miss-weight/direction planes — a path
    misses at most once — and this wrapper composes
    ``color += miss_w * Get_HDR_Color``; for nee='env' the inverse-CDF
    samples are precomputed host-side from the same fixed-schedule draws,
    see ``_env_nee_planes``).

    With ``differentiable=True`` the call carries the fused path-replay
    custom_vjp: gradients flow to quad/sphere/quadric material colors (incl.
    the light emission) at ~forward cost; env 'hdri' additionally gets exact
    HDR-image/exposure gradients through the outer equirect composition.
    Other leaves get zero cotangents.

    Textured (PBR) meshes run fused too: the kernel walks the BVH in-loop,
    takes material decisions from per-triangle baked attributes
    (scenes.gltf_scene.bake_triangle_attrs), and DEFERS the albedo/emissive
    texel fetches via per-bounce UV planes composed here — values are
    bilinear-texel-exact, decisions are per-triangle (the documented
    approximation; the wavefront path decides per texel).
    """
    packs, cam, scalars, use_oct = _setup_inputs(scene, camera, cfg, width,
                                                 height, frame_counter,
                                                 want_oct=reorder)
    bn_planes = _blue_noise_planes(jnp.asarray(blue_noise), height, width, jnp.asarray(rand_vec2))
    if cfg.nee == "env":
        bn_planes = jnp.concatenate(
            [bn_planes, _env_nee_planes(scene, cfg, frame_counter, height, width)], axis=0
        )
    tile_rows = min(tile_rows, height)
    tile_cols = min(tile_cols, width)
    if fast_quads is None:
        # NB: under jit tracing the vertices are tracers and this resolves
        # to False — callers with a concrete scene (attach_pallas_path,
        # bench) should decide once and pass fast_quads explicitly.
        fast_quads = _all_parallelograms(scene.quads)
    mesh_textured = scene.mesh is not None and scene.mesh.albedo is not None
    # Packet granularity heuristic: big meshes diverge more than the
    # whole-tile shared cursor tolerates — drop to (8, cols) sub-packets
    # past ~8K triangles (teapot-class meshes stay whole-tile).
    sub_rows = 0
    if scene.mesh is not None and scene.mesh.fz_tris is not None:
        if int(scene.mesh.fz_tris.shape[0]) > 2048:
            sub_rows = 8
    if mesh_sub_rows is not None:
        sub_rows = mesh_sub_rows
    if reorder:
        # staged sorted-wavefront mode (single-frame pool): split the bounce
        # loop into phases and reorder rays between them (Morton-of-origin +
        # direction octant + dead-lane compaction).  Meshes whose dense pack
        # exceeds the VMEM budget automatically switch to HBM leaf
        # streaming, so reference-capacity scenes stay on the fused path.
        splits = (tuple(reorder_splits) if reorder_splits is not None
                  else tuple(range(1, cfg.bounces)))
        mesh_stream = False
        if scene.mesh is not None:
            mesh_bytes = (packs[3][1].size + packs[3][2].size
                          + (packs[3][3].size if packs[3][3] is not None else 0)) * 4
            mesh_stream = mesh_bytes > 12 * 1024 * 1024
        if differentiable:
            f = _prb_staged_fn(cfg, height, width, tile_rows, tile_cols,
                               interpret, fast_quads, mesh_textured, sub_rows,
                               splits, mesh_stream, reorder_key,
                               sub_rows if sub_rows else None, use_oct,
                               height)
            outs = f(packs, cam, scalars, bn_planes[:, None],
                     jnp.asarray(frame_counter, jnp.float32)[None],
                     jnp.asarray(0, jnp.int32))
        else:
            outs = _trace_staged(
                packs, cam, scalars, bn_planes[:, None],
                jnp.asarray(frame_counter, jnp.float32)[None], cfg, height,
                width, tile_rows, tile_cols, interpret, fast_quads,
                mesh_textured, sub_rows, splits, mesh_stream, reorder_key,
                sub_rows_primary=sub_rows if sub_rows else None,
                mesh_oct=use_oct,
            )
        outs = tuple(o[0] for o in outs)  # squeeze the F=1 axis
    elif differentiable:
        f = _prb_fn(cfg, height, width, tile_rows, tile_cols, interpret,
                    fast_quads, mesh_textured, sub_rows, use_oct)
        outs = f(packs, cam, scalars, bn_planes)
    else:
        outs = _pallas_forward(
            packs, cam, scalars, bn_planes, cfg, height, width, tile_rows, tile_cols, interpret,
            fast_quads=fast_quads, mesh_textured=mesh_textured, sub_rows=sub_rows,
            mesh_oct=use_oct,
        )
    return _compose_result(outs, scene, cfg, mesh_textured)


def _compose_result(outs, scene, cfg, mesh_textured):
    """Composition tail shared by every fused path (monolithic, staged,
    multi-frame — planes may carry leading batch axes)."""
    from bpt_tpu.integrator.radiance import RadianceResult

    (cr, cg, cb, onx, ony, onz, ocr, ocg, ocb, oid, osh) = outs[:11]
    color = jnp.stack([cr, cg, cb], axis=-1)
    n_base = 11
    if cfg.env == "hdri":
        # deferred equirect fetch: exactly one env lookup per path, outside
        # the kernel (Get_HDR_Color, HDRIEnvironmentPathTracing_
        # FragmentShader.js:351-360) — differentiable in image/exposure.
        from bpt_tpu.env import get_hdr_color

        mw = jnp.stack(outs[11:14], axis=-1)
        mdir = jnp.stack(outs[14:17], axis=-1)
        color = color + mw * get_hdr_color(
            scene.env.hdr_image, mdir, scene.env.hdr_exposure
        )
        n_base = 17
    if mesh_textured:
        # Deferred PBR composition.  Every path contributes radiance at
        # exactly ONE terminal event, so the per-bounce albedo factors
        # (which always precede it) factor out of the kernel exactly:
        # color_total = (kernel_color [+ env] + em_w·emission) · Π albedo.
        # Texel values are bilinear-exact (sRGB pow 2.2 decode,
        # GLTFModelPathTracing_FragmentShader.js:434-447); only the
        # branch DECISIONS are per-triangle (bake_triangle_attrs).
        from bpt_tpu.textures import sample_mesh_tex

        if scene.mesh.emissive is not None:
            em_w = jnp.stack(outs[n_base + 2 * cfg.bounces:
                                  n_base + 2 * cfg.bounces + 3], axis=-1)
            em_uv = jnp.stack(outs[n_base + 2 * cfg.bounces + 3:
                                   n_base + 2 * cfg.bounces + 5], axis=-1)
            emission = jnp.power(
                jnp.maximum(sample_mesh_tex(scene.mesh.emissive,
                                            scene.mesh.emissive_q, em_uv), 0.0), 2.2
            )
            color = color + em_w * emission
        prod = jnp.ones_like(color)
        for b in range(cfg.bounces):
            au = outs[n_base + 2 * b]
            av = outs[n_base + 2 * b + 1]
            has_f = (au >= 0.0)[..., None]
            alb = jnp.power(
                jnp.maximum(
                    sample_mesh_tex(scene.mesh.albedo, scene.mesh.albedo_q,
                                    jnp.stack([au, av], -1)),
                    0.0,
                ),
                2.2,
            )
            prod = prod * jnp.where(has_f, alb, 1.0)
        color = color * prod
    return RadianceResult(
        color=color,
        object_normal=jnp.stack([onx, ony, onz], axis=-1),
        object_color=jnp.stack([ocr, ocg, ocb], axis=-1),
        object_id=oid,
        pixel_sharpness=osh,
    )
