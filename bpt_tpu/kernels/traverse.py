"""Pallas packet-traversal closest-hit kernel (the BVH walk, TPU-native).

Why this exists: the XLA wavefront traversal (`bpt_tpu.accel.traverse`) is a
faithful vectorization of the reference's per-pixel stack walk
(/root/reference/js/GLTFModelPathTracing_FragmentShader.js:206-298), but its
per-lane node/triangle gathers are effectively scalar on TPU — measured
~0.2 Mrays/s on a v5e chip.  The TPU-native inversion (SURVEY.md §7 hard
part #1): a *packet* of rays (one (8,128) vreg tile = a 32x32 pixel block)
walks the clusterized preorder escape-linked BVH (`bpt_tpu.accel.cluster`)
with a SINGLE scalar node cursor; node and triangle records are fetched by
scalar `pl.ds` row loads (no gathers anywhere) and every AABB slab test /
Möller-Trumbore burst is a full-width vector op over the packet.  Subtrees
that no lane of the packet enters are skipped through the escape link, so
coherent packets do near-GPU work per ray while fully divergent packets
degrade gracefully to a masked linear sweep.

Attribute interpolation (smooth normal, UV) happens inside the winning
triangle update — the kernel's analog of the reference's deferred attribute
fetch (:302-344) — so the XLA side never gathers per-lane triangle data on
the forward pass.  Gradients: the walk's discrete output (triangle id) is
non-differentiable by construction; a custom VJP recomputes t/normal/uv for
the *selected* triangle with plain differentiable jnp math and pulls the
cotangents back through the ray origin/direction (detached-selection
policy, SURVEY.md §7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 32  # pixel block edge; one packet = BLOCK*BLOCK rays = one (8,128) tile
_INF = 1e30  # plain float: jnp constants would be captured by the kernel


def _safe_inv(x):
    """1/x with zeros mapped to a large finite value (slab/MT guard); the
    min/max slab ordering makes the substitute's sign immaterial."""
    return jnp.where(jnp.abs(x) < 1e-20, 1e20, 1.0 / jnp.where(x == 0.0, 1.0, x))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_kernel(n_nodes_padded: int):
    def kernel(cull_ref, rays_ref, nodes_f_ref, nodes_i_ref, tris_ref, fout_ref, iout_ref):
        rox = rays_ref[0]
        roy = rays_ref[1]
        roz = rays_ref[2]
        rdx = rays_ref[3]
        rdy = rays_ref[4]
        rdz = rays_ref[5]
        act = rays_ref[6] > 0.5  # terminated lanes must not steer the cursor
        invx = _safe_inv(rdx)
        invy = _safe_inv(rdy)
        invz = _safe_inv(rdz)
        cull = cull_ref[0, 0] != 0

        shape = rox.shape
        t0 = jnp.full(shape, _INF, jnp.float32)
        tri0 = jnp.full(shape, -1, jnp.int32)
        z = jnp.zeros(shape, jnp.float32)

        def cond(c):
            return c[0] < n_nodes_padded

        def body(c):
            i, t_best, tri_b, nx, ny, nz, us, vs = c
            nf = nodes_f_ref[pl.ds(i, 1), :]  # (1, 8): min.xyz max.xyz pad pad
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
            hit = (jnp.maximum(tmin, 0.0) <= tmax) & (tmin < t_best) & act
            any_hit = jnp.any(hit)

            esc = nodes_i_ref[i, 0]
            start = nodes_i_ref[i, 1]
            cnt = nodes_i_ref[i, 2]
            is_leaf = cnt > 0

            def leaf_fn(c2):
                def tri_body(k, c3):
                    t_best, tri_b, nx, ny, nz, us, vs = c3
                    row = tris_ref[pl.ds(start + k, 1), :]  # (1, 32)
                    p0x, p0y, p0z = row[0, 0], row[0, 1], row[0, 2]
                    p1x, p1y, p1z = row[0, 3], row[0, 4], row[0, 5]
                    p2x, p2y, p2z = row[0, 6], row[0, 7], row[0, 8]
                    e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
                    e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
                    # pvec = cross(rd, e2): vector x scalar-broadcast
                    pvx = rdy * e2z - rdz * e2y
                    pvy = rdz * e2x - rdx * e2z
                    pvz = rdx * e2y - rdy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = _safe_inv(det)
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
                    # interpolated smooth normal + UV (deferred-fetch analog)
                    inx = w * row[0, 9] + u * row[0, 12] + v * row[0, 15]
                    iny = w * row[0, 10] + u * row[0, 13] + v * row[0, 16]
                    inz = w * row[0, 11] + u * row[0, 14] + v * row[0, 17]
                    iu = w * row[0, 18] + u * row[0, 20] + v * row[0, 22]
                    iv = w * row[0, 19] + u * row[0, 21] + v * row[0, 23]
                    return (
                        jnp.where(closer, t, t_best),
                        jnp.where(closer, start + k, tri_b),
                        jnp.where(closer, inx, nx),
                        jnp.where(closer, iny, ny),
                        jnp.where(closer, inz, nz),
                        jnp.where(closer, iu, us),
                        jnp.where(closer, iv, vs),
                    )

                return jax.lax.fori_loop(0, cnt, tri_body, c2)

            leaf_state = (t_best, tri_b, nx, ny, nz, us, vs)
            t_best, tri_b, nx, ny, nz, us, vs = jax.lax.cond(
                any_hit & is_leaf, leaf_fn, lambda c2: c2, leaf_state
            )
            next_i = jnp.where(any_hit & jnp.logical_not(is_leaf), i + 1, esc)
            return (next_i, t_best, tri_b, nx, ny, nz, us, vs)

        carry = (jnp.int32(0), t0, tri0, z, z, z, z, z)
        _, t_best, tri_b, nx, ny, nz, us, vs = jax.lax.while_loop(cond, body, carry)

        fout_ref[0] = t_best
        fout_ref[1] = nx
        fout_ref[2] = ny
        fout_ref[3] = nz
        fout_ref[4] = us
        fout_ref[5] = vs
        iout_ref[:] = tri_b

    return kernel


@functools.partial(jax.jit, static_argnames=("n_nodes_padded", "interpret"))
def _traverse_call(rays, cull, nodes_f, nodes_i, tris, n_nodes_padded, interpret):
    """rays: (7, R, 128) pre-blocked (ro3, rd3, active); R = 8 * n_blocks."""
    n_blocks = rays.shape[1] // 8
    np_, _ = nodes_f.shape
    tp, _ = tris.shape
    grid = (n_blocks,)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cull (1,1) i32
        pl.BlockSpec((7, 8, 128), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((np_, 8), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # nodes_i, whole array
        pl.BlockSpec((tp, 32), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((6, 8, 128), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
    ]
    fout, iout = pl.pallas_call(
        _make_kernel(n_nodes_padded),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((6, rays.shape[1], 128), jnp.float32),
            jax.ShapeDtypeStruct((rays.shape[1], 128), jnp.int32),
        ],
        interpret=interpret,
    )(cull, rays, nodes_f, nodes_i, tris)
    return fout, iout


# ---------------------------------------------------------------------------
# HBM-streaming variant: reference-capacity meshes (up to the 524,288-tri
# cap of the reference's 2048^2 data textures, GLTF_Model_Path_Tracing.js:
# 291-295).  The dense pack's triangle table no longer fits VMEM past a few
# hundred thousand records, so it stays in HBM and each leaf's row range is
# DMA'd into a VMEM scratch on demand; the node table (16-float rows with
# float-encoded links, accel.cluster dense layout) remains VMEM-resident.
# ---------------------------------------------------------------------------

_HBM_LEAF_ROWS = 16  # scratch rows per leaf DMA (leaf_size <= 4 * this)


def _make_hbm_kernel(n_nodes_padded: int):
    """Double-buffered leaf streaming: encountering a leaf STARTS its DMA
    into the alternate scratch slot and then processes the PREVIOUS pending
    leaf — whose copy has had all the intervening node-step iterations (and
    this leaf's DMA issue) to complete — so the VPU no longer idles for a
    full HBM round trip per leaf (round-3 weakness #2).  Deferring a leaf's
    triangle test is sound: t_best is a pure min-reduction (order-
    independent), deferral only weakens pruning to a superset of visits, and
    leaves are still processed in discovery (preorder) order so strict-<
    tie-breaking is unchanged."""

    def kernel(cull_ref, rays_ref, nodes_f_ref, tris_hbm, fout_ref, iout_ref,
               scratch, sem):
        rox, roy, roz = rays_ref[0], rays_ref[1], rays_ref[2]
        rdx, rdy, rdz = rays_ref[3], rays_ref[4], rays_ref[5]
        act = rays_ref[6] > 0.5  # terminated lanes must not steer the cursor
        invx = _safe_inv(rdx)
        invy = _safe_inv(rdy)
        invz = _safe_inv(rdz)
        cull = cull_ref[0, 0] != 0

        shape = rox.shape
        t0 = jnp.full(shape, _INF, jnp.float32)
        tri0 = jnp.full(shape, -1, jnp.int32)
        z = jnp.zeros(shape, jnp.float32)

        def leaf_dma(row0, slot):
            return pltpu.make_async_copy(
                tris_hbm.at[pl.ds(row0, _HBM_LEAF_ROWS), :],
                scratch.at[slot], sem.at[slot],
            )

        def process_leaf(row0, nrows, slot, c3):
            """MT-test the pending leaf's rows from scratch[slot] (already
            waited)."""

            def row_body(k, c4):
                t_best, tri_b, nx, ny, nz, us, vs = c4
                row = scratch[slot, pl.ds(k, 1), :]  # (1, 128): 4 records
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
                    inv_det = _safe_inv(det)
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
                    tri_b = jnp.where(closer, (row0 + k) * 4 + j, tri_b)
                    nx = jnp.where(closer, inx, nx)
                    ny = jnp.where(closer, iny, ny)
                    nz = jnp.where(closer, inz, nz)
                    us = jnp.where(closer, iu, us)
                    vs = jnp.where(closer, iv, vs)
                return (t_best, tri_b, nx, ny, nz, us, vs)

            return jax.lax.fori_loop(0, nrows, row_body, c3)

        def cond(c):
            return c[0] < n_nodes_padded

        # BVH4 inlined-leaf records (accel.cluster.Bvh4OctBVH): 4 child
        # AABBs per 32-float row; leaf children (meta < 0) DMA + process at
        # the parent's step through the same double-buffer pipeline
        bvh4 = nodes_f_ref.shape[-1] == 32

        def body4(c):
            i, pr0, pnr, slot, t_best, tri_b, nx, ny, nz, us, vs = c
            nf = nodes_f_ref[pl.ds(i, 1), :]  # (1, 32)
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
                ms.append(jnp.any(
                    (jnp.maximum(tmin, 0.0) <= tmax) & (tmin < t_best) & act
                ))
            meta = [nf[0, 24 + k] for k in range(4)]
            esc = nf[0, 28].astype(jnp.int32)

            st = (t_best, tri_b, nx, ny, nz, us, vs)
            c2 = (pr0, pnr, slot, st)
            for k in range(4):
                # meta is WOOP-row units (accel.cluster.Bvh4OctBVH); this
                # walker tests the dense MT rows (2 per woop row)
                enc = (-meta[k]).astype(jnp.int32)
                row0 = 2 * (enc // 32)
                nrows = 2 * (enc - (enc // 32) * 32)

                def leaf_fn(c3, row0=row0, nrows=nrows):
                    pr0, pnr, slot, st = c3
                    leaf_dma(row0, 1 - slot).start()

                    def drain(st):
                        leaf_dma(pr0, slot).wait()
                        return process_leaf(pr0, pnr, slot, st)

                    st = jax.lax.cond(pnr > 0, drain, lambda s: s, st)
                    return (row0, nrows, 1 - slot, st)

                c2 = jax.lax.cond(ms[k] & (meta[k] < 0.0), leaf_fn,
                                  lambda c3: c3, c2)
            pr0, pnr, slot, st = c2
            t_best, tri_b, nx, ny, nz, us, vs = st
            next_i = esc
            for k in (3, 2, 1, 0):
                next_i = jnp.where(ms[k] & (meta[k] > 0.0),
                                   meta[k].astype(jnp.int32), next_i)
            return (next_i, pr0, pnr, slot, t_best, tri_b, nx, ny, nz, us, vs)

        def body(c):
            i, pr0, pnr, slot, t_best, tri_b, nx, ny, nz, us, vs = c
            nf = nodes_f_ref[pl.ds(i, 1), :]  # (1, 16): min max esc row0 nrows
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
            hit = (jnp.maximum(tmin, 0.0) <= tmax) & (tmin < t_best) & act
            any_hit = jnp.any(hit)

            esc = nf[0, 6].astype(jnp.int32)
            row0 = nf[0, 7].astype(jnp.int32)
            nrows = nf[0, 8].astype(jnp.int32)
            is_leaf = nrows > 0
            take_leaf = any_hit & is_leaf

            def leaf_fn(c2):
                # 1. kick off THIS leaf's copy into the free slot
                leaf_dma(row0, 1 - slot).start()

                # 2. drain the pending leaf from the other slot (its DMA has
                #    been in flight since it was discovered)
                def drain(c3):
                    leaf_dma(pr0, slot).wait()
                    return process_leaf(pr0, pnr, slot, c3)

                return jax.lax.cond(pnr > 0, drain, lambda c3: c3, c2)

            leaf_state = (t_best, tri_b, nx, ny, nz, us, vs)
            t_best, tri_b, nx, ny, nz, us, vs = jax.lax.cond(
                take_leaf, leaf_fn, lambda c2: c2, leaf_state
            )
            pr0 = jnp.where(take_leaf, row0, pr0)
            pnr = jnp.where(take_leaf, nrows, pnr)
            slot = jnp.where(take_leaf, 1 - slot, slot)
            next_i = jnp.where(any_hit & jnp.logical_not(is_leaf), i + 1, esc)
            return (next_i, pr0, pnr, slot, t_best, tri_b, nx, ny, nz, us, vs)

        carry = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(1),
                 t0, tri0, z, z, z, z, z)
        _, pr0, pnr, slot, t_best, tri_b, nx, ny, nz, us, vs = (
            jax.lax.while_loop(cond, body4 if bvh4 else body, carry)
        )

        # drain the last pending leaf
        def final_drain(c3):
            leaf_dma(pr0, slot).wait()
            return process_leaf(pr0, pnr, slot, c3)

        t_best, tri_b, nx, ny, nz, us, vs = jax.lax.cond(
            pnr > 0, final_drain, lambda c3: c3,
            (t_best, tri_b, nx, ny, nz, us, vs),
        )

        fout_ref[0] = t_best
        fout_ref[1] = nx
        fout_ref[2] = ny
        fout_ref[3] = nz
        fout_ref[4] = us
        fout_ref[5] = vs
        iout_ref[:] = tri_b

    return kernel


@functools.partial(jax.jit, static_argnames=("n_nodes_padded", "interpret"))
def _traverse_call_hbm(rays, cull, nodes_f, tris, n_nodes_padded, interpret):
    """HBM-streaming traverse: rays (7, R, 128: ro3, rd3, active); nodes_f
    (Np, 16) dense-pack layout; tris (Rp + _HBM_LEAF_ROWS, 128) in HBM
    (over-padded)."""
    n_blocks = rays.shape[1] // 8
    np_, _ = nodes_f.shape
    grid = (n_blocks,)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cull (1,1) i32
        pl.BlockSpec((7, 8, 128), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((np_, 16), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),   # tris stay in HBM
    ]
    out_specs = [
        pl.BlockSpec((6, 8, 128), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
    ]
    fout, iout = pl.pallas_call(
        _make_hbm_kernel(n_nodes_padded),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((6, rays.shape[1], 128), jnp.float32),
            jax.ShapeDtypeStruct((rays.shape[1], 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, _HBM_LEAF_ROWS, 128), jnp.float32),  # double-buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(cull, rays, nodes_f, tris)
    return fout, iout


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def hbm_closest_hit(ro, rd, cull, act, nodes_f, tris, interpret: bool = False):
    """Closest hit over an HBM-resident dense clusterized pack — the
    reference-capacity path (no VMEM cap on triangle count; the per-leaf
    row DMA replaces residency).  Gradients use the same detached-selection
    recompute as packet_closest_hit.

    ro/rd: (H, W, 3) object-space rays.  nodes_f/tris: the fz_* dense pack
    (accel.cluster.pack_clustered_dense, leaf_size <= 4 * _HBM_LEAF_ROWS).
    Returns (t, normal_obj, u, v, packed_slot_id).
    """
    h, w = ro.shape[:2]
    rays = jnp.stack(
        [_to_blocks(ro[..., k], h, w) for k in range(3)]
        + [_to_blocks(rd[..., k], h, w) for k in range(3)]
        + [_to_blocks(act, h, w)]
    )
    cull2 = jnp.reshape((cull > 0.5).astype(jnp.int32), (1, 1))
    # the dense pack is over-padded by _HBM_LEAF_ROWS at pack time
    # (accel.cluster.pack_clustered_dense), so the fixed-size leaf DMA can
    # never run off the table — no copy here
    fout, iout = _traverse_call_hbm(
        rays, cull2, nodes_f, tris, int(nodes_f.shape[0]), interpret
    )
    t = _from_blocks(fout[0], h, w)
    n = jnp.stack([_from_blocks(fout[1 + k], h, w) for k in range(3)], axis=-1)
    us = _from_blocks(fout[4], h, w)
    vs = _from_blocks(fout[5], h, w)
    tri = _from_blocks(iout, h, w)
    return t, n, us, vs, tri


def _hbm_fwd(ro, rd, cull, act, nodes_f, tris, interpret):
    out = hbm_closest_hit(ro, rd, cull, act, nodes_f, tris, interpret)
    return out, (ro, rd, nodes_f, tris, out[4])


def _hbm_bwd(interpret, res, cot):
    ro, rd, nodes_f, tris, slot = res
    ct, cn, cu, cv, _ = cot
    ok = slot >= 0
    rows = jnp.take(tris.reshape(-1, 32), jnp.maximum(slot, 0), axis=0)

    def f(ro, rd):
        return _recompute(ro, rd, rows, ok)

    _, vjp = jax.vjp(f, ro, rd)
    g_ro, g_rd = vjp(
        (
            jnp.where(ok, ct, 0.0),
            jnp.where(ok[..., None], cn, 0.0),
            jnp.where(ok, cu, 0.0),
            jnp.where(ok, cv, 0.0),
        )
    )
    return (g_ro, g_rd, jnp.zeros((), jnp.float32), jnp.zeros(ro.shape[:2], jnp.float32),
            jnp.zeros_like(nodes_f), jnp.zeros_like(tris))


hbm_closest_hit.defvjp(_hbm_fwd, _hbm_bwd)


# ---------------------------------------------------------------------------
# Blocking: (H, W) image wavefront <-> packets of 32x32 pixel blocks
# ---------------------------------------------------------------------------


def blockable(shape) -> bool:
    return len(shape) == 2 and shape[0] % BLOCK == 0 and shape[1] % BLOCK == 0


def _to_blocks(a, h, w):
    """(H, W) -> (H*W/128, 128) with 32x32 pixel blocks contiguous as
    (8, 128) row groups."""
    nr, nc = h // BLOCK, w // BLOCK
    return (
        a.reshape(nr, BLOCK, nc, BLOCK)
        .transpose(0, 2, 1, 3)
        .reshape(nr * nc * 8, 128)
    )


def _from_blocks(a, h, w):
    nr, nc = h // BLOCK, w // BLOCK
    return a.reshape(nr, nc, BLOCK, BLOCK).transpose(0, 2, 1, 3).reshape(h, w)


# ---------------------------------------------------------------------------
# Differentiable wrapper
# ---------------------------------------------------------------------------


def _recompute(ro, rd, rows, tri_ok):
    """Differentiable t/normal/uv for already-selected triangles.

    rows: (..., 32) gathered packed triangle records (constants);
    matches the kernel's in-leaf math exactly.
    """
    p0, p1, p2 = rows[..., 0:3], rows[..., 3:6], rows[..., 6:9]
    e1 = p1 - p0
    e2 = p2 - p0
    pv = jnp.cross(rd, e2)
    det = jnp.sum(e1 * pv, -1)
    inv_det = jnp.where(jnp.abs(det) < 1e-20, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    tv = ro - p0
    u = jnp.sum(tv * pv, -1) * inv_det
    qv = jnp.cross(tv, e1)
    v = jnp.sum(rd * qv, -1) * inv_det
    t = jnp.sum(e2 * qv, -1) * inv_det
    w = 1.0 - u - v
    n = w[..., None] * rows[..., 9:12] + u[..., None] * rows[..., 12:15] + v[..., None] * rows[..., 15:18]
    iu = w * rows[..., 18] + u * rows[..., 20] + v * rows[..., 22]
    iv = w * rows[..., 19] + u * rows[..., 21] + v * rows[..., 23]
    ok = tri_ok
    t = jnp.where(ok, t, _INF)
    return t, jnp.where(ok[..., None], n, 0.0), jnp.where(ok, iu, 0.0), jnp.where(ok, iv, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def packet_closest_hit(ro, rd, cull, act, pack, n_nodes_padded: int, interpret: bool):
    """Closest hit over a clusterized BVH for an (H, W) ray wavefront.

    ro/rd: (H, W, 3) object-space rays (rd unnormalized).  cull: scalar
    int32 (backface-cull flag, traced).  pack: (nodes_f, nodes_i, tris)
    device arrays from `bpt_tpu.accel.cluster.pack_clustered`.

    Returns (t, normal_obj (unnormalized), u_tex, v_tex, tri_reordered_id).
    """
    nodes_f, nodes_i, tris = pack
    h, w = ro.shape[:2]
    rays = jnp.stack(
        [_to_blocks(ro[..., k], h, w) for k in range(3)]
        + [_to_blocks(rd[..., k], h, w) for k in range(3)]
        + [_to_blocks(act, h, w)]
    )
    # cull arrives as f32 (0/1) so every custom-vjp input is float-typed.
    cull2 = jnp.reshape((cull > 0.5).astype(jnp.int32), (1, 1))
    fout, iout = _traverse_call(rays, cull2, nodes_f, nodes_i, tris, n_nodes_padded, interpret)
    t = _from_blocks(fout[0], h, w)
    n = jnp.stack([_from_blocks(fout[1 + k], h, w) for k in range(3)], axis=-1)
    us = _from_blocks(fout[4], h, w)
    vs = _from_blocks(fout[5], h, w)
    tri = _from_blocks(iout, h, w)
    return t, n, us, vs, tri


def _pch_fwd(ro, rd, cull, act, pack, n_nodes_padded, interpret):
    out = packet_closest_hit(ro, rd, cull, act, pack, n_nodes_padded, interpret)
    t, n, us, vs, tri = out
    return out, (ro, rd, pack, tri)


def _zeros_ct(x):
    import numpy as np

    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


def _pch_bwd(n_nodes_padded, interpret, res, cot):
    ro, rd, pack, tri = res
    tris = pack[2]
    ct, cn, cu, cv, _ = cot  # tri-id cotangent is float0, ignored
    ok = tri >= 0
    rows = jnp.take(tris, jnp.maximum(tri, 0), axis=0)

    def f(ro, rd):
        return _recompute(ro, rd, rows, ok)

    _, vjp = jax.vjp(f, ro, rd)
    # Kill cotangents on missed lanes (their primal t is the INF constant).
    g_ro, g_rd = vjp(
        (
            jnp.where(ok, ct, 0.0),
            jnp.where(ok[..., None], cn, 0.0),
            jnp.where(ok, cu, 0.0),
            jnp.where(ok, cv, 0.0),
        )
    )
    # BVH node tables and packed triangle records are non-differentiable
    # data (geometry grads flow through ro/rd, i.e. the model inv-matrix).
    zero_pack = jax.tree_util.tree_map(_zeros_ct, pack)
    return g_ro, g_rd, jnp.zeros((), jnp.float32), jnp.zeros(ro.shape[:2], jnp.float32), zero_pack


packet_closest_hit.defvjp(_pch_fwd, _pch_bwd)
