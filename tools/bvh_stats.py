"""Packet-walk visit-count simulator: measure BVH quality offline.

Replays the fused megakernel's escape-linked packet walk
(bpt_tpu.kernels.megakernel._mesh_walk) in numpy over primary and sorted
secondary packets and counts node visits + leaf rows per packet — the two
quantities that set the walk's wall clock on TPU (~20 ns/node step,
~100 ns/leaf row on (8, 256) packets; see README ceiling note).  Used to
compare builders (spatial median vs binned SAH) and layouts (binary escape
walk vs BVH4 inlined-leaf records) without a TPU in the loop.

Usage: python tools/bvh_stats.py [--model helmet] [--size 128] [--sample 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mt_rows(recs, ro, rd, t_best):
    """Vectorized Moller-Trumbore of packed records (R, 32) against the
    packet; returns updated t_best."""
    p0 = recs[:, None, 0:3]
    e1 = recs[:, None, 3:6] - p0
    e2 = recs[:, None, 6:9] - p0
    pv = np.cross(rd[None], e2)
    det = (e1 * pv).sum(-1)
    invd = np.where(np.abs(det) < 1e-20, 1e20, 1.0 / np.where(det == 0, 1, det))
    tv = ro[None] - p0
    u = (tv * pv).sum(-1) * invd
    qv = np.cross(tv, e1)
    v = (rd[None] * qv).sum(-1) * invd
    t = (e2 * qv).sum(-1) * invd
    ok = (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 0)
    t = np.where(ok, t, 1e30).min(axis=0)
    return np.minimum(t_best, t)


def walk_binary(nodes_f, tris, ro, rd, active, base, n_nodes):
    """Binary escape-linked walk ((Np,16) records); returns
    (node_visits, leaf_rows, t_best)."""
    inv = np.where(np.abs(rd) < 1e-20, 1e20, 1.0 / np.where(rd == 0, 1.0, rd))
    t_best = np.full(ro.shape[0], 1e30, np.float32)
    visits = leaf_rows = 0
    i = 0
    while i < n_nodes:
        nf = nodes_f[base + i]
        visits += 1
        t0 = (nf[0:3] - ro) * inv
        t1 = (nf[3:6] - ro) * inv
        tmin = np.minimum(t0, t1).max(axis=1)
        tmax = np.maximum(t0, t1).min(axis=1)
        hit = (np.maximum(tmin, 0.0) <= tmax) & (tmin < t_best) & active
        any_hit = hit.any()
        esc, row0, nrows = int(nf[6]), int(nf[7]), int(nf[8])
        if any_hit and nrows > 0:
            leaf_rows += nrows
            t_best = _mt_rows(tris[row0:row0 + nrows].reshape(-1, 32), ro, rd, t_best)
        i = i + 1 if (any_hit and nrows == 0) else esc
    return visits, leaf_rows, t_best


def walk_bvh4(nodes_f, tris, ro, rd, active, base, n_nodes):
    """BVH4 inlined-leaf walk ((Np4,32) records, accel.cluster.Bvh4OctBVH)."""
    inv = np.where(np.abs(rd) < 1e-20, 1e20, 1.0 / np.where(rd == 0, 1.0, rd))
    t_best = np.full(ro.shape[0], 1e30, np.float32)
    visits = leaf_rows = 0
    i = 0
    with np.errstate(over="ignore", invalid="ignore"):
        while i < n_nodes:
            r = nodes_f[base + i]
            visits += 1
            ms = []
            for k in range(4):
                o = 6 * k
                t0 = (r[o:o + 3] - ro) * inv
                t1 = (r[o + 3:o + 6] - ro) * inv
                tmin = np.minimum(t0, t1).max(1)
                tmax = np.maximum(t0, t1).min(1)
                ms.append(bool(((np.maximum(tmin, 0) <= tmax) & (tmin < t_best) & active).any()))
            esc = int(r[28])
            for k in range(4):
                m = r[24 + k]
                if ms[k] and m < 0:
                    # meta in WOOP-row units (8 tris/row); count DENSE rows
                    # (2x) so numbers stay comparable across formats
                    enc = int(-m)
                    row0, nr = 2 * (enc // 32), 2 * (enc % 32)
                    leaf_rows += nr
                    t_best = _mt_rows(tris[row0:row0 + nr].reshape(-1, 32), ro, rd, t_best)
            nxt = esc
            for k in (3, 2, 1, 0):
                if ms[k] and r[24 + k] > 0:
                    nxt = int(r[24 + k])
            i = nxt
    return visits, leaf_rows, t_best


def oct_morton_key(ro, rd, alive):
    big = 1e9
    qs = []
    for a in range(3):
        v = ro[:, a]
        lo = np.min(np.where(alive, v, big))
        hi = np.max(np.where(alive, v, -big))
        qs.append(np.clip((v - lo) / max(hi - lo, 1e-6) * 64.0, 0, 63).astype(np.int64))

    def spread(x):
        out = x & 1
        for k in range(1, 6):
            out = out | (((x >> k) & 1) << (3 * k))
        return out

    morton = (spread(qs[0]) << 2) | (spread(qs[1]) << 1) | spread(qs[2])
    octant = ((rd[:, 0] > 0).astype(np.int64) << 2) | ((rd[:, 1] > 0).astype(np.int64) << 1) | (rd[:, 2] > 0).astype(np.int64)
    key = (octant << 18) | morton
    return np.where(alive, key, np.int64(1) << 30), octant


def simulate(pack, size, packet_lanes, label, sample=8, seed=0):
    nodes_pre = np.asarray(pack.nodes_f)
    nodes_oct = np.asarray(pack.nodes_oct)
    tris = np.asarray(pack.tris)
    walker = walk_bvh4 if nodes_pre.shape[1] == 32 else walk_binary
    n_nodes = pack.n_nodes

    cam_pos = np.array([0.0, -15.0, 60.0], np.float32)
    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    u = ((xs + 0.5) / size * 2 - 1) * 0.45
    v = ((ys + 0.5) / size * 2 - 1) * 0.45
    rd = np.stack([u, v - 0.15, -np.ones_like(u)], -1).reshape(-1, 3).astype(np.float32)
    ro = np.broadcast_to(cam_pos, rd.shape).astype(np.float32).copy()
    lanes = ro.shape[0]
    act = np.ones(lanes, bool)
    rng = np.random.default_rng(seed)

    def run(ro, rd, act, phase):
        key, octant = oct_morton_key(ro, rd, act)
        order = np.argsort(key, kind="stable")
        ro_s, rd_s, act_s, oct_s = ro[order], rd[order], act[order], octant[order]
        starts = [s for s in range(0, lanes, packet_lanes) if act_s[s:s + packet_lanes].any()]
        pick = starts if len(starts) <= sample else [
            starts[i] for i in np.linspace(0, len(starts) - 1, sample).astype(int)]
        tv = lv = 0
        tb = np.full(lanes, 1e30, np.float32)
        for s in range(0, lanes, packet_lanes):
            sl = slice(s, s + packet_lanes)
            if s in pick:
                counts = np.bincount(oct_s[sl][act_s[sl]], minlength=8)
                base = int(np.argmax(counts)) * n_nodes
                vis, lr, t = walker(nodes_oct, tris, ro_s[sl], rd_s[sl], act_s[sl],
                                    base, n_nodes)
                tv += vis
                lv += lr
                tb[sl] = t
            elif act_s[sl].any():
                # cheap non-counted pass so later phases still have hits
                tb[sl] = 1e30
        print(f"  {label} {phase}: {tv / max(len(pick), 1):8.1f} node visits, "
              f"{lv / max(len(pick), 1):8.1f} leaf rows per {packet_lanes}-lane "
              f"packet (sampled {len(pick)}/{len(starts)})")
        out = np.empty_like(tb)
        out[order] = tb
        return out, order

    t, _ = run(ro, rd, act, "primary ")
    hit = t < 1e29
    if not hit.any():
        print("  (no primary hits; skipping secondary)")
        return
    hp = ro + rd * np.minimum(t, 1e3)[:, None]
    nrm = -rd / np.linalg.norm(rd, axis=1, keepdims=True)
    r1, r2 = rng.random(lanes), rng.random(lanes)
    phi = 2 * np.pi * r1
    st, ct = np.sqrt(r2), np.sqrt(1 - r2)
    up = np.where(np.abs(nrm[:, 1:2]) < 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
    tx = np.cross(up, nrm)
    tx /= np.linalg.norm(tx, axis=1, keepdims=True)
    ty = np.cross(nrm, tx)
    rd2 = (np.cos(phi)[:, None] * st[:, None] * tx
           + np.sin(phi)[:, None] * st[:, None] * ty + ct[:, None] * nrm).astype(np.float32)
    ro2 = (hp + 1e-3 * nrm).astype(np.float32)
    run(ro2, rd2, hit, "secondary")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="helmet")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--packet", type=int, default=2048)
    ap.add_argument("--leaf", type=int, default=16)
    ap.add_argument("--sample", type=int, default=8)
    args = ap.parse_args()

    from bpt_tpu.accel.builder import build_bvh, build_bvh_sah, triangle_aabbs
    from bpt_tpu.accel.cluster import pack_bvh4_oct, pack_clustered_dense_oct
    from bpt_tpu.io import load_gltf

    presets = {"teapot": ("UtahTeapot.glb", 130.0, True),
               "bunny": ("StanfordBunny.glb", 0.05, True),
               "duck": ("Duck.gltf", 10.0, False),
               "helmet": ("DamagedHelmet.gltf", 15.0, True)}
    name, scale, flip = presets[args.model]
    model = load_gltf(os.path.join("/root/reference/models", name),
                      initial_scale=scale, flip_z=flip)
    mn, mx, _ = triangle_aabbs(model.p0, model.p1, model.p2)
    print(f"{args.model}: {len(model.p0)} tris, image {args.size}^2, "
          f"packets of {args.packet} lanes, leaf_size {args.leaf}")

    z3 = np.zeros((len(model.p0), 3), np.float32)
    z2 = np.zeros((len(model.p0), 2), np.float32)
    g = (model.p0, model.p1, model.p2, z3, z3, z3, z2, z2, z2)

    bvh_med = build_bvh(mn, mx)
    bvh_sah = build_bvh_sah(mn, mx)
    for label, pack in (
        ("median binary", pack_clustered_dense_oct(bvh_med, *g, leaf_size=args.leaf)),
        ("sah    binary", pack_clustered_dense_oct(bvh_sah, *g, leaf_size=args.leaf)),
        ("median bvh4  ", pack_bvh4_oct(bvh_med, *g, leaf_size=args.leaf)),
        ("sah    bvh4  ", pack_bvh4_oct(bvh_sah, *g, leaf_size=args.leaf)),
    ):
        simulate(pack, args.size, args.packet, label, sample=args.sample)


if __name__ == "__main__":
    main()
