"""Sort-key sweep: how much do finer DIRECTION bins cut leaf rows?

The staged sorter's 'oct-morton' key gives direction only 3 bits (octant);
within an octant a secondary packet's cosine-hemisphere directions span a
90-degree cone, so its frustum union covers a large mesh fraction — the
measured leaf-row floor.  This sweeps direction bits (3 = octant, 6, 9)
ahead of the origin Morton and simulates rows/visits per packet at a
given pool scale.

Usage: python tools/key_sweep.py [--size 256] [--leaf 4] [--packet 2048]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bvh_stats import walk_bvh4  # noqa: E402


def key_dir_morton(ro, rd, alive, dir_bits):
    """(direction bin << 18) | 18-bit origin Morton, dead lanes last.
    dir_bits: 3 = sign octant; 6/9 add 1/2 extra magnitude bits per axis
    (hierarchical: sign first, then |component| quantized)."""
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
    dkey = octant
    extra = (dir_bits - 3) // 3
    if extra > 0:
        scale = float(1 << extra)
        for a in range(3):
            q = np.clip(np.abs(rd[:, a]) * scale, 0, scale - 1).astype(np.int64)
            dkey = (dkey << extra) | q
    key = (dkey << 18) | morton
    return np.where(alive, key, np.int64(1) << 40), octant


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="helmet")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--leaf", type=int, default=4)
    ap.add_argument("--packet", type=int, default=2048)
    ap.add_argument("--sample", type=int, default=8)
    args = ap.parse_args()

    from bpt_tpu.accel.builder import build_bvh_sah, triangle_aabbs
    from bpt_tpu.accel.cluster import pack_bvh4_oct
    from bpt_tpu.io import load_gltf

    presets = {"teapot": ("UtahTeapot.glb", 130.0, True),
               "duck": ("Duck.gltf", 10.0, False),
               "helmet": ("DamagedHelmet.gltf", 15.0, True)}
    name, scale, flip = presets[args.model]
    model = load_gltf(os.path.join("/root/reference/models", name),
                      initial_scale=scale, flip_z=flip)
    mn, mx, _ = triangle_aabbs(model.p0, model.p1, model.p2)
    bvh = build_bvh_sah(mn, mx)
    z3 = np.zeros((len(model.p0), 3), np.float32)
    z2 = np.zeros((len(model.p0), 2), np.float32)
    pack = pack_bvh4_oct(bvh, model.p0, model.p1, model.p2, z3, z3, z3,
                         z2, z2, z2, leaf_size=args.leaf)
    nodes_oct = np.asarray(pack.nodes_oct)
    tris = np.asarray(pack.tris)
    n_nodes = pack.n_nodes

    size = args.size
    cam_pos = np.array([0.0, -15.0, 60.0], np.float32)
    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    u = ((xs + 0.5) / size * 2 - 1) * 0.45
    v = ((ys + 0.5) / size * 2 - 1) * 0.45
    rd = np.stack([u, v - 0.15, -np.ones_like(u)], -1).reshape(-1, 3).astype(np.float32)
    ro = np.broadcast_to(cam_pos, rd.shape).astype(np.float32).copy()
    lanes = ro.shape[0]
    rng = np.random.default_rng(0)

    # primary hit points (uncounted) -> secondary cosine rays
    key, octant = key_dir_morton(ro, rd, np.ones(lanes, bool), 3)
    order = np.argsort(key, kind="stable")
    tb = np.full(lanes, 1e30, np.float32)
    for s in range(0, lanes, args.packet):
        sl = order[s:s + args.packet]
        counts = np.bincount(octant[sl], minlength=8)
        base = int(np.argmax(counts)) * n_nodes
        _, _, t = walk_bvh4(nodes_oct, tris, ro[sl], rd[sl],
                            np.ones(len(sl), bool), base, n_nodes)
        tb[sl] = t
    hit = tb < 1e29
    hp = ro + rd * np.minimum(tb, 1e3)[:, None]
    nrm = -rd / np.linalg.norm(rd, axis=1, keepdims=True)
    a1, a2 = rng.random(lanes), rng.random(lanes)
    phi = 2 * np.pi * a1
    st, ct = np.sqrt(a2), np.sqrt(1 - a2)
    up = np.where(np.abs(nrm[:, 1:2]) < 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
    tx = np.cross(up, nrm)
    tx /= np.linalg.norm(tx, axis=1, keepdims=True)
    ty = np.cross(nrm, tx)
    rd2 = (np.cos(phi)[:, None] * st[:, None] * tx
           + np.sin(phi)[:, None] * st[:, None] * ty + ct[:, None] * nrm).astype(np.float32)
    ro2 = (hp + 1e-3 * nrm).astype(np.float32)

    print(f"{args.model}: {len(model.p0)} tris, pool {lanes} lanes "
          f"({size}^2), leaf {args.leaf}, packets of {args.packet}")
    for bits in (3, 6, 9):
        key, octant = key_dir_morton(ro2, rd2, hit, bits)
        order = np.argsort(key, kind="stable")
        starts = [s for s in range(0, lanes, args.packet)
                  if hit[order[s:s + args.packet]].any()]
        pick = starts if len(starts) <= args.sample else [
            starts[i] for i in np.linspace(0, len(starts) - 1,
                                           args.sample).astype(int)]
        tv = lv = 0
        for s in pick:
            sl = order[s:s + args.packet]
            act = hit[sl]
            counts = np.bincount(octant[sl][act], minlength=8)
            base = int(np.argmax(counts)) * n_nodes
            vis, lr, _ = walk_bvh4(nodes_oct, tris, ro2[sl], rd2[sl], act,
                                   base, n_nodes)
            tv += vis
            lv += lr
        n = max(len(pick), 1)
        print(f"  dir_bits {bits}: sec {tv / n:7.1f} visits {lv / n:7.1f} rows "
              f"per packet ({len(starts)} live packets)")


if __name__ == "__main__":
    main()
