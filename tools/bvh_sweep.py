"""Leaf-size x packet-shape sweep for the BVH4 staged walk (offline).

Round-5 finding: after the SAH/BVH4 builder cut node visits 4x, the
helmet's staged walk is LEAF-ROW bound (~453 rows/secondary packet at
leaf_size 16, ~0.6 us/row on (8, 256) packets vs ~0.25 us/node step).
Leaf rows are set by which leaves overlap the packet's ray union — the
tree's INTERNAL structure doesn't move them; the leaf GRANULARITY does:
4-tri leaves (one dense row) let the per-child hit masks gate triangle
tests at 1-row granularity instead of 4.

This sweeps leaf_size x packet_lanes over the bvh_stats walker and folds
the counts through a cycle-cost model calibrated on the round-5 TPU
measurements (helmet 512^2, 8-frame pools):
  c_row(w)  = max(100, 680 * w/2048) cycles   (scalar fetch floor 100)
  c_node(w) = max(80, 420 * w/2048)  cycles
Estimated per-bounce walk time = packets * (visits*c_node + rows*c_row).

Usage: python tools/bvh_sweep.py [--model helmet] [--size 128]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bvh_stats import oct_morton_key, walk_bvh4  # noqa: E402


def cost_us(visits, rows, lanes, clock_ghz=0.94):
    c_node = max(80.0, 420.0 * lanes / 2048.0)
    c_row = max(100.0, 680.0 * lanes / 2048.0)
    return (visits * c_node + rows * c_row) / clock_ghz / 1e3


def simulate(pack, size, packet_lanes, sample, seed=0):
    nodes_oct = np.asarray(pack.nodes_oct)
    tris = np.asarray(pack.tris)
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

    def run(ro, rd, act):
        key, octant = oct_morton_key(ro, rd, act)
        order = np.argsort(key, kind="stable")
        ro_s, rd_s, act_s, oct_s = ro[order], rd[order], act[order], octant[order]
        starts = [s for s in range(0, lanes, packet_lanes) if act_s[s:s + packet_lanes].any()]
        pick = starts if len(starts) <= sample else [
            starts[i] for i in np.linspace(0, len(starts) - 1, sample).astype(int)]
        tv = lv = 0
        tb = np.full(lanes, 1e30, np.float32)
        for s in pick:
            sl = slice(s, s + packet_lanes)
            counts = np.bincount(oct_s[sl][act_s[sl]], minlength=8)
            base = int(np.argmax(counts)) * n_nodes
            vis, lr, t = walk_bvh4(nodes_oct, tris, ro_s[sl], rd_s[sl],
                                   act_s[sl], base, n_nodes)
            tv += vis
            lv += lr
            tb[sl] = t
        n = max(len(pick), 1)
        out = np.empty_like(tb)
        out[order] = tb
        return tv / n, lv / n, len(starts), out

    v1, r1, np1, t = run(ro, rd, act)
    hit = t < 1e29
    hp = ro + rd * np.minimum(t, 1e3)[:, None]
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
    v2, r2_, np2, _ = run(ro2, rd2, hit)
    return (v1, r1, np1), (v2, r2_, np2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="helmet")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--sample", type=int, default=6)
    ap.add_argument("--leaves", default="4,8,16")
    ap.add_argument("--packets", default="1024,2048")
    args = ap.parse_args()

    from bpt_tpu.accel.builder import build_bvh_sah, triangle_aabbs
    from bpt_tpu.accel.cluster import pack_bvh4_oct
    from bpt_tpu.io import load_gltf

    presets = {"teapot": ("UtahTeapot.glb", 130.0, True),
               "bunny": ("StanfordBunny.glb", 0.05, True),
               "duck": ("Duck.gltf", 10.0, False),
               "helmet": ("DamagedHelmet.gltf", 15.0, True)}
    name, scale, flip = presets[args.model]
    model = load_gltf(os.path.join("/root/reference/models", name),
                      initial_scale=scale, flip_z=flip)
    mn, mx, _ = triangle_aabbs(model.p0, model.p1, model.p2)
    bvh = build_bvh_sah(mn, mx)
    z3 = np.zeros((len(model.p0), 3), np.float32)
    z2 = np.zeros((len(model.p0), 2), np.float32)
    g = (model.p0, model.p1, model.p2, z3, z3, z3, z2, z2, z2)
    print(f"{args.model}: {len(model.p0)} tris, image {args.size}^2 (sah bvh4)")
    for leaf in [int(x) for x in args.leaves.split(",")]:
        pack = pack_bvh4_oct(bvh, *g, leaf_size=leaf)
        nrec = pack.n_nodes
        for lanes in [int(x) for x in args.packets.split(",")]:
            (v1, r1, n1), (v2, r2, n2) = simulate(pack, args.size, lanes,
                                                  args.sample)
            e1 = cost_us(v1, r1, lanes) * n1
            e2 = cost_us(v2, r2, lanes) * n2
            print(f"  leaf {leaf:3d} ({nrec:5d} recs) x {lanes:4d} lanes: "
                  f"prim {v1:6.1f}v {r1:6.1f}r (est {e1 / 1e3:6.2f} ms/img)  "
                  f"sec {v2:6.1f}v {r2:6.1f}r (est {e2 / 1e3:6.2f} ms/img)")


if __name__ == "__main__":
    main()
