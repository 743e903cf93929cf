"""Fused-vs-wavefront fidelity on a named glTF asset (TPU or CPU).

Measures the README's fidelity number: % of pixels whose fused-megakernel
color differs from the wavefront reference by > 1e-3 (and the mean |delta|),
single frame, fixed draws — isolating the fused approximations (per-triangle
decision bake + per-vertex normal-map bake) since both paths consume
identical RNG.

--split-normals N enables the normal-variance subdivision
(scenes.gltf_scene.split_normal_variance_triangles) that attacks the
dominant residual term.

Usage: python tools/fidelity.py [--model helmet] [--size 256]
       [--split-normals 3] [--deg 10] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="helmet")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--split-normals", type=int, default=0)
    ap.add_argument("--deg", type=float, default=10.0)
    ap.add_argument("--split-mixed", type=int, default=0)
    ap.add_argument("--no-woop", action="store_true",
                    help="fused walk uses the in-row MT tester (isolates "
                         "Woop-vs-MT FP-tie scatter from bake error)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from bpt_tpu.core.rng import blue_noise_table
    from bpt_tpu.integrator import IntegratorConfig
    from bpt_tpu.integrator.frame import trace_image
    from bpt_tpu.io import load_gltf
    from bpt_tpu.kernels.megakernel import trace_image_pallas
    from bpt_tpu.scenes.gltf_scene import gltf_camera, gltf_scene, mesh_from_model

    presets = {"teapot": ("UtahTeapot.glb", 130.0, True),
               "duck": ("Duck.gltf", 10.0, False),
               "helmet": ("DamagedHelmet.gltf", 15.0, True)}
    name, scale, flip = presets[args.model]
    model = load_gltf(os.path.join("/root/reference/models", name),
                      initial_scale=scale, flip_z=flip)
    mesh = mesh_from_model(model, mat_type=3, split_mixed=args.split_mixed,
                           split_normals=args.split_normals,
                           split_normals_deg=args.deg)
    if args.no_woop:
        mesh = mesh._replace(fz_woop=None)
    T = int(mesh.p0.shape[0])
    scene = gltf_scene(mesh)
    cfg = IntegratorConfig(bounces=args.bounces,
                           metal_roughness_lobe=model.albedo is not None)
    cam = gltf_camera()
    h = w = args.size
    bn = jnp.asarray(blue_noise_table())
    rv = jnp.asarray([0.3, 0.7], jnp.float32)

    # oracle: the pure-XLA wavefront walk (drop the packet packs — the
    # packet kernel's VMEM tables don't scale to split meshes, and the
    # XLA walk is the most conservative reference)
    scene_ref = scene._replace(mesh=mesh._replace(
        pk_nodes_f=None, pk_nodes_i=None, pk_tris=None, pk_order=None))
    ref = jax.jit(lambda s: trace_image(
        s, cam, cfg, w, h, 2.0, rv, bn).color)(scene_ref)
    fused = jax.jit(lambda s: trace_image_pallas(
        s, cam, cfg, w, h, 2.0, rv, bn, interpret=args.cpu).color)(scene)
    d = np.abs(np.asarray(fused) - np.asarray(ref)).max(axis=-1)
    pct = 100.0 * (d > 1e-3).mean()
    # decompose: small smooth deltas (approximation/bake error) vs large
    # deltas (an FP tie flipped the whole path — a different MC sample,
    # not a bias; both estimators are unbiased)
    smooth = 100.0 * ((d > 1e-3) & (d <= 0.05)).mean()
    flips = 100.0 * (d > 0.05).mean()
    print(f"{args.model} {h}x{w} b={args.bounces} tris={T} "
          f"(split_normals={args.split_normals}@{args.deg}deg, "
          f"split_mixed={args.split_mixed}): "
          f"{pct:.2f}% pixels >1e-3 "
          f"[{smooth:.2f}% bake-scale <=0.05, {flips:.2f}% path flips], "
          f"mean |d| {d.mean():.5f}, max {d.max():.4f}")


if __name__ == "__main__":
    main()
