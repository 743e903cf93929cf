"""Decompose the helmet staged dispatch cost on the real TPU.

Variants isolate: walk+shade (bounce slope), sort/phase-boundary overhead
(splits on/off), composition tail, and monolithic-vs-staged.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bpt_tpu.core.rng import blue_noise_table
from bpt_tpu.integrator import IntegratorConfig
from bpt_tpu.io import load_gltf
from bpt_tpu.kernels.megakernel import (_all_parallelograms,
                                        trace_frames_pallas,
                                        trace_image_pallas)
from bpt_tpu.scenes.gltf_scene import gltf_camera, gltf_scene, mesh_from_model


def timed(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.1f} ms")
    return dt


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--leaf-size", type=int, default=16)
    ap.add_argument("--model", default="helmet")
    args = ap.parse_args()

    presets = {"teapot": ("UtahTeapot.glb", 130.0, True),
               "duck": ("Duck.gltf", 10.0, False),
               "helmet": ("DamagedHelmet.gltf", 15.0, True)}
    name, scale, flip = presets[args.model]
    model = load_gltf(f"/root/reference/models/{name}",
                      initial_scale=scale, flip_z=flip)
    mesh = mesh_from_model(model, mat_type=3, leaf_size=args.leaf_size)
    scene = gltf_scene(mesh)
    cam = gltf_camera()
    h = w = args.size
    F = args.frames
    bn = jnp.asarray(blue_noise_table())
    rv = jnp.tile(jnp.asarray([0.3, 0.7], jnp.float32), (F, 1))
    fq = _all_parallelograms(scene.quads)
    fcs = 2.0 + jnp.arange(0.0, F)

    def run(s, bounces, splits, sub_rows=None, tile_rows=32):
        cfg = IntegratorConfig(bounces=bounces,
                               metal_roughness_lobe=model.albedo is not None)
        r = trace_frames_pallas(
            s, cam, cfg, w, h, fcs, rv, bn, tile_rows=tile_rows,
            fast_quads=fq, reorder_splits=splits, mesh_sub_rows=sub_rows)
        return r.color

    rays = F * h * w
    for bounces in (1, 2, 4):
        dt = timed(f"staged b={bounces} full splits",
                   jax.jit(lambda s, b=bounces: run(s, b, tuple(range(1, b)))),
                   scene)
        print(f"    -> {rays * bounces / dt / 1e6:8.1f} Mrays/s")
    dt = timed("staged b=4 NO reorder (splits=())",
               jax.jit(lambda s: run(s, 4, ())), scene)
    print(f"    -> {rays * 4 / dt / 1e6:8.1f} Mrays/s")
    dt = timed("staged b=4 sub_rows=16",
               jax.jit(lambda s: run(s, 4, (1, 2, 3), sub_rows=16)), scene)
    print(f"    -> {rays * 4 / dt / 1e6:8.1f} Mrays/s")
    dt = timed("staged b=4 splits=(1,)",
               jax.jit(lambda s: run(s, 4, (1,), sub_rows=16)), scene)
    print(f"    -> {rays * 4 / dt / 1e6:8.1f} Mrays/s")
    dt = timed("staged b=4 splits=(1,2)",
               jax.jit(lambda s: run(s, 4, (1, 2), sub_rows=16)), scene)
    print(f"    -> {rays * 4 / dt / 1e6:8.1f} Mrays/s")

    # monolithic per-frame scan for contrast
    cfg4 = IntegratorConfig(bounces=4,
                            metal_roughness_lobe=model.albedo is not None)

    def mono(s):
        def body(acc, fc):
            r = trace_image_pallas(s, cam, cfg4, w, h, fc, jnp.asarray([0.3, 0.7]),
                                   bn, fast_quads=fq)
            return acc + r.color, None

        out, _ = jax.lax.scan(body, jnp.zeros((h, w, 3)), fcs)
        return out

    dt = timed("monolithic scan b=4", jax.jit(mono), scene)
    print(f"    -> {rays * 4 / dt / 1e6:8.1f} Mrays/s")


if __name__ == "__main__":
    main()
