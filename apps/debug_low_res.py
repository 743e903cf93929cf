"""Debug demo 7 — low-resolution / driver-robustness harness.

Reference page: /root/reference/Debugging_RTX_3090.html — a clone of the
glTF demo used to reproduce a GPU-driver bug at extreme hardware scaling:
`pixel_Resolution: 0.1` (Debugging_RTX_3090.js:552,668), 'test BookCase' in
the model picker (:937-941), and the mobile intersection epsilon
`uEPS_intersect = 1.0` (:726).  Here pixel resolution is an internal render
scale (the traced image is `size * pixel_resolution`, then nearest-upscaled
for output, exactly what WebGL hardware scaling does), and the epsilon is an
IntegratorConfig knob.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from apps.common import base_parser, maybe_force_cpu, run_and_save

PRESETS = {
    "teapot": ("UtahTeapot.glb", 130.0, True),
    "bunny": ("StanfordBunny.glb", 0.05, True),
    "bookcase": ("testBookCase.gltf", 1.0, True),
}


def main():
    p = base_parser("low-resolution debug harness (pixel_Resolution 0.1)")
    p.add_argument("--model", choices=sorted(PRESETS), default="teapot")
    p.add_argument("--models-dir", default="/root/reference/models")
    p.add_argument("--pixel-resolution", type=float, default=0.1,
                   help="internal render scale (reference debug default 0.1)")
    p.add_argument("--mobile", action="store_true",
                   help="mobile fallback: uEPS_intersect = 1.0")
    p.add_argument("--mat", type=int, default=3)
    args = p.parse_args()
    maybe_force_cpu(args)

    from bpt_tpu.integrator import IntegratorConfig
    from bpt_tpu.io import load_gltf
    from bpt_tpu.renderer import ProgressiveRenderer
    from bpt_tpu.scenes.gltf_scene import gltf_camera, gltf_scene, mesh_from_model

    name, scale, flip = PRESETS[args.model]
    model = load_gltf(os.path.join(args.models_dir, name), initial_scale=scale,
                      flip_z=flip)
    mesh = mesh_from_model(model, mat_type=args.mat)
    scene = gltf_scene(mesh)

    out_size = args.size
    # Round to a multiple of 8: the image pipeline tiles rows in groups of 8
    # (VPU sublane width), like the reference rounding the scaled backbuffer.
    render_size = max(8, int(round(out_size * args.pixel_resolution / 8)) * 8)
    print(f"{args.model}: {model.triangle_count} triangles; rendering "
          f"{render_size}x{render_size} (pixel_resolution={args.pixel_resolution}), "
          f"output {out_size}x{out_size}")
    cfg = IntegratorConfig(
        bounces=args.bounces,
        eps_intersect=1.0 if args.mobile else 0.01,
        metal_roughness_lobe=model.albedo is not None,
    )
    r = ProgressiveRenderer(scene, cfg, render_size, render_size)
    args.size = render_size  # ray accounting at the traced size
    img = run_and_save(r, gltf_camera(), args, f"debug_lowres_{args.model}")

    # Nearest-neighbor upscale to the requested canvas, like WebGL hardware
    # scaling stretching the low-res backbuffer to the full canvas.
    rep = out_size // img.shape[0]
    if rep > 1 and args.out is None:
        up = np.repeat(np.repeat(img, rep, axis=0), rep, axis=1)
        try:
            from PIL import Image

            path = f"/tmp/debug_lowres_{args.model}_upscaled.png"
            Image.fromarray((np.flipud(up) * 255).astype(np.uint8)).save(path)
            print(f"wrote {path}")
        except ImportError:
            pass


if __name__ == "__main__":
    main()
