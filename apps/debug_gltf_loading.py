"""Debug demo 6 — multi-mesh / multi-material glTF loading harness.

Reference page: /root/reference/Debugging_GLTF_Loading.html — a clone of the
glTF demo instrumented for the 150-mesh multi-material `testBookCase.gltf`:
it dumps one mesh's material internals to the console and force-applies that
material's albedo texture to the whole merged model
(Debugging_GLTF_Loading.js:227-255), starts the model at translate Z=22, and
exercises the missing-UV fallback.  Here the console dump is
`describe_gltf()`, the forced albedo is `load_gltf(material_index=...)`, and
everything else is the standard progressive render.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apps.common import base_parser, maybe_force_cpu, run_and_save

PRESETS = {
    # name: (path, initial_scale, flip_z/RH->LH) — the debug page's picker
    # (Debugging_GLTF_Loading.js:198-199 fixtures + the glTF demo presets).
    "bookcase": ("testBookCase.gltf", 1.0, True),
    "twoparts": ("twoParts-opaque.gltf", 10.0, True),
    "teapot": ("UtahTeapot.glb", 130.0, True),
}


def main():
    p = base_parser("glTF loading debug harness (multi-mesh/multi-material)")
    p.add_argument("--model", choices=sorted(PRESETS), default="bookcase")
    p.add_argument("--models-dir", default="/root/reference/models")
    p.add_argument("--material-index", type=int, default=None,
                   help="force-share this material's texture set across the "
                        "whole merged model (reference uses mesh[3]'s)")
    p.add_argument("--translate-z", type=float, default=22.0,
                   help="model translate Z (reference debug default: 22)")
    p.add_argument("--mat", type=int, default=1, help="material when untextured")
    p.add_argument("--dump-only", action="store_true",
                   help="print the asset introspection and exit (no render)")
    args = p.parse_args()
    maybe_force_cpu(args)

    from bpt_tpu.io import describe_gltf, load_gltf

    path = os.path.join(args.models_dir, PRESETS[args.model][0])
    info = describe_gltf(path)
    print(f"{path}: {len(info['meshes'])} meshes, {len(info['materials'])} "
          f"materials, {info['nodes']} nodes, images={info['images']}")
    for i, mat in enumerate(info["materials"]):
        print(f"  material[{i}] {mat['name']}: baseColorTex={mat['baseColorTexture']} "
              f"factor={mat['baseColorFactor']} metal={mat['metallicFactor']} "
              f"rough={mat['roughnessFactor']} doubleSided={mat['doubleSided']}")
    for i, mesh in enumerate(info["meshes"][:8]):
        print(f"  mesh[{i}] {mesh['name']}: {mesh['primitives']}")
    if len(info["meshes"]) > 8:
        print(f"  ... {len(info['meshes']) - 8} more meshes")
    if args.dump_only:
        return

    from bpt_tpu.integrator import IntegratorConfig
    from bpt_tpu.renderer import ProgressiveRenderer
    from bpt_tpu.scenes.gltf_scene import gltf_camera, gltf_scene, mesh_from_model

    name, scale, flip = PRESETS[args.model]
    model = load_gltf(path, initial_scale=scale, flip_z=flip,
                      material_index=args.material_index)
    missing_uv = bool((model.uv0 < 0).all()) if model.uv0.size else True
    print(f"{args.model}: {model.triangle_count} triangles, "
          f"textured={model.albedo is not None}, missing_uv={missing_uv}")
    mesh = mesh_from_model(model, mat_type=args.mat,
                           translation=(0.0, 0.0, args.translate_z))
    scene = gltf_scene(mesh)
    cfg = IntegratorConfig(bounces=args.bounces,
                           metal_roughness_lobe=model.albedo is not None)
    r = ProgressiveRenderer(scene, cfg, args.size, args.size)
    run_and_save(r, gltf_camera(), args, f"debug_gltf_{args.model}")


if __name__ == "__main__":
    main()
