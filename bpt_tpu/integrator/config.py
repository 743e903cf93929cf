"""Static (compile-time) integrator configuration.

Each reference demo is one setting of these knobs; they select code paths at
trace time (Python-level branching), so XLA compiles exactly the demo's
megakernel — the analog of each demo shipping its own composed GLSL program.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    #: Max path length; the reference uses 6 everywhere
    #: (BabylonPathTracing_FragmentShader.js:151).
    bounces: int = 6
    #: Surface-offset epsilon, scene-size dependent (uEPS_intersect,
    #: Babylon_Path_Tracing.js:247).
    eps_intersect: float = 0.01
    #: Environment on ray miss: "none" (Cornell/quadrics), "sky" (Preetham),
    #: "hdri" (equirect map).
    env: str = "none"
    #: Next-event-estimation target: "quad" (area light), "sun" (sky/HDRI
    #: reference semantics), or "env" (HDRI importance sampling via the
    #: luminance CDF — BASELINE mandate; no reference analog, wavefront-only).
    nee: str = "quad"
    #: Which quad in scene.quads is the light (reference: quads[5]); -1 = last.
    light_index: int = -1
    #: METAL bounce uses the roughness specular lobe instead of a perfect
    #: mirror (glTF demos, GLTFModelPathTracing_FragmentShader.js:496).
    metal_roughness_lobe: bool = False
    #: TRANSPARENT transmission tints by hitColor instead of Beer-Lambert
    #: (quadric demo variant, TransformedQuadricGeometry_FragmentShader.js:470).
    transparent_tint: bool = False
    #: Sun NEE lobe roughness: 0.1 (sky demo) or 0.03 (HDRI demo).
    sun_lobe_roughness: float = 0.1
    #: Sun NEE weight: "sky" = cos * 0.05; "hdri" = cos * sunPower^2 * 1e-7.
    sun_weight_mode: str = "sky"
    #: Diffuse 50/50 indirect-bounce gate: allow the cosine bounce while
    #: diffuseCount <= this (1 for Cornell/sky, 2 for HDRI,
    #: HDRIEnvironmentPathTracing_FragmentShader.js:502).
    diffuse_indirect_max: int = 1
    #: Mirrors uCameraIsMoving inside TRANSPARENT's sharpness logic
    #: (BabylonPathTracing_FragmentShader.js:240).
    camera_is_moving: bool = False
