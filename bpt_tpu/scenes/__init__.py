"""Scene data structures and demo scene builders.

Each builder is the functional analog of one demo's `SetupScene()` GLSL
function plus its host-side setup JS.  Scenes are pytrees of device arrays
(SoA) — the key idiomatic inversion from the reference, which rebuilds the
scene *in registers for every pixel every frame*
(e.g. /root/reference/js/BabylonPathTracing_FragmentShader.js:348-378);
here the scene is data passed to the integrator, which is also what makes
every scene parameter differentiable.
"""

from bpt_tpu.scenes.types import (
    LIGHT,
    DIFFUSE,
    TRANSPARENT,
    METAL,
    CLEARCOAT_DIFFUSE,
    PBR_MATERIAL,
    Quads,
    UnitSpheres,
    Quadrics,
    TriangleMesh,
    Environment,
    ENV_NONE,
    ENV_SKY,
    ENV_HDRI,
    Scene,
)
from bpt_tpu.scenes.cornell import cornell_scene
from bpt_tpu.scenes.quadric_geometry import quadric_geometry_scene
from bpt_tpu.scenes.sky_scene import physical_sky_scene
from bpt_tpu.scenes.gltf_scene import gltf_scene, hdri_scene
