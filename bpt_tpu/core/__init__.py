"""Core math, RNG and sampling utilities shared by every scene integrator.

Functional analogs of the reference's shared GLSL include library
(`/root/reference/js/PathTracingCommon.js`): vector helpers, the iq uvec2-hash
RNG and blue-noise decision stream, ONB construction, cosine/specular-lobe
sampling, the tent reconstruction filter and exact dielectric Fresnel.
"""

from bpt_tpu.core.vecmath import (
    dot,
    cross,
    normalize,
    length,
    reflect,
    refract,
    transform_point,
    transform_dir,
    normal_to_world,
    orthonormal_basis,
    face_forward,
    smoothstep,
    mix,
    INFINITY,
)
from bpt_tpu.core.rng import (
    RngState,
    rng_seed,
    rng_next,
    rng_next2,
    blue_noise_table,
    blue_noise_fetch,
    bn_next,
    BlueNoise,
)
from bpt_tpu.core.sampling import (
    random_sphere_direction,
    random_cos_weighted_hemisphere,
    random_direction_in_specular_lobe,
    tent_filter,
)
from bpt_tpu.core.fresnel import calc_fresnel_reflectance
