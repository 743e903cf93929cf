"""Asset IO: minimal glTF 2.0 / .glb reader and Radiance .hdr reader.

Functional analogs of the reference's vendored babylon.glTFFileLoader +
loadModel()/Prepare_Model_For_PathTracing() pipeline
(/root/reference/js/GLTF_Model_Path_Tracing.js:201-497) and its HDR texture
load + brightest-texel sun scan (/root/reference/js/HDRI_Environment_Path_Tracing.js:764-827).
"""

from bpt_tpu.io.gltf import describe_gltf, load_gltf, GLTFModel
from bpt_tpu.io.hdr import read_hdr
