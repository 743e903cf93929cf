"""BVH build (host) and traversal (device).

The reference builds its BVH on the CPU in JS (js/BVH_Fast_Builder.js) and
walks it in the fragment shader with a 28-deep per-pixel stack
(js/GLTFModelPathTracing_FragmentShader.js:95, 206-298).  Here: a numpy
builder with the same flat-layout invariants (left child = parent index + 1,
right child stored in the node; leaves hold one triangle) and a vectorized
masked traversal that runs one node per live lane per `while_loop` step.
"""

from bpt_tpu.accel.builder import build_bvh, BuiltBVH

# bpt_tpu.accel.traverse is imported lazily (by bpt_tpu.integrator.intersect)
# to break the scenes -> accel -> integrator import cycle.
