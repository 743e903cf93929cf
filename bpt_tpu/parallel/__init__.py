"""Device-mesh sharding: tile-sharded rendering, replicated scenes, psum grads.

The reference's per-pixel fragment SPMD (SURVEY.md §2.6) becomes
`shard_map` over a `jax.sharding.Mesh`; see bpt_tpu.parallel.sharding.
"""

from bpt_tpu.parallel.sharding import make_mesh, sharded_render_frame, sharded_trace
