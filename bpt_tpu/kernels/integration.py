"""Wiring the Pallas megakernel into the progressive renderer.

`attach_pallas_path(renderer)` swaps a ProgressiveRenderer's jitted step for
one whose radiance pass is the fused Pallas kernel; edge detection and the
accumulation protocol are shared with the jnp path (finish_frame), so the
renderer's behavior — including denoiser alpha flags and motion resets — is
unchanged up to float tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bpt_tpu.integrator.frame import finish_frame
from bpt_tpu.kernels.megakernel import trace_image_pallas
from bpt_tpu.renderer import ProgressiveRenderer, RenderState


def attach_pallas_path(renderer: ProgressiveRenderer, tile_rows: int = 32, tile_cols: int = 256, reorder: bool = False) -> None:
    """Swap the renderer's step for the fused Pallas kernel.

    ``reorder=True`` additionally routes the BATCHED sample loop
    (ProgressiveRenderer.render's fused scan) through the staged
    sorted-wavefront multi-frame path: each batch of K progressive frames
    traces as ONE K*H*W lane pool (ray reordering + dead-lane compaction
    between bounces — the fast path for divergent mesh scenes), then the
    accumulation protocol replays the K per-frame results in order, so the
    render is identical to K single steps."""
    # a previous attach with reorder=True installed an instance-level
    # _get_scan override; clear it so a re-attach with reorder=False does
    # not keep serving the stale staged scan (advisor r4 finding)
    renderer.__dict__.pop("_get_scan", None)
    cfg = renderer.cfg
    height, width = renderer.height, renderer.width
    tile_rows = min(tile_rows, height)
    tile_cols = min(tile_cols, width)
    # static scene facts must be decided here, while the scene is concrete —
    # inside the jitted step the quad vertices are tracers and the
    # parallelogram fast path would silently stay off
    from bpt_tpu.kernels.megakernel import _all_parallelograms

    fast_quads = _all_parallelograms(renderer.scene.quads)

    # the compiled step is bound to the attach-time decision; if the caller
    # later swaps in a scene whose quads are NOT parallelograms, the fast
    # path would silently return wrong quad hits — re-validate whenever a
    # different quad object shows up (advisor r3 finding)
    # keyed by id() AND holding the object: a bare id() can be reused by
    # CPython after the original quads is collected, silently skipping the
    # re-validation this guard exists for (advisor r4 finding)
    _seen_quads = {id(renderer.scene.quads): renderer.scene.quads}

    def _scene_guard(scene):
        key = id(scene.quads)
        if _seen_quads.get(key) is scene.quads:
            return
        if fast_quads and not _all_parallelograms(scene.quads):
            raise ValueError(
                "attach_pallas_path compiled the parallelogram quad fast path "
                "for the attach-time scene, but this scene's quads are not "
                "parallelograms — re-attach the Pallas path for this scene"
            )
        _seen_quads[key] = scene.quads

    def step_state_pallas(scene, camera, _cfg, state, camera_is_moving, rand_vec2, blue_noise):
        moving = jnp.asarray(camera_is_moving, bool)
        was_still = state.sample_counter != 1.0
        frame_counter = jnp.where(moving & was_still, 1.0, state.frame_counter + 1.0)
        sample_counter = jnp.where(moving, 1.0, state.sample_counter + 1.0)
        result = trace_image_pallas(
            scene, camera, cfg, width, height, frame_counter, rand_vec2, blue_noise,
            tile_rows=tile_rows, tile_cols=tile_cols,
            interpret=jax.default_backend() != "tpu",
            fast_quads=fast_quads,
        )
        accum = finish_frame(result, state.accum, frame_counter, moving)
        return RenderState(accum=accum, sample_counter=sample_counter, frame_counter=frame_counter)

    renderer._raw_step = step_state_pallas
    renderer._scan_cache = None  # rebuild the fused-sample scan on demand
    renderer._scene_guard = _scene_guard
    renderer._step = jax.jit(step_state_pallas, static_argnums=(2,))

    if reorder:
        from bpt_tpu.kernels.megakernel import trace_frames_pallas

        def multi_frame_scan(scene, camera, _cfg, state, rvs, bn):
            k = rvs.shape[0]
            fcs = state.frame_counter + 1.0 + jnp.arange(float(k))
            res = trace_frames_pallas(
                scene, camera, cfg, width, height, fcs, rvs, bn,
                tile_rows=tile_rows, tile_cols=tile_cols,
                interpret=jax.default_backend() != "tpu",
                fast_quads=fast_quads,
            )
            accum = state.accum
            fc = state.frame_counter
            for i in range(k):
                r_i = jax.tree.map(lambda x: x[i], res)
                fc = fc + 1.0
                accum = finish_frame(r_i, accum, fc, False)
            return RenderState(accum=accum,
                               sample_counter=state.sample_counter + k,
                               frame_counter=fc)

        jitted_scan = jax.jit(multi_frame_scan, static_argnums=(2,))
        renderer._get_scan = lambda: jitted_scan
