"""Checkpoint / resume for progressive renders and inverse-rendering runs.

The reference's only resumable state is implicit: the accumulation render
target + (uSampleCounter, uFrameCounter) (SURVEY.md §5).  Here that state is
an explicit pytree (bpt_tpu.renderer.RenderState), so checkpointing is just
serialization; inverse-rendering optimizer state (params + optax state) uses
the same machinery.

Orbax is used when available (async-capable, sharded-array aware — the right
tool once the accumulation buffer lives sharded across a pod); a .npz
fallback keeps the feature dependency-free.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bpt_tpu.renderer import RenderState


def _try_orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save_render_state(path: str, state: RenderState) -> str:
    """Persist a RenderState; returns the path written."""
    ocp = _try_orbax()
    if ocp is not None:
        path = os.path.abspath(path)
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, state._asdict(), force=True)
        ckpt.wait_until_finished()
        return path
    np.savez(
        path + ".npz",
        accum=np.asarray(state.accum),
        sample_counter=np.asarray(state.sample_counter),
        frame_counter=np.asarray(state.frame_counter),
    )
    return path + ".npz"


def load_render_state(path: str) -> RenderState:
    ocp = _try_orbax()
    if ocp is not None and os.path.isdir(path):
        ckpt = ocp.StandardCheckpointer()
        restored = ckpt.restore(os.path.abspath(path))
        return RenderState(
            accum=jnp.asarray(restored["accum"]),
            sample_counter=jnp.asarray(restored["sample_counter"]),
            frame_counter=jnp.asarray(restored["frame_counter"]),
        )
    f = np.load(path if path.endswith(".npz") else path + ".npz")
    return RenderState(
        accum=jnp.asarray(f["accum"]),
        sample_counter=jnp.asarray(f["sample_counter"]),
        frame_counter=jnp.asarray(f["frame_counter"]),
    )


def save_pytree(path: str, tree: Any) -> str:
    """Generic pytree save (optimizer state, scene params)."""
    ocp = _try_orbax()
    if ocp is not None:
        path = os.path.abspath(path)
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, tree, force=True)
        ckpt.wait_until_finished()
        return path
    leaves, treedef = jax.tree.flatten(tree)
    np.savez(path + ".npz", *[np.asarray(l) for l in leaves], treedef=str(treedef))
    return path + ".npz"


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    ocp = _try_orbax()
    if ocp is not None and os.path.isdir(path):
        ckpt = ocp.StandardCheckpointer()
        if like is not None:
            return ckpt.restore(os.path.abspath(path), args=__import__("orbax.checkpoint", fromlist=["args"]).args.StandardRestore(like))
        return ckpt.restore(os.path.abspath(path))
    f = np.load(path if path.endswith(".npz") else path + ".npz", allow_pickle=False)
    arrays = [jnp.asarray(f[k]) for k in f.files if k != "treedef"]
    if like is None:
        return arrays
    leaves, treedef = jax.tree.flatten(like)
    assert len(leaves) == len(arrays)
    return jax.tree.unflatten(treedef, arrays)
