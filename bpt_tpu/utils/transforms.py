"""TRS transform composition (Babylon TransformNode analog).

The reference parameterizes every instanced object by the *inverse* of a
TransformNode world matrix (translate/rotate/scale), e.g.
/root/reference/js/Babylon_Path_Tracing.js:259-272.  These helpers build the
same matrices differentiably so object transforms are optimizable parameters.

Babylon composes world = S * R * T in row-vector convention; in our
column-vector convention that is M = T @ R @ S with rotation order YXZ
(rotation.y then .x then .z applied to the object).
"""

from __future__ import annotations

import jax.numpy as jnp


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.stack(
        [
            jnp.stack([jnp.ones_like(c), jnp.zeros_like(c), jnp.zeros_like(c)]),
            jnp.stack([jnp.zeros_like(c), c, -s]),
            jnp.stack([jnp.zeros_like(c), s, c]),
        ]
    )


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.stack(
        [
            jnp.stack([c, jnp.zeros_like(c), s]),
            jnp.stack([jnp.zeros_like(c), jnp.ones_like(c), jnp.zeros_like(c)]),
            jnp.stack([-s, jnp.zeros_like(c), c]),
        ]
    )


def _rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, jnp.zeros_like(c)]),
            jnp.stack([s, c, jnp.zeros_like(c)]),
            jnp.stack([jnp.zeros_like(c), jnp.zeros_like(c), jnp.ones_like(c)]),
        ]
    )


def trs_matrix(translation=(0.0, 0.0, 0.0), rotation=(0.0, 0.0, 0.0), scale=(1.0, 1.0, 1.0)) -> jnp.ndarray:
    """World matrix for Babylon-style (position, rotation-YXZ, scaling)."""
    t = jnp.asarray(translation, jnp.float32)
    rx, ry, rz = [jnp.asarray(r, jnp.float32) for r in rotation]
    s = jnp.asarray(scale, jnp.float32)
    r3 = _rot_y(ry) @ _rot_x(rx) @ _rot_z(rz)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(r3 * s[None, :])
    return m.at[:3, 3].set(t)


def invert_rigid(m: jnp.ndarray) -> jnp.ndarray:
    """General 4x4 inverse (differentiable).  Named for its typical use on
    TRS matrices; falls back to jnp.linalg.inv which handles non-uniform
    scale and shear too."""
    return jnp.linalg.inv(m)


def compose(*ms: jnp.ndarray) -> jnp.ndarray:
    out = ms[0]
    for m in ms[1:]:
        out = out @ m
    return out
