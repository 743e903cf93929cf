"""Inverse-rendering loop: loss must decrease and parameters must move
toward the truth (config #5's machinery at CI scale)."""

import jax.numpy as jnp
import numpy as np

from bpt_tpu.core.rng import blue_noise_table
from bpt_tpu.diff.inverse import optimize, render_avg
from bpt_tpu.integrator import IntegratorConfig
from bpt_tpu.scenes.cornell import cornell_camera, cornell_scene

SIZE = 32


def test_recover_light_emission():
    cfg = IntegratorConfig(bounces=3)
    camera = cornell_camera()
    base = cornell_scene()

    def build(params):
        quads = base.quads._replace(
            color=base.quads.color.at[5].set(params["emission"] * jnp.ones(3))
        )
        return base._replace(quads=quads), camera

    bn = jnp.asarray(blue_noise_table())
    rv = jnp.asarray([0.3, 0.7], jnp.float32)
    true_emission = 10.0
    target_scene, _ = build({"emission": jnp.asarray(true_emission)})
    target = render_avg(target_scene, camera, cfg, SIZE, (1.0, 2.0), rv, bn)

    result = optimize(
        build,
        {"emission": jnp.asarray(4.0)},
        target,
        cfg,
        SIZE,
        steps=30,
        lr=0.5,
    )
    losses = np.asarray(result.losses)
    assert losses[-1] < losses[0] * 0.05, f"loss {losses[0]:.4f} -> {losses[-1]:.4f}"
    recovered = float(result.params["emission"])
    assert abs(recovered - true_emission) < 1.0, f"emission {recovered} != {true_emission}"
