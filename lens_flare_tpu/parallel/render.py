"""Sharded rendering and the sharded differentiable training step.

``render_sharded`` data-parallels the pixel wavefront over the mesh batch
axis with the scene replicated; ``make_train_step`` builds the BASELINE
config-5 loop body: render + flare composite + pixel loss + ``jax.grad``
w.r.t. the lens prescription + optax update, all under one pjit — XLA
all-reduces the parameter gradients over the mesh (overlapped with the
backward sweep by the scheduler).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..integrator.path import render_wavefront
from .mesh import BATCH_AXIS, make_mesh, replicate, shard_batch


def render_sharded(bundle, settings, cam, px, py, width, height, key, mesh=None):
    """Data-parallel render: pixels sharded over the mesh, scene replicated.

    px, py must have length divisible by the mesh size.
    """
    if mesh is None:
        mesh = make_mesh()
    data_sharding = shard_batch(mesh)
    repl = replicate(mesh)

    px = jax.device_put(px, data_sharding)
    py = jax.device_put(py, data_sharding)
    bundle = jax.device_put(bundle, repl)

    fn = jax.jit(
        lambda b, x, y: render_wavefront(b, settings, cam, x, y, width, height, key),
        # stats are a global sum over the sharded lanes: XLA all-reduces them
        # and the (2,) vector comes back replicated
        out_shardings=(data_sharding, data_sharding, None),
    )
    return fn(bundle, px, py)


def ghost_image_from_lens(lens, ghost_tex, axis_ray, angle, width, height):
    """Differentiable ghost-buffer forward model (used by the optimization loop)."""
    from ..lens.ghosts import splat_ghosts
    from ..lens.paraxial import trace_all_ghosts

    r1, r2 = trace_all_ghosts(lens, angle)
    n_pairs = r1.shape[0]
    colors = jnp.tile(jnp.eye(3), (n_pairs, 1))
    return splat_ghosts(ghost_tex, r1.reshape(-1), r2.reshape(-1), colors, axis_ray, width, height, smooth=True)


def make_train_step(optimizer, ghost_tex, axis_ray, angle, width, height, mesh=None):
    """Lens-design optimization step (BASELINE config 5), shardable over rows.

    loss(lens) = mean((ghost_image(lens) - target)^2); returns jitted
    (lens, opt_state, target) -> (lens, opt_state, loss).
    """

    def loss_fn(lens, target):
        img = ghost_image_from_lens(lens, ghost_tex, axis_ray, angle, width, height)
        return jnp.mean((img - target) ** 2)

    def step(lens, opt_state, target):
        loss, grads = jax.value_and_grad(loss_fn)(lens, target)
        updates, opt_state = optimizer.update(grads, opt_state, lens)
        import optax

        lens = optax.apply_updates(lens, updates)
        return lens, opt_state, loss

    if mesh is not None:
        data_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(BATCH_AXIS)
        )
        return jax.jit(step, in_shardings=(None, None, data_sharding))
    return jax.jit(step)
