"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lens_flare_tpu.accel import build_bvh
from lens_flare_tpu.integrator.lights import lights_to_device
from lens_flare_tpu.integrator.path import SceneBundle, make_settings, render_wavefront
from lens_flare_tpu.integrator.shading import bsdf_to_device
from lens_flare_tpu.ops import scene_to_device
from lens_flare_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from lens_flare_tpu.scene.camera import Camera, place_from_scene_info


def _bundle(pyramid_scene, width, height):
    scene, info = pyramid_scene
    lo, hi = scene.primitive_bboxes()
    bvh = build_bvh(lo, hi)
    bundle = SceneBundle(
        scene=scene_to_device(scene, bvh),
        bsdfs=bsdf_to_device(scene.bsdfs),
        lights=lights_to_device(scene.lights),
        env=None,
    )
    settings = make_settings(scene.lights, ns_aa=2, max_ray_depth=2, ns_area_light=1, indirect=True)
    cam = Camera()
    cam.configure(info.camera, width, height)
    place_from_scene_info(cam, info, scene.bbox_min, scene.bbox_max)
    return bundle, settings, cam.params()


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device(pyramid_scene):
    """Film sharded over 8 devices must be bit-identical to unsharded."""
    width = height = 32
    bundle, settings, cam = _bundle(pyramid_scene, width, height)
    key = jax.random.PRNGKey(3)

    ys, xs = np.mgrid[0:height, 0:width]
    px = jnp.asarray(xs.ravel())
    py = jnp.asarray(ys.ravel())

    fn = lambda b, x, y: render_wavefront(b, settings, cam, x, y, width, height, key)[0]

    base = np.asarray(jax.jit(fn)(bundle, px, py))

    mesh = make_mesh()
    data = shard_batch(mesh)
    repl = replicate(mesh)
    px_s = jax.device_put(px, data)
    py_s = jax.device_put(py, data)
    bundle_s = jax.device_put(bundle, repl)
    sharded = np.asarray(jax.jit(fn, out_shardings=data)(bundle_s, px_s, py_s))

    np.testing.assert_array_equal(base, sharded)


def test_sharded_lens_grad_matches(pyramid_scene):
    """Lens-design gradients with a sharded target == unsharded gradients."""
    from lens_flare_tpu.lens.prescription import reference_prescription
    from lens_flare_tpu.parallel.render import ghost_image_from_lens

    width = height = 24
    lens = reference_prescription()
    tex = jnp.ones((8, 8)) * 0.5
    axis = jnp.asarray([0.6, 0.55])
    angle = jnp.float32(0.4)
    target = jnp.zeros((height, width, 3))

    def loss(lens, target):
        img = ghost_image_from_lens(lens, tex, axis, angle, width, height)
        return jnp.mean((img - target) ** 2)

    g_base = jax.jit(jax.grad(loss))(lens, target)

    mesh = make_mesh()
    t_sharded = jax.device_put(target, NamedSharding(mesh, P("batch", None, None)))
    g_sharded = jax.jit(jax.grad(loss))(lens, t_sharded)

    for a, b in zip(jax.tree_util.tree_leaves(g_base), jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_rowsharded_train_step_shards_the_work():
    """Config-5 forward model sharded for REAL (VERDICT r3 item 8).

    The row-sharded ghost render must (a) bit-match the unsharded image,
    (b) produce the same lens update/loss as the unsharded train step, and
    (c) actually cut per-device compute: the compiled sharded step's
    per-device FLOPs must be well under the replicated step's.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lens_flare_tpu.lens.prescription import reference_prescription
    from lens_flare_tpu.parallel.mesh import BATCH_AXIS, make_mesh
    from lens_flare_tpu.parallel.render import ghost_image_from_lens, make_train_step

    mesh = make_mesh()
    lens = reference_prescription()
    tex = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (12, 12)), jnp.float32)
    axis = jnp.asarray([0.6, 0.55])
    angle = jnp.float32(0.4)
    W, H = 48, 40  # H divides over the 8-device mesh

    img_u = ghost_image_from_lens(lens, tex, axis, angle, W, H)
    img_s = ghost_image_from_lens(lens, tex, axis, angle, W, H, mesh=mesh)
    assert np.array_equal(np.asarray(img_u), np.asarray(img_s))  # (a)

    opt = optax.adam(1e-3)
    target = jnp.zeros((H, W, 3))
    t_sh = jax.device_put(target, NamedSharding(mesh, P(BATCH_AXIS)))
    step_u = make_train_step(opt, tex, axis, angle, W, H)
    step_s = make_train_step(opt, tex, axis, angle, W, H, mesh=mesh)
    lu, _, loss_u = step_u(lens, opt.init(lens), target)
    ls, _, loss_s = step_s(lens, opt.init(lens), t_sh)
    np.testing.assert_allclose(  # (b)
        np.asarray(lu.curvatures), np.asarray(ls.curvatures), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(float(loss_u), float(loss_s), rtol=1e-6)

    def flops(fn, *args):
        ca = fn.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca.get("flops", -1.0))

    f_u = flops(step_u, lens, opt.init(lens), target)
    f_s = flops(step_s, lens, opt.init(lens), t_sh)
    assert f_u > 0 and f_s > 0
    assert f_s < 0.5 * f_u, (f_s, f_u)  # (c): real per-device work reduction
