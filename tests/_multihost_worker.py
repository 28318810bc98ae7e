"""Worker process for the 2-process jax.distributed simulation test.

Launched by ``test_multihost.py`` with argv = (process_id, coordinator,
dae_path, out_dir).  Each process owns 2 virtual CPU devices; the global
mesh spans 4 devices across both processes (SURVEY.md §4's fake-backend
idiom for multi-host logic without a pod).  Exits nonzero on any mismatch.
"""

import os
import sys

pid = int(sys.argv[1])
coordinator = sys.argv[2]
dae_path = sys.argv[3]
out_dir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
# share one persistent compilation cache between both workers and across
# the test's retry: the first worker to finish a compile donates it to the
# other, which halves the compile load on a busy CI host (the observed
# flake mode was compile/collective starvation under full-suite load)
cache_dir = os.environ.get("LF_MULTIHOST_CACHE")
if cache_dir:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from lens_flare_tpu.parallel.mesh import init_distributed

init_distributed(coordinator, num_processes=2, process_id=pid)

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

import numpy as np
import jax.numpy as jnp

from lens_flare_tpu.accel import build_bvh
from lens_flare_tpu.integrator.lights import lights_to_device
from lens_flare_tpu.integrator.path import SceneBundle, make_settings, render_wavefront
from lens_flare_tpu.integrator.shading import bsdf_to_device
from lens_flare_tpu.ops import scene_to_device
from lens_flare_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from lens_flare_tpu.scene.build import load_scene
from lens_flare_tpu.scene.camera import Camera, place_from_scene_info

scene, info = load_scene(dae_path)
lo, hi = scene.primitive_bboxes()
bundle = SceneBundle(
    scene=scene_to_device(scene, build_bvh(lo, hi)),
    bsdfs=bsdf_to_device(scene.bsdfs),
    lights=lights_to_device(scene.lights),
    env=None,
)
# depth 2 at 1 spp: the smallest program that still exercises the sharded
# INDIRECT bounce loop (RR + bounce-scan stats psum) across processes —
# budgeted for a loaded CI host (VERDICT r3 item 6; review r4: dropping to
# depth 1 would leave the distributed indirect path untested)
settings = make_settings(scene.lights, ns_aa=1, max_ray_depth=2, ns_area_light=1, indirect=True)
width = height = 16
cam = Camera()
cam.configure(info.camera, width, height)
place_from_scene_info(cam, info, scene.bbox_min, scene.bbox_max)
cam_params = cam.params()
key = jax.random.PRNGKey(7)

ys, xs = np.mgrid[0:height, 0:width]
px_np = xs.ravel().astype(np.int32)
py_np = ys.ravel().astype(np.int32)

fn = lambda b, x, y: render_wavefront(b, settings, cam_params, x, y, width, height, key)

# single-process baseline on this process's first local device
with jax.default_device(jax.local_devices()[0]):
    base = np.asarray(jax.jit(fn)(bundle, jnp.asarray(px_np), jnp.asarray(py_np))[0])

# distributed: pixels sharded over the 4-device global mesh, scene replicated.
# jax.devices() orders devices by process, so this process's addressable
# block is the pid-th contiguous half of the batch axis.
mesh = make_mesh()
data = shard_batch(mesh)
repl = replicate(mesh)
n = len(px_np)
half = slice(pid * n // 2, (pid + 1) * n // 2)
px_g = jax.make_array_from_process_local_data(data, px_np[half], global_shape=(n,))
py_g = jax.make_array_from_process_local_data(data, py_np[half], global_shape=(n,))
bundle_g = jax.device_put(bundle, repl)

rad_g, cnt_g, stats_g = jax.jit(fn, out_shardings=(data, data, None))(bundle_g, px_g, py_g)

from jax.experimental import multihost_utils

rad_full = np.asarray(multihost_utils.process_allgather(rad_g, tiled=True))

np.testing.assert_array_equal(base, rad_full)
assert np.asarray(stats_g)[0] > 0  # counters all-reduced over both processes

# the sharded differentiable lens-train step also runs across processes
import optax

from lens_flare_tpu.lens.prescription import reference_prescription
from lens_flare_tpu.parallel.render import ghost_image_from_lens, make_train_step

lens = reference_prescription()
tex = jnp.ones((8, 8), jnp.float32)
axis = jnp.asarray([0.3, 0.2])
target = np.asarray(ghost_image_from_lens(lens, tex, axis, 0.25, 16, 16))
target = jax.make_array_from_process_local_data(
    data, target[pid * 8 : (pid + 1) * 8], global_shape=target.shape
)
opt = optax.adam(1e-4)
step = make_train_step(opt, tex, axis, 0.25, 16, 16, mesh=mesh)
lens2, _, loss = step(lens, opt.init(lens), target)
assert np.isfinite(float(loss))

with open(os.path.join(out_dir, f"ok_{pid}"), "w") as f:
    f.write("ok")
print(f"[multihost worker {pid}] OK")
