"""lens-flare-tpu: a TPU-native differentiable path tracer with physically-based lens flare.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
reference renderer ``aatifjiwani/lens-flare`` (a CS184 C++ CPU path tracer with
a lens-flare pipeline).  Nothing here is a translation of the C++: the compute
path is wavefront-vectorized over ray batches, compiled with XLA, with Pallas
kernels for the hot intersection loop and ``jax.sharding`` for multi-chip
scale-out.

Layout (mirrors reference layers, SURVEY.md section 1):

- ``utils``       image IO, gamma transform, small math      (ref: CGL/, util/image.h)
- ``scene``       COLLADA parsing, flat scene arrays, camera (ref: src/scene/collada, src/pathtracer/camera.*)
- ``accel``       BVH build (host) + flattened GPU arrays    (ref: src/scene/bvh.*)
- ``ops``         intersection kernels (XLA + Pallas)        (ref: triangle.cpp/sphere.cpp/bbox.cpp)
- ``integrator``  wavefront path tracing, BSDFs, lights      (ref: src/pathtracer/pathtracer.cpp, bsdf.cpp)
- ``lens``        aperture textures, paraxial ghosts,
                  thin-lens + full lens-stack tracing        (ref: pathtracer.cpp:511-817, camera_lens.cpp)
- ``flare``       FFT Fraunhofer starburst + falloff         (ref: pathtracer.cpp:947-1063)
- ``parallel``    device mesh, sharded rendering             (ref: util/work_queue.h thread pool)
- ``diff``        differentiable lens design optimization
- ``oracle``      NumPy reference implementations for tests
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first TPU compile of the integrator is
# tens of seconds; cache it across processes.
import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lens_flare_tpu_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The axon TPU plugin presets jax_platforms="axon,cpu", silently overriding
# the JAX_PLATFORMS env var; re-apply it through the config API so
# JAX_PLATFORMS=cpu runs (tests, CI, subprocesses) actually stay on CPU.
_want_platforms = _os.environ.get("JAX_PLATFORMS")
if _want_platforms:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _want_platforms)
    except Exception:
        pass
