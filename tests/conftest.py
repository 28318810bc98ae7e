"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware by forcing the
host platform and faking 8 devices (the idiomatic JAX approach; SURVEY.md
section 4).
"""

import os

# MUST overwrite: the machine environment pins JAX_PLATFORMS=axon (TPU
# tunnel); setdefault would keep it and the axon backend would still
# initialize (and hang the suite whenever the tunnel is down).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin presets jax_platforms="axon,cpu", overriding the env
# var — force CPU through the config API so tests never touch the TPU tunnel.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def dae_dir():
    return REFERENCE / "dae"


@pytest.fixture(scope="session")
def apertures_dir():
    return REFERENCE / "apertures"


@pytest.fixture(scope="session")
def pyramid_scene():
    from lens_flare_tpu.scene.build import load_scene

    return load_scene(REFERENCE / "dae" / "pyramid.dae")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The suite compiles several hundred distinct XLA programs in one
    process; past ~130 the CPU backend segfaulted inside
    backend_compile_and_load (observed twice at the same point, tests pass
    in isolation — a compiler-resource failure, not a test bug).  Modules
    rarely share jit shapes, so dropping the caches costs little and keeps
    the peak footprint bounded.
    """
    yield
    jax.clear_caches()
