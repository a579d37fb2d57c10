"""Test configuration: force an 8-device virtual CPU platform.

Tests never need real TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (SURVEY.md section 4's "fake backend" strategy).
Must run before jax initializes its backends.
"""

import os

# The shell env pins JAX_PLATFORMS=axon (the real TPU) and the axon
# sitecustomize imports jax at interpreter start, so env edits alone are too
# late - override through jax.config after import instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, (
    "tests require the 8-device virtual CPU platform; got "
    f"{jax.devices()}"
)

import pytest  # noqa: E402

from carla_ppo_tpu.envs import track as track_mod  # noqa: E402
from carla_ppo_tpu.envs.types import EnvParams  # noqa: E402


@pytest.fixture(scope="session")
def lap_track():
    return track_mod.make_lap_track(seed=0)


@pytest.fixture(scope="session")
def lap_params(lap_track):
    return EnvParams(track=lap_track)
