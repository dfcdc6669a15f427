"""Test config: run JAX on a virtual 8-device CPU mesh.

Must set the env vars BEFORE jax is imported anywhere (SURVEY.md §4:
the standard trick for exercising sharded code without a cluster).
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (the real TPU tunnel),
# but unit tests must run hermetically on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; the
# config knob does win, so force CPU through it as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
