"""Test config: run JAX on CPU with 8 virtual devices so the sharding /
multi-chip paths are exercised without TPU hardware (SURVEY.md §4 item 4).

Must set env vars before the first jax import anywhere in the test session.
"""
import os

# The image's sitecustomize imports jax and registers the axon TPU backend at
# interpreter startup — before this conftest runs — so env vars alone are too
# late. XLA_FLAGS is still read lazily when the CPU backend initializes, and
# jax.config.update("jax_platforms") works as long as no backend has been
# used yet, so the combination below reliably pins the test session to a
# virtual 8-device CPU mesh (SURVEY.md §4 item 4).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream, so
    # failures reproduce in isolation (a session-scoped rng made results
    # depend on which tests ran before — VERDICT round 1, Weak #2).
    return np.random.default_rng(1234)


def _asset(name: str) -> str:
    for base in ("/root/reference/public", "/root/reference/public/DIP test"):
        p = os.path.join(base, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)


@pytest.fixture(scope="session")
def asset_path():
    return _asset
