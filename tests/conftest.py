"""Test env: run everything on CPU with 8 virtual devices.

The sandbox boots every interpreter with an 'axon' TPU-tunnel backend
(sitecustomize registers it and forces jax_platforms='axon,cpu', which
overrides the JAX_PLATFORMS env var). Tests must run on local CPU — eager
ops over the tunnel are ~1000x slower — so we override the jax config
again here, before any backend is initialized. XLA_FLAGS must be set
before the CPU client spins up; backends are lazy, so doing it at conftest
import time is early enough. Mirrors the multi-device-on-CPU strategy from
SURVEY.md §4: sharding/collective tests run on a virtual 8-device mesh.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert jax.device_count() == 8, jax.devices()
