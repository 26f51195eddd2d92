"""Test harness config: force CPU with 8 virtual devices for multi-chip tests.

The reference repo has no tests (SURVEY.md §4); our strategy is golden-value
parity vs torch math, closed-form unit tests, and multi-device tests on a
virtual CPU mesh (``--xla_force_host_platform_device_count=8``) instead of
real TPUs.
"""

import os

# Must be set before jax backends initialize.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The sandbox's sitecustomize preregisters a remote-TPU ("axon") backend that
# outranks the env var; force the CPU platform explicitly so unit tests never
# run over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
