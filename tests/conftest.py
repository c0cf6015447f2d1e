"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container force-registers the axon TPU backend via sitecustomize and
pins JAX_PLATFORMS=axon, so tests must override through jax.config (env
vars are not enough). Multi-chip sharding is validated on forced host
platform devices; bench.py uses the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REF_IN = "/root/reference/tests/test_files_in"
REF_OUT = "/root/reference/tests/test_results_correct"


@pytest.fixture(scope="session")
def ref_in():
    return REF_IN


@pytest.fixture(scope="session")
def ref_out():
    return REF_OUT
