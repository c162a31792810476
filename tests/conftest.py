"""Test configuration: CPU backend with 8 virtual devices + 64-bit mode.

Mirrors SURVEY.md section 4's plan: the reference's exhaustive integration
matrix runs on the host; multi-chip sharding is validated on a virtual
8-device CPU mesh (xla_force_host_platform_device_count).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The axon TPU plugin forces jax_platforms at registration; override it
# before any backend is initialized so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--full-matrix", action="store_true", default=False,
                     help="run the full reference-style test matrix")


@pytest.fixture(scope="session")
def full_matrix(request):
    return request.config.getoption("--full-matrix")
