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

# Modules/tests auto-marked `slow` and excluded from the <2-min smoke
# tier (`ci.sh --quick` runs `-m "not slow"`; plain `pytest tests/` and
# the default `ci.sh` still run everything).  The smoke tier keeps the
# engine/type/direction matrix, the oracle, transforms, methods policy,
# and one distributed smoke file (test_distributed.py) — what it drops
# is the long-tail fuzz sweeps and the wide distributed-operator grids.
SLOW_MODULES = {
    "test_fuzz_operators", "test_fuzz_distributed", "test_fuzz_differential",
    "test_dist_ops", "test_multihost", "test_merge_join", "test_pallas_hist",
    "test_pallas_partition",
}
SLOW_TESTS = {
    "test_group_aggregate_all_aggs",
    "test_group_aggregate_float_mean_multi_stream",
    "test_top_k_64bit_blocked_selection",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: excluded from the ci.sh --quick smoke tier")


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.module.__name__.rpartition(".")[2]
        base = getattr(item, "originalname", None) or item.name
        if name in SLOW_MODULES or base.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


def pytest_addoption(parser):
    parser.addoption("--full-matrix", action="store_true", default=False,
                     help="run the full reference-style test matrix")


@pytest.fixture(scope="session")
def full_matrix(request):
    return request.config.getoption("--full-matrix")
