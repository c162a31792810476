"""CI coverage for the at-scale measurement scripts (scripts/*.py).

The scripts are the north-star config-3/4 drivers; their --validate paths
run the identical jitted pipelines at small n and check against NumPy
models. Importing them in-process (instead of subprocess) reuses the
suite's jax: benchlib's config updates are all idempotent no-ops here.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_pipeline_script_validates_both_modes():
    import pipeline_1e9
    pipeline_1e9.validate(n=40_000, chunks=4, groups=500, mode="fused")
    pipeline_1e9.validate(n=40_000, chunks=2, groups=500, mode="staged")


def test_combined_script_validates(monkeypatch):
    import combined_1e8
    monkeypatch.setattr(sys, "argv",
                        ["combined_1e8.py", "--n", "20000", "--reps", "1",
                         "--validate"])
    combined_1e8.main()


def test_pipeline_rejects_indivisible_chunking():
    import pipeline_1e9
    with pytest.raises(AssertionError):
        pipeline_1e9.run_pipeline(1001, 4, 100, "fused")
