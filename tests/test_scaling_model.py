"""Regression tests for the analytic ICI/DCN scaling model
(models/scaling.py) — the projection leg of the north star's
"scaling eff 1->N hosts" metric (VERDICT r03 missing item 2).

These pin the model's structure (bytes accounting, baselines, phase
composition), not the hardware constants: constants are public figures
plus the measured single-chip anchor, both stated in the module.
"""

import math

import pytest

from simd_radix_sort_tpu.models import scaling


ANCHOR = scaling.MEASURED_ANCHOR


def test_sort_seconds_matches_anchor():
    t = scaling.sort_seconds(ANCHOR["n"])
    assert t == pytest.approx(ANCHOR["n"] / ANCHOR["rows_per_s"], rel=1e-9)


def test_sort_seconds_nlogn_shape():
    # doubling n costs slightly more than 2x (the log factor)
    r = scaling.sort_seconds(2e8) / scaling.sort_seconds(1e8)
    assert 2.0 < r < 2.2
    # tiny n does not divide by log2(1) = 0
    assert scaling.sort_seconds(1) > 0


def test_exchange_bytes_accounting():
    """Uniform splitters ship exactly (P-1)/P of each shard's bytes."""
    link = scaling.LINKS["v5e"]
    for p in (2, 4, 8):
        ph = scaling.distributed_sort_phases(1e8 * p, p, row_bytes=16,
                                             link=link)
        want = (1e8 * 16 * (p - 1) / p) / link.ici_bytes_per_s
        assert ph.exchange_s == pytest.approx(want, rel=1e-9)


def test_p1_has_no_exchange_but_pays_padded_sort():
    """Faithful to splitter_sort_core: P=1 skips traffic but still sorts
    the capacity_factor-padded receive buffer."""
    ph = scaling.distributed_sort_phases(1e8, 1, capacity_factor=2.0)
    assert ph.exchange_s == 0.0
    assert ph.final_sort_s == pytest.approx(scaling.sort_seconds(2e8),
                                            rel=1e-9)


def test_capacity_factor_scales_final_sort():
    lo = scaling.distributed_sort_phases(8e8, 8, capacity_factor=1.25)
    hi = scaling.distributed_sort_phases(8e8, 8, capacity_factor=2.0)
    assert lo.final_sort_s < hi.final_sort_s
    assert lo.local_sort_s == hi.local_sort_s


def test_strong_scaling_efficiency_bounds():
    """vs the distributed-P1 baseline the sort is compute-dominated on
    ICI: >=80% efficiency through at least 8 chips at 1e8 rows/chip.
    Mildly superlinear is expected: splitting an n*log2(n) cost P ways
    drops the log factor too."""
    for p in (2, 4, 8):
        eff = scaling.scaling_efficiency(8e8, p)
        assert 0.8 <= eff <= 1.25, (p, eff)


def test_weak_scaling_efficiency_near_one_on_ici():
    for p in (2, 4, 8, 64):
        eff = scaling.weak_scaling_efficiency(1e8, p)
        assert 0.9 <= eff <= 1.0, (p, eff)


def test_single_chip_baseline_shows_the_padded_sort_tax():
    """The honest number: vs one plain lax.sort, the two-sort shape with
    capacity_factor=2 lands near 1/(1+2.15) per chip."""
    eff = scaling.weak_scaling_efficiency(1e8, 8, baseline="single_chip")
    assert 0.25 <= eff <= 0.40, eff


def test_blocked_final_mode_recovers_efficiency():
    """The segment-aligned final pass (batched block sort at the
    measured 919 Melem/s) lifts per-chip efficiency vs single chip
    above 70% — the motivation for building it."""
    eff = scaling.weak_scaling_efficiency(1e8, 8, baseline="single_chip",
                                          final_mode="blocked")
    assert eff > 0.7, eff


def test_hierarchical_dcn_crossed_once():
    """S-slice sort ships (S-1)/S of each shard's bytes over DCN exactly
    once; DCN time must scale accordingly."""
    link = scaling.LINKS["v5e"]
    ph2 = scaling.hierarchical_sort_phases(16e8, 2, 8, link=link)
    flat = scaling.distributed_sort_phases(8e8, 8, link=link)
    dcn_bytes = 1e8 * 16 * (2 - 1) / 2
    want = dcn_bytes / link.dcn_bytes_per_s_per_chip
    assert ph2.exchange_s - flat.exchange_s == pytest.approx(
        want, rel=1e-6, abs=1e-9)


def test_hierarchical_slices_monotone_dcn_cost():
    prev = 0.0
    for s in (1, 2, 4):
        ph = scaling.hierarchical_sort_phases(8e8 * s, s, 8)
        assert ph.exchange_s >= prev
        prev = ph.exchange_s


def test_projection_table_shape_and_prediction():
    rows = scaling.projection_table(n_per_chip=1e8)
    assert [r["chips"] for r in rows][:4] == [1, 2, 4, 8]
    assert rows[0]["weak_eff"] == pytest.approx(1.0)
    # the falsifiable RESULTS.md prediction: >=95% weak efficiency at
    # 2 chips on ICI (comm share ~1%)
    assert rows[1]["weak_eff"] >= 0.95
    # comm share stays small on ICI even at 256 chips
    assert rows[-1]["comm_share"] < 0.05
    for r in rows:
        assert r["total_s"] > 0 and r["rows_per_s"] > 0


def test_two_host_dcn_prediction():
    """The RESULTS.md >=80%-at-2-hosts statement: two v5e hosts (8 chips
    each) joined over DCN vs one host, weak scaling at 1e8 rows/chip."""
    one_host = scaling.distributed_sort_phases(8e8, 8)
    two_hosts = scaling.hierarchical_sort_phases(16e8, 2, 8)
    eff = one_host.total_s / two_hosts.total_s
    assert eff >= 0.8, eff


def test_link_specs_sane():
    for spec in scaling.LINKS.values():
        assert spec.ici_bytes_per_s > 0
        assert spec.dcn_bytes_per_s_per_chip > 0
        # ICI is always much faster than the per-chip DCN share
        assert spec.ici_bytes_per_s > 5 * spec.dcn_bytes_per_s_per_chip


def test_measured_comm_constants_cite_artifact_and_predict():
    """Round 5: the communication constants are fitted from committed
    measurements (COMM_CONSTANTS_r05.json) and the emulation predictors
    reproduce the fit points by construction."""
    mc = scaling.MEASURED_COMM
    assert mc["provenance"] == "COMM_CONSTANTS_r05.json"
    # fit point: 8-dev vmesh, n_local=2^20 [u64,u64] measured ~1.06 s
    pred = scaling.dense_emulation_exchange_seconds(1 << 20, 8)
    assert pred == pytest.approx(
        7 * (1 << 20) * 16 / mc["vmesh_exchange_bytes_per_s"])
    assert 0.8 < pred < 1.4
    # gloo fit point: 4 procs at n_local=2^22 (~100 MB/s effective)
    predg = scaling.multiproc_exchange_seconds(1 << 22, 4)
    assert 1.5 < predg < 3.5


def test_dcn_threshold_restates_the_clause():
    """The falsifiable restatement: the >=0.80-at-2-hosts clause holds
    exactly down to a DCN rate BELOW the spec-derated figure (margin),
    and far ABOVE the measured single-core software floor (so only a
    real NIC run can settle it)."""
    thr = scaling.dcn_required_for_clause()
    spec = scaling.LINKS["v5e"].dcn_bytes_per_s_per_chip
    assert thr < spec, (thr, spec)             # clause holds at spec
    assert spec / thr > 1.5                    # with real margin
    assert thr > scaling.MEASURED_COMM["gloo_bytes_per_s_per_proc"]
    # tightening the target raises the required bandwidth monotonically
    assert scaling.dcn_required_for_clause(target_eff=0.9) > thr
