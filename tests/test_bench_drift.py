"""Unit tests for bench.py's drift-normalization math (pure python — no
Spark session needed): the per-query host factor is the q1 probe value
linearly interpolated at the query's run position, over the start-of-run
probe.
"""

from __future__ import annotations

import importlib.util
import os


def _load_bench():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_steady_host_is_identity():
    b = _load_bench()
    probes = [
        {"after": 0, "at_sec": 0.0, "q1": 0.30},
        {"after": 15, "at_sec": 10.0, "q1": 0.30},
        {"after": 30, "at_sec": 20.0, "q1": 0.30},
    ]
    timings = {"qa": 1.0, "qb": 2.5}
    positions = {"qa": 7, "qb": 22}
    out = b._drift_normalize(timings, positions, probes)
    assert out == {"qa": 1.0, "qb": 2.5}


def test_midrun_slowdown_normalizes_down():
    b = _load_bench()
    # host slows 2x between probes 15 and 30; a query at position 22 sat
    # at interpolated factor (0.30 + 7/15*0.30)/0.30 = 1.4667
    probes = [
        {"after": 0, "at_sec": 0.0, "q1": 0.30},
        {"after": 15, "at_sec": 10.0, "q1": 0.30},
        {"after": 30, "at_sec": 20.0, "q1": 0.60},
    ]
    timings = {"fast_zone": 1.0, "slow_zone": 1.0}
    positions = {"fast_zone": 7, "slow_zone": 30}
    out = b._drift_normalize(timings, positions, probes)
    assert out["fast_zone"] == 1.0  # probes flat around it
    assert out["slow_zone"] == 0.5  # measured under a 2x-slower host
    # interpolated middle position
    out2 = b._drift_normalize({"mid": 1.0}, {"mid": 22}, probes)
    q1_mid = 0.30 + (22 - 15) / 15 * 0.30
    # _drift_normalize rounds to 4 decimals
    assert abs(out2["mid"] - 1.0 / (q1_mid / 0.30)) < 1e-4


def test_reference_is_idle_host_speed_not_start_probe():
    b = _load_bench()
    # the host was SLOW at the start (cold probe 0.40) and idle later
    # (0.20): a query that ran at idle speed must normalize to its raw
    # value — min(probes) is the idle-host reference, NOT probes[0]
    probes = [
        {"after": 0, "at_sec": 0.0, "q1": 0.40},
        {"after": 10, "at_sec": 5.0, "q1": 0.20},
    ]
    out = b._drift_normalize({"q": 1.0}, {"q": 10}, probes)
    assert out["q"] == 1.0  # ran at idle speed -> raw value stands
    # a query under the cold start normalizes DOWN by the slowdown
    out_cold = b._drift_normalize({"q": 1.0}, {"q": 0}, probes)
    assert out_cold["q"] == 0.5
    # position beyond the last probe uses the last probe's value
    out_edge = b._drift_normalize({"q": 1.0}, {"q": 10}, probes[:1])
    assert out_edge["q"] == 1.0


def test_cold_first_probe_does_not_inflate_steady_queries():
    b = _load_bench()
    # round-7 regression: probe 0 read 0.58s on a freshly-warmed JVM
    # while the steady series sat at 0.27-0.28s; dividing by probes[0]
    # inflated every steady-host value ~2.1x (chunk_documents reported
    # "12.46" normalized vs a re-measured 1.02s raw)
    probes = [
        {"after": 0, "at_sec": 0.0, "q1": 0.58},
        {"after": 15, "at_sec": 60.0, "q1": 0.27},
        {"after": 30, "at_sec": 120.0, "q1": 0.28},
    ]
    out = b._drift_normalize({"steady": 1.02}, {"steady": 22}, probes)
    # interpolated q1 at pos 22 is ~0.2747 vs ref 0.27 -> factor ~1.02
    assert abs(out["steady"] - 1.02) < 0.05 * 1.02


def test_empty_or_zero_probes_degrade_gracefully():
    b = _load_bench()
    assert b._drift_normalize({"q": 1.0}, {"q": 1}, []) == {}
    assert (
        b._drift_normalize(
            {"q": 1.0}, {"q": 1}, [{"after": 0, "at_sec": 0.0, "q1": 0.0}]
        )
        == {}
    )


def test_stdout_line_carries_noise_band_for_noisy_rows_only():
    b = _load_bench()
    t = {"q1_pricing_summary": 1.0, "steady": 0.5, "noisy": 0.4, "q1_end_repeat": 1.1}
    nb = {"q1_pricing_summary": 0.01, "steady": 0.05, "noisy": 0.3, "q1_end_repeat": 0.0}
    import json

    line = json.loads(b._stdout_line(t, 3.0, 0.1, nb))
    # only rows whose spread exceeds 25% of min AND 0.1s absolute
    assert line["noise_band"] == {"noisy": 0.3}
    # the band OUTLIVES query elision when the budget tightens — an
    # elided noisy row keeps its band (adjudication data beats
    # completeness; the detail file has the elided timings)
    t_many = {f"q{i:02d}": 1.0 for i in range(30)}
    t_many["q1_pricing_summary"] = 1.0
    t_many["noisy"] = 0.4
    nb_many = {"noisy": 0.3}
    full = b._stdout_line(t_many, 31.0, 0.1, nb_many)
    os.environ["SPARK_GRAFT_LINE_BUDGET"] = str(len(full) - 60)
    try:
        b2 = _load_bench()
        line2 = json.loads(b2._stdout_line(t_many, 31.0, 0.1, nb_many))
        assert line2.get("noise_band") == {"noisy": 0.3}
        assert line2.get("elided", 0) >= 1
        assert "noisy" not in line2["queries"]  # elided fastest-first...
    finally:
        del os.environ["SPARK_GRAFT_LINE_BUDGET"]


def test_stdout_band_caps_at_eight_noisiest():
    b = _load_bench()
    t = {f"q{i}": 1.0 for i in range(20)}
    t["q1_pricing_summary"] = 1.0
    nb = {f"q{i}": 0.3 + 0.01 * i for i in range(20)}
    import json

    line = json.loads(b._stdout_line(t, 21.0, 0.1, nb))
    band = line["noise_band"]
    assert len(band) == 8
    # the eight with the largest relative band survive (q12..q19)
    assert set(band) == {f"q{i}" for i in range(12, 20)}


def test_stdout_line_carries_host_factor():
    import json

    import bench as b

    t = {"q1_pricing_summary": 0.3, "x": 1.0, "q1_end_repeat": 0.3}
    line = json.loads(b._stdout_line(t, 1.6, 0.1, {}, host_factor=1.59))
    assert line["host_factor_vs_gate"] == 1.59
    # omitted (not null) when probes were unavailable
    line2 = json.loads(b._stdout_line(t, 1.6, 0.1, {}, host_factor=None))
    assert "host_factor_vs_gate" not in line2


# ---- gate-record provenance guard (_resolve_detail_name) ----


def test_lower_trials_run_diverts_from_gate_record(tmp_path):
    """A trials=2 run must NOT overwrite a committed trials=3 gate
    record (round-16 incident) — it diverts to a t-suffixed sidecar."""
    import json

    b = _load_bench()
    b.SF_DIR = "/root/testdata/sf0.1"  # gate-scale run
    (tmp_path / "bench_detail.json").write_text(json.dumps({"trials": 3}))
    assert (
        b._resolve_detail_name(0.1, 2, str(tmp_path))
        == "bench_detail_t2.json"
    )
    # equal or higher trials may replace the record (fresher wins)
    assert b._resolve_detail_name(0.1, 3, str(tmp_path)) == "bench_detail.json"
    assert b._resolve_detail_name(0.1, 4, str(tmp_path)) == "bench_detail.json"


def test_guard_ignores_missing_or_unstamped_records(tmp_path):
    import json

    b = _load_bench()
    b.SF_DIR = "/root/testdata/sf0.1"
    # no record at all → write the gate record
    assert b._resolve_detail_name(0.1, 2, str(tmp_path)) == "bench_detail.json"
    # corrupt record → nothing adjudicable lost, overwrite allowed
    (tmp_path / "bench_detail.json").write_text("{not json")
    assert b._resolve_detail_name(0.1, 2, str(tmp_path)) == "bench_detail.json"
    # unstamped (pre-guard) record → any stamped run may replace it
    (tmp_path / "bench_detail.json").write_text(json.dumps({"value": 1.0}))
    assert b._resolve_detail_name(0.1, 2, str(tmp_path)) == "bench_detail.json"


def test_guard_never_applies_off_gate_scale(tmp_path):
    import json

    b = _load_bench()
    b.SF_DIR = "/root/testdata/sf0.01"
    (tmp_path / "bench_detail.json").write_text(json.dumps({"trials": 3}))
    # non-gate SF has its own sidecar; the guard is gate-record-only
    assert (
        b._resolve_detail_name(0.01, 2, str(tmp_path))
        == "bench_detail_sf0.01.json"
    )


def test_stdout_line_announces_guard_divert():
    b = _load_bench()
    line = b._stdout_line(
        {"q1_pricing_summary": 0.3}, 0.3, 0.1,
        detail_name="bench_detail_t2.json",
    )
    import json

    payload = json.loads(line)
    assert payload["detail"] == "bench_detail_t2.json"
    assert payload["guard_diverted"] is True


def test_stdout_line_quiet_when_record_not_diverted():
    b = _load_bench()
    b.SF_DIR = "/root/testdata/sf0.1"
    line = b._stdout_line(
        {"q1_pricing_summary": 0.3}, 0.3, 0.1,
        detail_name="bench_detail.json",
    )
    import json

    payload = json.loads(line)
    assert "guard_diverted" not in payload


# ---- stable stdout elision (round 19) ----


def test_elision_set_is_stable_across_speed_orderings():
    """The elided SET must not rotate with per-run speed ordering: two
    runs whose only difference is which queries happened to be fastest
    elide the same names (non-keep first, alphabetical), so a
    cross-round stdout diff never manufactures dropped/new lines."""
    import json

    b = _load_bench()
    keep = sorted(b._STDOUT_KEEP)[:20]
    extra = [f"zz_extra_{i:02d}" for i in range(20)]
    run1 = {k: 1.0 + i * 0.01 for i, k in enumerate(keep + extra)}
    run2 = {k: 2.0 - i * 0.01 for i, k in enumerate(keep + extra)}
    run1["q1_pricing_summary"] = run2["q1_pricing_summary"] = 0.3
    full = b._stdout_line(run1, 50.0, 0.1, {})
    os.environ["SPARK_GRAFT_LINE_BUDGET"] = str(len(full) - 200)
    try:
        b2 = _load_bench()
        kept1 = set(json.loads(b2._stdout_line(run1, 50.0, 0.1, {}))["queries"])
        kept2 = set(json.loads(b2._stdout_line(run2, 50.0, 0.1, {}))["queries"])
    finally:
        del os.environ["SPARK_GRAFT_LINE_BUDGET"]
    assert kept1 == kept2  # identical SET despite opposite speed order
    # non-keep names elide before any keep-list member
    assert all(k in kept1 for k in keep)


def test_stdout_line_carries_n_queries_total():
    import json

    b = _load_bench()
    t = {"q1_pricing_summary": 0.3, "x": 1.0, "q1_end_repeat": 0.3}
    line = json.loads(b._stdout_line(t, 1.6, 0.1, {}))
    assert line["n_queries_total"] == 3
