"""Pins for bench.py's cross-round self-check baseline loader.

The per-query self-check (VERDICT r10 #2) is only as good as the
committed history it reads: a mis-parsed artifact silently disables
the re-race policy (degrades safe, but blind), while a wrongly-merged
one re-races everything on noise. These tests pin the three load
paths against hand-built artifacts: a clean driver artifact, a
HEAD-TRUNCATED one (the driver keeps the LAST 2000 bytes of output —
BENCH_r10.json shipped without its opening ``{"metric``), and the
full-registry sidecar, plus the foreign-sf and latest-wins rules.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _median_ratio, prior_per_query  # noqa: E402


def _driver_artifact(payload: dict, truncate_head: int = 0) -> dict:
    """Wrap a bench line the way the round driver records it: the
    printed JSON line inside a ``tail`` string, optionally with its
    head cut (the driver's capture keeps the last 2000 bytes)."""
    line = json.dumps(payload, separators=(",", ":"))
    return {"n": 1, "rc": 0, "tail": line[truncate_head:], "parsed": None}


def test_latest_wins_across_rounds(tmp_path):
    for rnd, val in ((3, 1.0), (7, 2.0)):
        (tmp_path / f"BENCH_r{rnd:02d}.json").write_text(
            json.dumps(
                _driver_artifact(
                    {"metric": "t", "queries": {"q_a": val}, "sf": 0.1}
                )
            )
        )
    merged, newest, name = prior_per_query(str(tmp_path), 0.1)
    assert merged == {"q_a": 2.0}
    assert newest == {"q_a": 2.0}
    assert name == "BENCH_r07.json"


def test_head_truncated_artifact_recovers_queries(tmp_path):
    payload = {
        "metric": "total_query_wall_sec",
        "value": 9.9,
        "queries": {"q_a": 0.5, "q_b": 1.25},
        "sf": 0.1,
    }
    # cut into the middle of "metric": the JSON no longer parses, but
    # the flat queries map and the top-level sf survive verbatim
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps(_driver_artifact(payload, truncate_head=10))
    )
    merged, newest, _ = prior_per_query(str(tmp_path), 0.1)
    assert merged == {"q_a": 0.5, "q_b": 1.25}
    assert newest == merged


def test_truncation_inside_queries_map_degrades_to_nothing(tmp_path):
    payload = {"metric": "t", "queries": {"q_a": 0.5, "q_b": 1.25}, "sf": 0.1}
    line = json.dumps(payload, separators=(",", ":"))
    cut = line.index('"q_b"')  # the '"queries":{' prefix itself is gone
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"tail": line[cut:], "parsed": None})
    )
    merged, newest, name = prior_per_query(str(tmp_path), 0.1)
    assert merged == {} and newest == {} and name == ""


def test_foreign_sf_artifacts_are_excluded(tmp_path):
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps(
            _driver_artifact({"metric": "t", "queries": {"q_a": 9.0}, "sf": 0.01})
        )
    )
    merged, newest, name = prior_per_query(str(tmp_path), 0.1)
    assert merged == {} and newest == {} and name == ""


def test_sidecar_is_freshest_baseline_but_not_median_base(tmp_path):
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps(
            _driver_artifact({"metric": "t", "queries": {"q_a": 1.0}, "sf": 0.1})
        )
    )
    (tmp_path / "tools").mkdir()
    (tmp_path / "tools" / "bench_last_detail.json").write_text(
        json.dumps({"sf": 0.1, "queries_all": {"q_a": 0.4, "q_c": 2.0}})
    )
    merged, newest, name = prior_per_query(str(tmp_path), 0.1)
    # sidecar wins the self-check baseline (it is the most recent
    # committed measurement) and covers un-inlined queries ...
    assert merged == {"q_a": 0.4, "q_c": 2.0}
    # ... but the cross-round drift ratio stays anchored on the last
    # DRIVER artifact's window, so the stamped median compares round
    # against round, not run against run
    assert newest == {"q_a": 1.0} and name == "BENCH_r09.json"


def test_median_ratio_ignores_missing_and_rounds():
    assert _median_ratio({"a": 2.0, "b": 1.0}, {"a": 1.0, "b": 1.0, "z": 5}) == 1.5
    assert _median_ratio({}, {"a": 1.0}) is None


def test_per_config_sidecars_coexist_and_same_config_wins(tmp_path):
    """VERDICT r11 #1/#4: one sidecar slot per (cpus, sf) — an 8-core
    run's detail file no longer clobbers the 32-core run's, and the
    self-check baseline prefers the same-config slot over the legacy
    single slot."""
    from bench import _detail_name

    assert _detail_name(32, 0.1) != _detail_name(8, 0.1)
    assert _detail_name(32, 0.1) != _detail_name(32, 0.01)

    (tmp_path / "tools").mkdir()
    (tmp_path / "tools" / "bench_last_detail.json").write_text(
        json.dumps({"sf": 0.1, "queries_all": {"q_a": 9.0, "q_b": 1.0}})
    )
    (tmp_path / "tools" / _detail_name(32, 0.1)).write_text(
        json.dumps({"sf": 0.1, "cpus": 32, "queries_all": {"q_a": 0.5}})
    )
    (tmp_path / "tools" / _detail_name(8, 0.1)).write_text(
        json.dumps({"sf": 0.1, "cpus": 8, "queries_all": {"q_a": 7.0}})
    )
    merged, _newest, _name = prior_per_query(str(tmp_path), 0.1, cpus=32)
    # same-config slot wins q_a; legacy still covers q_b; the 8-core
    # slot is untouched on disk and never consulted at cpus=32
    assert merged == {"q_a": 0.5, "q_b": 1.0}
    merged8, _n, _m = prior_per_query(str(tmp_path), 0.1, cpus=8)
    assert merged8 == {"q_a": 7.0, "q_b": 1.0}
    # cpus omitted → legacy behavior only
    merged_none, _n, _m = prior_per_query(str(tmp_path), 0.1)
    assert merged_none == {"q_a": 9.0, "q_b": 1.0}
