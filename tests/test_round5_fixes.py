"""Round-5 fixes: the driver-parseable compact bench line (VERDICT r4
"What's wrong" #1 — BENCH_r04.json landed with parsed=null because the
one-line JSON outgrew the driver's ~2000-char stdout tail)."""

from __future__ import annotations

import json

import bench


def _detail(n_queries: int = 22) -> dict:
    qs = {f"query_name_number_{i:02d}": 3.417 for i in range(n_queries)}
    return {
        "metric": "m",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "sf": "0.1",
        "queries": qs,
        "validation": {
            "rows": 8_000_000,
            "peak_sequences_per_sec": 294_800.5,
            "local[1]": {"sequences_per_sec": 81_400.2},
            "local[4]": {"sequences_per_sec": 294_800.5},
            "scaling_efficiency_raw": 0.884,
            "speedup_cross_pair_minima": 3.621,
            "scaling_efficiency_vs_host_ceiling": 0.884,
            "convergence": {"pairs_converged": 3},
        },
    }


def test_compact_line_fits_driver_tail_and_carries_gate_scalars():
    line = bench._compact_line(_detail(), 1, 4)
    assert len(line) < 1800, len(line)  # driver tail buffer is ~2000
    parsed = json.loads(line)
    # the five scaling scalars the verdict demands, machine-readable
    assert parsed["scaling_efficiency_raw"] == 0.884
    assert parsed["speedup_cross_pair_minima"] == 3.621
    assert parsed["scaling_efficiency_vs_host_ceiling"] == 0.884
    assert parsed["peak_sequences_per_sec"] == 294_800.5
    assert parsed["pairs_converged"] == 3
    # plus the suite total and the full per-query dict
    assert parsed["value"] == _detail()["value"]
    assert len(parsed["queries"]) == 22
    assert parsed["seq_per_sec"] == {"local[1]": 81_400.2, "local[4]": 294_800.5}


def test_compact_line_truncates_runaway_query_dict_instead_of_overflowing():
    line = bench._compact_line(_detail(n_queries=80), 1, 4)
    assert len(line) < 1800
    parsed = json.loads(line)
    assert parsed["queries_truncated_see_detail"] is True
    assert len(parsed["queries"]) == 15
    # scalars survive truncation
    assert parsed["scaling_efficiency_raw"] == 0.884
