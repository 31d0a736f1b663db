"""Pin the bench contract line's size and shape (r13, VERDICT r12 item 3).

BENCH_r11's one-line JSON outgrew the driver's tail-capture window
(`parsed: null`), which cost the whole round-over-round PERF comparison.
The contract line now carries only the driver-consumed fields; the
diagnostics live in a sidecar file. These tests pin (a) the required
keys, (b) a conservative byte budget for the headline-mode line, and
(c) that diagnostics stay OUT of the line.
"""

from __future__ import annotations

import importlib.util
import json
import os

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _bench_module():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fabricated_line(n_queries: int = 10) -> dict:
    bench = _bench_module()
    names = [f"headline_query_name_{i:02d}" for i in range(n_queries)]
    timings = {n: 12.3456 for n in names}
    cpu = {n: 123.4567 for n in names}
    spreads = {
        n: {"mean": 1.0, "median": 12.3456, "mad": 0.1234, "stddev": 0.5, "n": 7}
        for n in names
    }
    calib = {"machine_factor": 1.2345, "normalization_reliable": False}
    line = bench._contract_line(timings, cpu, spreads, calib, 0.1)
    # main() appends the four anchor rates + the reference constant
    line.update(
        {
            "gate_docs_per_sec": 39575.9,
            "jpeg_assets_per_sec": 2130.2,
            "ingest_rows_per_sec": 53036.2,
            "scan_rows_per_sec": 20907.6,
            "reference_ingest_rows_per_sec": 93.0,
        }
    )
    return line


def test_contract_line_has_driver_fields():
    line = _fabricated_line()
    for key in ("metric", "value", "unit", "queries", "sf", "queries_cpu_sec"):
        assert key in line, key
    assert line["unit"] == "sec"
    assert len(line["queries"]) == 10


def test_contract_line_under_size_budget():
    # The r11 line that failed to parse was ~2.7 kB of spreads/probes/
    # loads on top of the contract fields. Budget the contract line at
    # 2 kB with padded 21-char query names — real names are shorter, so
    # the emitted line sits well under the driver's capture window.
    raw = json.dumps(_fabricated_line())
    assert len(raw) < 2000, f"contract line {len(raw)} bytes"


def test_diagnostics_not_in_contract_line():
    line = _fabricated_line()
    for key in (
        "query_spreads",
        "calib_probes",
        "load_start",
        "load_after_queries",
        "anchor_cpu_sec",
        "machine_factor_mad",
    ):
        assert key not in line, f"diagnostic field {key} belongs in the sidecar"
