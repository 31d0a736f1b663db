#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>}

Each query is forced to FULL result materialization in the Python driver
via ``toPandas()`` — the same Arrow-batched transfer the correctness
harness uses (`scripts/drive_contract.py:60`), so bench wall = what the
harness pays. Not ``collect()``: that is row-at-a-time pickle and at
sf1 it costs 4-6x the query itself for full-result queries (~1.5M rows,
measured 8.7 s collect vs 2.4 s toPandas for kalshi_book_summary) —
billing that to the engine mis-attributes a driver-serialization
artifact; Arrow transfer is the distributed-engine-correct way to hand
results to Python and is what any real consumer of these results uses.

Usage: python bench.py [--all] [--repeat N]
  --all     time every registered query, not just headline ones
  --repeat  best-of-N timing per query (default 2; first run pays JVM/JIT
            warmup, and per-query scan caching is cold each time because
            we do not cache() inputs)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import financial_arbitrage_data_pipeline_spark.operators  # noqa: F401  (populate REGISTRY)
from financial_arbitrage_data_pipeline_spark.plans import REGISTRY
from financial_arbitrage_data_pipeline_spark.session import get_spark


# Machine-calibration anchors (VERDICT r5 task 1). Two FIXED,
# data-independent micro-jobs are timed best-of-3 before the query loop;
# their wall time measures the machine the bench ran on, not the engine.
# The reference constants below were measured on the builder's idle
# local[32] box (the machine behind BENCH_local_r5.json's 7.39 s
# headline); `machine_factor` = measured/ref, and
# `value_normalized` = value / machine_factor restates the headline as
# if run on that box. A contended/slower driver machine shows
# machine_factor >> 1 with value_normalized stable across rounds; a real
# code regression shows value_normalized rising while machine_factor
# stays ~1. SCALE.md §9 documents how to read the fields.
_CALIB_CPU_REF_SEC = 0.19  # spark.range(5e8) fused sum, 32 threads
_CALIB_SHUFFLE_REF_SEC = 0.73  # 2e7 rows -> 200k-key hash agg -> 1 row


# The calibration probe is itself a measurement and r8's close runs
# proved it NOISIER than the thing it normalizes (raw 7.93/7.70 vs
# normalized 8.88/6.48 back-to-back). So (VERDICT r9 task 4) the factor
# is now the MEDIAN of >= 3 probes interleaved through the run
# (before / after the query loop / after the throughput anchors), the
# probe spread is recorded in the artifact, and when the probes' MAD
# exceeds PROBE_SPREAD_BOUND of their median the artifact carries
# normalization_reliable=false — readers adjudicate on the RAW headline
# plus the load fields in that case (SCALE.md §12).
PROBE_SPREAD_BOUND = 0.15


def _calib_probe(spark) -> dict:
    """One calibration probe: best-of-2 timings of two pinned micro-jobs
    — a whole-stage-codegen CPU burn (no shuffle, no Python) and a
    shuffle-heavy hash aggregation. Together they bracket the two
    resources the headline queries consume; neither touches the
    benchmarked data or code."""

    def cpu_job():
        spark.range(500_000_000).selectExpr(
            "sum(id * 3 + 1) as s"
        ).collect()

    def shuffle_job():
        (
            spark.range(20_000_000)
            .selectExpr("id % 200000 as k", "id")
            .groupBy("k")
            .agg({"id": "sum"})
            .selectExpr("sum(`sum(id)`) as s")
            .collect()
        )

    out = {}
    for key, job in (("cpu_sec", cpu_job), ("shuffle_sec", shuffle_job)):
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            job()
            runs.append(time.perf_counter() - t0)
        out[key] = round(min(runs), 4)
    ref = _CALIB_CPU_REF_SEC + _CALIB_SHUFFLE_REF_SEC
    out["factor"] = round((out["cpu_sec"] + out["shuffle_sec"]) / ref, 4)
    return out


def _calib_summary(probes: list[dict]) -> dict:
    """Median-of-probes machine factor + the spread that says whether
    the normalization is trustworthy this run."""
    import statistics

    factors = [p["factor"] for p in probes]
    med = statistics.median(factors)
    mad = statistics.median(abs(f - med) for f in factors)
    mad_frac = mad / max(med, 1e-9)
    return {
        "calib_probes": probes,
        "calib_ref_sec": round(_CALIB_CPU_REF_SEC + _CALIB_SHUFFLE_REF_SEC, 4),
        "machine_factor": round(med, 4),
        "machine_factor_mad": round(mad, 4),
        "machine_factor_mad_frac": round(mad_frac, 4),
        "normalization_reliable": mad_frac <= PROBE_SPREAD_BOUND,
    }


def _proc_tree_cpu_sec() -> float:
    """CPU-seconds consumed so far by this process and EVERY descendant
    (the local-mode JVM, its Python workers, the streaming maintenance
    threads) — utime+stime of live descendants plus cutime+cstime for
    already-reaped ones. Deltas of this counter around a query are
    load-INSENSITIVE: a co-tenant burst stretches wall but not CPU
    consumed, so cpu_sec is the field that makes a round-over-round
    regression unambiguous when normalization_reliable=false
    (VERDICT r10 task 7). /proc-based; returns -1 on non-procfs hosts."""
    try:
        clk = os.sysconf("SC_CLK_TCK")
        stats: dict[int, tuple[int, float]] = {}
        for p in os.listdir("/proc"):
            if not p.isdigit():
                continue
            try:
                with open(f"/proc/{p}/stat") as fh:
                    s = fh.read()
            except OSError:
                continue  # raced a process exit
            try:
                rest = s[s.rindex(")") + 2 :].split()
                ppid = int(rest[1])
                # utime+stime (own) + cutime+cstime (reaped descendants)
                cpu = (int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])) / clk
            except (ValueError, IndexError):
                continue  # truncated stat line from a process dying mid-read
            stats[int(p)] = (ppid, cpu)
        children: dict[int, list[int]] = {}
        for pid, (ppid, _) in stats.items():
            children.setdefault(ppid, []).append(pid)
        total, stack, seen = 0.0, [os.getpid()], set()
        while stack:
            pid = stack.pop()
            if pid in seen or pid not in stats:
                continue
            seen.add(pid)
            total += stats[pid][1]
            stack.extend(children.get(pid, []))
        return total
    except (OSError, ValueError):  # pragma: no cover - non-procfs host
        return -1.0


def _contention_snapshot() -> dict:
    """Host contention at a point in time (VERDICT r7 task 1): the 1/5/15
    minute load averages plus the number of OTHER live processes on the
    box. machine_factor calibrates sustained slowdown but cannot separate
    'this machine is slower' from 'co-tenants burst mid-run'; recording
    load alongside the walls lets a regression be pinned to measured
    contention instead of argued."""
    la = os.getloadavg()
    try:
        n_procs = sum(1 for p in os.listdir("/proc") if p.isdigit())
    except OSError:  # pragma: no cover - non-procfs host
        n_procs = -1
    return {
        "load_1m": round(la[0], 2),
        "load_5m": round(la[1], 2),
        "load_15m": round(la[2], 2),
        "n_procs": n_procs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="bench every query")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="bench")

    names = sorted(
        name for name, spec in REGISTRY.items() if args.all or spec.headline
    )

    # one warmup action so JVM startup / codegen compilation is not billed
    # to the first query
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    load_start = _contention_snapshot()
    probes = [_calib_probe(spark)]

    import statistics

    # Adaptive repeats (VERDICT r6 task 3): the n=2 best-of harness
    # recorded per-query stddevs larger than the walls it measured
    # (minhash_lsh_dedup 3.80 s). A query whose spread exceeds
    # SPREAD_TARGET of its median keeps re-running (to MAX_RUNS) until
    # the median is interpretable; median+MAD are reported alongside
    # best so a reader can tell signal from scheduler noise.
    SPREAD_TARGET = 0.20
    MAX_RUNS = 7
    # Contention-control (VERDICT r7 task 1): per-query spread control is
    # not enough — BENCH_r07's regression was a UNIFORM drift that left
    # every per-query MAD small while the total moved 22%. After the
    # per-query loops, keep re-running the widest-spread queries until
    # the TOTAL spread (sum of per-query MADs over sum of medians) is
    # within TOTAL_SPREAD_TARGET, bounded by EXTRA_RUN_BUDGET.
    TOTAL_SPREAD_TARGET = 0.10
    EXTRA_RUN_BUDGET = 20

    all_runs: dict[str, list[float]] = {}
    all_cpu: dict[str, list[float]] = {}

    def one_run(name: str) -> None:
        c0 = _proc_tree_cpu_sec()
        t0 = time.perf_counter()
        REGISTRY[name].builder(spark, sf_dir).toPandas()
        all_runs[name].append(time.perf_counter() - t0)
        c1 = _proc_tree_cpu_sec()
        if c0 >= 0 and c1 >= 0:
            all_cpu.setdefault(name, []).append(c1 - c0)
        # Measurement fix (r13, VERDICT r12 item 4): queries that persist
        # an intermediate (the dedup family) left it registered in
        # Spark's CacheManager, so every repeat run of the identical
        # plan hit the previous run's cache and best-of-N reported a
        # WARM number (r12 minhash: cold ~6 s, reported 0.71 s).
        # Dropping the cache between runs makes every timed run compute
        # from the parquet inputs — min(runs) is now a cold statistic.
        # The clear itself is outside the timed region.
        spark.catalog.clearCache()

    def med_mad(runs: list[float]) -> tuple[float, float]:
        med = statistics.median(runs)
        return med, statistics.median(abs(r - med) for r in runs)

    for name in names:
        all_runs[name] = []
        for _ in range(max(1, args.repeat)):
            one_run(name)
        med, mad = med_mad(all_runs[name])
        while len(all_runs[name]) < MAX_RUNS and mad > SPREAD_TARGET * med:
            one_run(name)
            med, mad = med_mad(all_runs[name])

    extra = 0
    while extra < EXTRA_RUN_BUDGET:
        stats = {n: med_mad(r) for n, r in all_runs.items()}
        total_med = sum(m for m, _ in stats.values())
        total_mad = sum(d for _, d in stats.values())
        if total_mad <= TOTAL_SPREAD_TARGET * total_med:
            break
        widest = max(stats, key=lambda n: stats[n][1])
        one_run(widest)
        extra += 1

    timings: dict[str, float] = {}
    cpu_secs: dict[str, float] = {}
    spreads: dict[str, dict[str, float]] = {}
    for name in names:
        runs = all_runs[name]
        med, mad = med_mad(runs)
        timings[name] = round(min(runs), 4)
        if all_cpu.get(name):
            # median CPU-seconds across runs: load-insensitive cost —
            # the adjudication field when wall normalization is flagged
            cpu_secs[name] = round(statistics.median(all_cpu[name]), 4)
        mean = sum(runs) / len(runs)
        sd = (sum((r - mean) ** 2 for r in runs) / len(runs)) ** 0.5
        spreads[name] = {
            "mean": round(mean, 4),
            "median": round(med, 4),
            "mad": round(mad, 4),
            "stddev": round(sd, 4),
            "n": len(runs),
        }
    load_after_queries = _contention_snapshot()
    probes.append(_calib_probe(spark))  # mid-run probe (after query loop)

    # Ingest throughput, apples-to-apples with the reference's headline
    # number (~93 msg/s sustained, BASELINE.md): run the real storage
    # lane (replay source -> P1/P2 enrichment -> partitioned append,
    # availableNow) over the events table and report rows/sec.
    import shutil
    import tempfile

    from financial_arbitrage_data_pipeline_spark.streaming import ingest

    # best-of-repeat like the queries: the lane has seconds of fixed
    # micro-batch/checkpoint overhead over sf-scale row counts, so a
    # single measurement is noise-dominated (observed 18k-46k rows/s
    # across back-to-back runs at sf0.1)
    ingest_rps = 0.0
    scan_rps = 0.0
    # Per-anchor CPU-seconds (VERDICT r11 task 1): the r11 gate/scan
    # anchor dip could not be adjudicated because the anchors recorded
    # only wall-derived rates; a co-tenant burst stretches wall but not
    # CPU. Record the MIN process-tree cpu_sec across repeats (min =
    # least polluted by concurrent maintenance threads) so round-over-
    # round anchor moves can be pinned to load vs a real regression.
    anchor_cpu: dict[str, float] = {}

    def _note_cpu(key: str, c0: float, c1: float) -> None:
        if c0 >= 0 and c1 >= 0:
            prev = anchor_cpu.get(key)
            cur = round(c1 - c0, 4)
            anchor_cpu[key] = cur if prev is None else min(prev, cur)

    from financial_arbitrage_data_pipeline_spark.streaming import scan as sscan

    for _ in range(max(1, args.repeat)):
        work = tempfile.mkdtemp(prefix="sgbench_ingest_")
        try:
            replay_dir = os.path.join(work, "replay")
            n_rows = ingest.write_replay_chunks(spark, sf_dir, replay_dir, n_chunks=4)
            c0 = _proc_tree_cpu_sec()
            t0 = time.perf_counter()
            q = ingest.start_storage_lane(
                ingest.enrich_snapshots(ingest.replay_stream(spark, replay_dir)),
                os.path.join(work, "snap"),
                os.path.join(work, "ckpt"),
            )
            q.awaitTermination()
            ingest_sec = time.perf_counter() - t0
            _note_cpu("ingest", c0, _proc_tree_cpu_sec())
            ingest_rps = max(ingest_rps, round(n_rows / ingest_sec, 1))

            # the TRADING lane: the full stateful opportunity scan
            # (enrich → quotes → broadcast pair join → per-key state
            # fold → decision emissions) — the reference's end-to-end
            # detection path, same 93 msg/s baseline anchor
            c0 = _proc_tree_cpu_sec()
            t0 = time.perf_counter()
            q2 = sscan.start_scan_lane(
                sscan.opportunity_stream(
                    sscan.quotes_from_snapshots(
                        ingest.enrich_snapshots(ingest.replay_stream(spark, replay_dir))
                    ),
                    sscan.pair_universe(spark, sf_dir),
                ),
                os.path.join(work, "opps"),
                os.path.join(work, "scan_ckpt"),
            )
            q2.awaitTermination()
            scan_sec = time.perf_counter() - t0
            _note_cpu("scan", c0, _proc_tree_cpu_sec())
            scan_rps = max(scan_rps, round(n_rows / scan_sec, 1))
        finally:
            shutil.rmtree(work, ignore_errors=True)

    # Corpus-prep throughput anchor: docs/sec through the quality-gate
    # decision pass (pure-projection scan — the per-document cost floor
    # of the training-data pipeline family)
    from financial_arbitrage_data_pipeline_spark.operators.corpusprep import (
        corpus_quality_gate,
    )

    gate_rps = 0.0
    gate_docs = 0
    for _ in range(max(1, args.repeat)):
        c0 = _proc_tree_cpu_sec()
        t0 = time.perf_counter()
        n_docs = corpus_quality_gate(spark, sf_dir).count()
        _note_cpu("gate", c0, _proc_tree_cpu_sec())
        gate_docs = n_docs
        gate_rps = max(
            gate_rps, round(n_docs / (time.perf_counter() - t0), 1)
        )

    # Codec-lane throughput anchor: assets/sec through the REAL baseline
    # JPEG lane (synthesize entropy-coded bitstream -> binary column ->
    # full marker/Huffman/DPCM decode + IDCT, Arrow-batched mapInPandas)
    # — the per-asset cost floor of the multimodal family's slow path.
    from financial_arbitrage_data_pipeline_spark.operators.transcode import (
        jpeg_coeff_stats,
    )

    codec_rps = 0.0
    codec_assets = 0
    for _ in range(max(1, args.repeat)):
        c0 = _proc_tree_cpu_sec()
        t0 = time.perf_counter()
        n_assets = jpeg_coeff_stats(spark, sf_dir).count()
        _note_cpu("jpeg", c0, _proc_tree_cpu_sec())
        codec_assets = n_assets
        codec_rps = max(
            codec_rps, round(n_assets / (time.perf_counter() - t0), 1)
        )

    probes.append(_calib_probe(spark))  # final probe (after anchors)
    calib = _calib_summary(probes)

    contract = _contract_line(timings, cpu_secs, spreads, calib, sf_val)
    contract.update(
        {
            "gate_docs_per_sec": gate_rps,
            "jpeg_assets_per_sec": codec_rps,
            "ingest_rows_per_sec": ingest_rps,
            "scan_rows_per_sec": scan_rps,
            "reference_ingest_rows_per_sec": 93.0,
        }
    )
    # Diagnostics sidecar (r13, VERDICT r12 item 3): the one-line JSON
    # outgrew the driver's tail-capture window in r11 (BENCH_r11 parsed
    # null → no round-over-round PERF comparison), so the contract line
    # now carries only the driver-consumed fields and everything
    # diagnostic — spreads, probes, load snapshots, anchor cpu — lands
    # in a sidecar file next to the repo (override via
    # $SPARK_GRAFT_BENCH_SIDECAR).
    sidecar = {
        **contract,
        "value_medians_normalized": round(
            contract["value_medians"] / max(calib["machine_factor"], 1e-9), 4
        ),
        "total_mad": round(sum(s["mad"] for s in spreads.values()), 4),
        "total_mad_frac": round(
            sum(s["mad"] for s in spreads.values())
            / max(contract["value_medians"], 1e-9),
            4,
        ),
        "load_start": load_start,
        "load_after_queries": load_after_queries,
        **calib,
        "query_spreads": spreads,
        # load-insensitive anchor costs (VERDICT r11 task 1): min
        # process-tree cpu_sec per anchor + the cpu-based rate — the
        # adjudication channel when wall-derived rates move under load
        "anchor_cpu_sec": anchor_cpu,
        "gate_docs_per_cpu_sec": round(gate_docs / anchor_cpu["gate"], 1)
        if anchor_cpu.get("gate")
        else None,
        "jpeg_assets_per_cpu_sec": round(codec_assets / anchor_cpu["jpeg"], 1)
        if anchor_cpu.get("jpeg")
        else None,
        "ingest_rows_per_cpu_sec": round(n_rows / anchor_cpu["ingest"], 1)
        if anchor_cpu.get("ingest")
        else None,
        "scan_rows_per_cpu_sec": round(n_rows / anchor_cpu["scan"], 1)
        if anchor_cpu.get("scan")
        else None,
    }
    sidecar_path = os.environ.get(
        "SPARK_GRAFT_BENCH_SIDECAR",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_sidecar.json"
        ),
    )
    try:
        with open(sidecar_path, "w") as fh:
            json.dump(sidecar, fh, indent=1)
    except OSError:  # pragma: no cover - read-only checkout
        pass
    print(json.dumps(contract))


def _contract_line(
    timings: dict[str, float],
    cpu_secs: dict[str, float],
    spreads: dict[str, dict[str, float]],
    calib: dict,
    sf_val,
) -> dict:
    """The driver-consumed contract fields ONLY — this dict (plus the
    four scalar anchor rates) is what bench.py prints as its one JSON
    line. Keep it compact: the driver's tail-capture window is finite
    and an unparseable line costs the whole round-over-round comparison
    (tests/test_bench_contract.py pins the budget)."""
    total = round(sum(timings.values()), 4)
    total_medians = round(sum(s["median"] for s in spreads.values()), 4)
    return {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "value_normalized": round(
            total / max(calib["machine_factor"], 1e-9), 4
        ),
        # Robust headline (VERDICT r7 task 1): sum of per-query MEDIANS
        # next to best-of — the statistic that stayed monotone through
        # the r7 environmental drift while best-of moved 22%.
        "value_medians": total_medians,
        "machine_factor": calib["machine_factor"],
        "normalization_reliable": calib["normalization_reliable"],
        "queries": timings,
        "queries_cpu_sec": cpu_secs,
        "total_cpu_sec": round(sum(cpu_secs.values()), 4),
        "sf": sf_val,
    }


if __name__ == "__main__":
    main()
