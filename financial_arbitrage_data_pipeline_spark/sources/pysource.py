"""A first-class PLUGGABLE Spark data source for the market feed, built
on Spark 4's Python DataSource API (`pyspark.sql.datasource`) — the
reference's Kalshi/Polymarket pollers (`virginia/api/data_feed.py`
poll-loop shape) re-expressed as something `spark.read.format(...)` can
plan against like parquet or Kafka:

- **Batch reader** (`MarketFeedDataSource.reader`): deterministic
  synthetic quote rows generated per InputPartition — Spark schedules
  one task per partition, so generation is distributed, not a driver
  loop.
- **Filter pushdown** (`pushFilters`): `source = '...'` equality and
  `ts_us` range predicates are absorbed INTO the generator (the rows are
  never produced), and Spark drops its post-scan Filter for them —
  plan-pinned in tests. Everything else is returned as residual.
- **Streaming reader** (`streamReader`): offset = row index; each
  micro-batch covers an index range, so replay from any committed offset
  regenerates identical rows — exactly the determinism contract the
  parquet-replay lanes rely on, now at the source-API level.
- **Line-protocol writer** (`LineProtocolDataSource.writer`): the
  reference's InfluxDB line-protocol export as a custom SINK — tasks
  write temp-named .lp shards and report them via WriterCommitMessage;
  only the driver-side commit() publishes a manifest naming the shards,
  so a failed/speculative task's file is never trusted (the same
  commit-protocol discipline as the parquet MERGE layer).

The feed formula is SQL-expressible, so the registry query
`pyds_market_feed` gets a full DuckDB value-hash oracle: a hash match
proves the whole plugin path — planning, partition scheduling, Python
row generation, Arrow transfer — byte-exact.

Scale notes: partitions are independent index ranges (embarrassingly
parallel, no skew); pushdown means a venue-filtered scan generates half
the rows instead of filtering them after; the stream reader's offsets
are plain dicts checkpointed by Spark, so recovery resumes mid-feed
without re-emitting committed ranges.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    WriterCommitMessage,
)

FEED_SCHEMA = (
    "ticker string, source string, ts_us long, yes_cents long, "
    "no_cents long, volume long"
)

_TS0 = 1_700_000_000_000_000  # feed epoch, µs


def feed_row(i: int) -> tuple:
    """The deterministic feed formula — mirrored 1:1 by the SQL oracle."""
    return (
        f"T{i % 500}",
        "kalshi" if i % 2 == 0 else "polymarket",
        _TS0 + i * 1000,
        (i * 17) % 100,
        100 - (i * 17) % 100,
        (i * 31) % 1000,
    )


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class _FeedReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_parts = int(options.get("n_partitions", 8))
        self.source_eq: str | None = None
        self.ts_lo: int | None = None
        self.ts_hi: int | None = None
        self.contradiction = False  # conflicting pushed equalities

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Absorb `source =` equality and `ts_us` range predicates.

        Duplicate predicates on the same column are INTERSECTED, not
        overwritten (ADVICE r5): `ts_us >= a AND ts_us >= b` keeps
        max(a, b), `ts_us < a AND ts_us < b` keeps min(a, b), and two
        conflicting `source =` equalities force the empty result.
        Overwriting would let Spark drop its post-scan Filter for a
        predicate the reader never actually applied — wrong results.
        """
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("source",):
                if self.source_eq is not None and self.source_eq != f.value:
                    self.contradiction = True  # s = a AND s = b, a != b
                else:
                    self.source_eq = f.value
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("ts_us",):
                v = int(f.value)
                self.ts_lo = v if self.ts_lo is None else max(self.ts_lo, v)
            elif isinstance(f, LessThan) and f.attribute == ("ts_us",):
                v = int(f.value)
                self.ts_hi = v if self.ts_hi is None else min(self.ts_hi, v)
            else:
                yield f  # residual: Spark evaluates it post-scan

    def partitions(self):
        per = max(1, self.n_rows // self.n_parts)
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator:
        """Vectorized: the whole partition is generated as NumPy arrays
        and handed to Spark as ONE Arrow RecordBatch — no per-row Python.
        ts_us = TS0 + i*1000 is monotone in i, so range predicates become
        index-range intersection; the venue equality becomes a parity
        mask. Rows the pushdown excludes are never materialized."""
        import numpy as np
        import pyarrow as pa

        lo, hi = partition.start, partition.end
        if self.contradiction:
            hi = lo  # conflicting pushed equalities: provably empty
        if self.ts_lo is not None:
            lo = max(lo, -(-(self.ts_lo - _TS0) // 1000))
        if self.ts_hi is not None:
            hi = min(hi, -(-(self.ts_hi - _TS0) // 1000))
        i = np.arange(lo, max(lo, hi), dtype=np.int64)
        if self.source_eq == "kalshi":
            i = i[i % 2 == 0]
        elif self.source_eq == "polymarket":
            i = i[i % 2 == 1]
        elif self.source_eq is not None:
            i = i[:0]  # unknown venue: pushed predicate matches nothing
        yes = (i * 17) % 100
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.char.add("T", (i % 500).astype(str))),
                pa.array(
                    np.where(i % 2 == 0, "kalshi", "polymarket").astype(object)
                ),
                pa.array(_TS0 + i * 1000),
                pa.array(yes),
                pa.array(100 - yes),
                pa.array((i * 31) % 1000),
            ],
            names=[
                "ticker", "source", "ts_us", "yes_cents", "no_cents", "volume",
            ],
        )


class _FeedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 10_000))
        self.rows_per_batch = int(options.get("rows_per_batch", 2_500))

    def initialOffset(self) -> dict:  # noqa: N802
        return {"index": 0}

    def latestOffset(self) -> dict:  # noqa: N802
        return {"index": self.n_rows}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["index"], end["index"]
        out = []
        while lo < hi:
            out.append(_RangePartition(lo, min(lo + self.rows_per_batch, hi)))
            lo += self.rows_per_batch
        return out

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield feed_row(i)

    def commit(self, end: dict) -> None:
        pass  # offsets are pure indices; nothing external to ack

    def stop(self) -> None:
        pass


class MarketFeedDataSource(DataSource):
    """`spark.read.format("market_feed")` / `spark.readStream.format(...)`."""

    @classmethod
    def name(cls) -> str:
        return "market_feed"

    def schema(self) -> str:
        return FEED_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _FeedReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:  # noqa: N802
        return _FeedStreamReader(self.options)


# ---------------------------------------------------------------------------
# Line-protocol SINK as a custom writer
# ---------------------------------------------------------------------------


@dataclass
class _LpCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class _LineProtocolWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool = False) -> None:
        self.path = options["path"]
        self.measurement = options.get("measurement", "quotes")
        self.overwrite = overwrite

    def write(self, rows: Iterator) -> _LpCommit:
        """Runs on executors: one temp-named shard per task. The shard is
        not trusted until commit() lists it in the manifest."""
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.lp"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for r in rows:
                d = r.asDict()
                fh.write(
                    f"{self.measurement},ticker={d['ticker']},source={d['source']} "
                    f"yes={d['yes_cents']}i,no={d['no_cents']}i,"
                    f"volume={d['volume']}i {d['ts_us'] * 1000}\n"
                )
                n += 1
        return _LpCommit(filename=name, n_rows=n)

    def commit(self, messages, batch_id=None) -> None:
        """Driver-side: publish the manifest naming exactly the committed
        shards — aborted/speculative tasks' files are never listed.

        Readers must trust only _MANIFEST.json, never a bare ``*.lp``
        glob. In overwrite mode (ADVICE r5) the manifest is replaced
        wholesale; in append mode (ADVICE r6) the prior manifest's
        entries are MERGED in, so a second save cannot silently drop
        previously committed files from manifest-trusting readers. After
        the manifest swap, every ``*.lp`` not in the (merged) manifest
        is swept unconditionally — such a file is either an aborted
        task's orphan or an overwritten generation, never legitimately
        referenced.
        """
        committed = sorted(m.filename for m in messages)
        n_rows = sum(m.n_rows for m in messages)
        manifest_p = os.path.join(self.path, "_MANIFEST.json")
        if not self.overwrite and os.path.exists(manifest_p):
            try:
                with open(manifest_p) as fh:
                    prior = json.load(fh)
            except (OSError, json.JSONDecodeError):
                prior = {}
            committed = sorted(set(prior.get("files", ())) | set(committed))
            n_rows += int(prior.get("rows", 0))
        manifest = {"files": committed, "rows": n_rows}
        tmp = os.path.join(self.path, "_manifest.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, manifest_p)
        keep = set(committed)
        for name in os.listdir(self.path):
            if name.endswith(".lp") and name not in keep:
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass

    def abort(self, messages, batch_id=None) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class LineProtocolDataSource(DataSource):
    """`df.write.format("line_protocol").option("path", ...).save()`."""

    @classmethod
    def name(cls) -> str:
        return "line_protocol"

    def schema(self) -> str:
        return FEED_SCHEMA

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _LineProtocolWriter(self.options, overwrite=overwrite)


def register(spark) -> None:
    """Idempotently register both plugin data sources on a session."""
    spark.dataSource.register(MarketFeedDataSource)
    spark.dataSource.register(LineProtocolDataSource)
