"""Local replica of the driver's Spark-vs-DuckDB comparison: row count,
column-name set, and an order-insensitive value comparison. Stricter than
the driver in one way — we compare actual values (exact for non-floats,
tight tolerance for floats) so any mismatch is debuggable locally."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pandas as pd


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        # exact-decimal discipline should make these bit-identical; round
        # to 9 significant-ish digits only to absorb float64 repr noise
        return float(f"{v:.12g}")
    if isinstance(v, Decimal):
        return float(f"{float(v):.12g}")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if hasattr(v, "item"):  # numpy scalar
        return _canon_cell(v.item())
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows, key=repr)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    # dtype *kind* must agree (int vs float) — the driver's value-hash is
    # unlikely to treat 44 and 44.0 as equal
    for c in spark_pdf.columns:
        sk, ok = spark_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind
        if "O" in (sk, ok):
            continue  # strings/objects/empty-result columns
        assert (sk == "f") == (ok == "f"), f"{name}.{c}: dtype kind {sk} vs {ok}"
    srows, orows = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"
