"""The local correctness gate: every registered query with an oracle
must match DuckDB bit-for-bit (after the query's own rounding) at the
smoke scale; a marked subset also runs at the driver's gate scale.

Mirrors the driver's t2 comparison (see tests/parity.py).
"""

from __future__ import annotations

import pytest

from pymongo_change_stream_reader_spark.queries import load_all
from tests.conftest import SF_GATE, SF_SMOKE
from tests.parity import compare

SPECS = load_all()
WITH_ORACLE = sorted(name for name, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(name for name, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_parity_smoke(spark, duck, name):
    spec = SPECS[name]
    con = duck(SF_SMOKE)
    ok, msg = compare(spec.spark(spark, SF_SMOKE), con.sql(spec.oracle))
    assert ok, f"{name}: {msg}"


@pytest.mark.gate
@pytest.mark.parametrize("name", WITH_ORACLE)
def test_parity_gate_sf001(spark, duck, name):
    """Driver-scale parity (sf0.01) — slower; run with -m gate."""
    spec = SPECS[name]
    con = duck(SF_GATE)
    ok, msg = compare(spec.spark(spark, SF_GATE), con.sql(spec.oracle))
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle must still execute and return rows."""
    df = SPECS[name].spark(spark, SF_SMOKE)
    assert df.count() >= 0
