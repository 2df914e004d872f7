"""Full driver-gate replica as a pytest (opt-in: slow).

Run with ``SPARK_GRAFT_FULL=1 python -m pytest tests/test_oracle_gate.py`` to
execute every queries() entry against its DuckDB oracle at sf0.001 — exactly
what the driver does at sf0.01.
"""

from __future__ import annotations

import os

import pytest

from tests.oracle_check import run_all


@pytest.mark.skipif(os.environ.get("SPARK_GRAFT_FULL") != "1",
                    reason="slow full-gate check; set SPARK_GRAFT_FULL=1")
def test_all_queries_match_oracles():
    failures = run_all("/root/testdata/sf0.001")
    assert not failures, f"oracle mismatches: {failures}"
