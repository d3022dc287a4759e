"""Every registered query must match its DuckDB oracle at the test SF.

This mirrors the driver's t2 gate (which runs at sf0.01) so breakage is
caught locally before a round ends.
"""

from __future__ import annotations

import pytest

from finance_etl_pipeline_spark.plans import all_queries
from tests.oracle_harness import compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    result = compare(spark, QUERIES[name], sf_dir)
    assert result["ok"], f"{name}: {result['detail']}"
