"""Every registered query with an oracle must hash-match DuckDB — the
local twin of the driver's t2 gate, run at sf0.001 for speed."""

import pytest

from core_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE
from tests.oracle_check import compare

NAMES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.mark.parametrize("name", NAMES)
def test_oracle(spark, name):
    compare(spark, name, SF_SMOKE)
