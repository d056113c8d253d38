"""Every registered query vs its DuckDB oracle at sf0.001 (driver replica).

The driver runs the same comparison at sf0.01; this is the fast local gate.
Queries with float-sensitive aggregates can opt into tolerance via
FLOAT_TOLERANT below.
"""

import pytest

from tests.oracle_harness import check_query
from time_sift_spark.queries import REGISTRY

FLOAT_TOLERANT: set[str] = set()  # names compared with isclose instead of ==


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, sf_dir, name):
    problems = check_query(spark, name, sf_dir, float_exact=name not in FLOAT_TOLERANT)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
