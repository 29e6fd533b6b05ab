"""Every declared query must hash-match its DuckDB oracle (driver t2 twin).

Runs at sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tests.parity import compare_query

SF = "/root/testdata/sf0.001"

_QUERIES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", _QUERIES)
def test_oracle_parity(spark, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    problems = compare_query(spark, name, fn, sql, SF)
    assert not problems, "\n".join(problems)
