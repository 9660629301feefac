"""Partitioning-invariance property: results must not depend on how the
data is split.

At 1000 executors the shuffle partition count is whatever the cluster
sets it to — a query whose result changes with it (double sums in
summation-sensitive order, unstable top-N ties) is wrong even if one
configuration happens to match the oracle.  DECIMAL money math and
explicit tie-breaks are the design guarantees; this test exercises them
by re-running representative queries under very different shuffle
partition counts and demanding identical rows.
"""

from __future__ import annotations

import pytest

from k_means_hadoop_spark import registry

CASES = [
    "q1_pricing_summary",     # decimal sums
    "q10_returned_items",     # top-20 cut with tie-break
    "q15_top_supplier",       # max-equality on decimal
    "a7_jaccard",             # contingency counts
    "dedup_exact",            # hash-groupBy
]


def rows_of(spark, name, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", CASES)
def test_shuffle_partition_invariance(spark, sf_dir, name):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    try:
        spark.conf.set(key, "3")
        low = rows_of(spark, name, sf_dir)
        spark.conf.set(key, "64")
        high = rows_of(spark, name, sf_dir)
    finally:
        spark.conf.set(key, before)
    assert low == high
