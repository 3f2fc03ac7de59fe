import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minigraph_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # small local session: 4 threads, 4 shuffle partitions — tests check
    # correctness; scale behavior is exercised by bench.py
    s = get_spark("minigraph-tests", master="local[4]", shuffle_partitions=4)
    yield s


def labels_dict(result_df, value_col="value"):
    return {r["vid"]: r[value_col] for r in result_df.select("vid", value_col).collect()}
