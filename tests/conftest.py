from __future__ import annotations

import pytest

from distributed_pagerank_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dps-tests",
        master="local[4]",
        shuffle_partitions=2,
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/dps-warehouse",
            # AQE off in tests: micro-graphs don't need runtime re-planning
            # and it adds per-query latency to 70-iteration loops.
            "spark.sql.adaptive.enabled": "false",
        },
    )
    yield s


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs], "src long, dst long"
    )


# Micro fixtures (FIXTURES.md §2)
CHAIN5 = [(0, 1), (1, 2), (2, 3), (3, 4)]
CYCLE4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
STAR_IN = [(1, 0), (2, 0), (3, 0), (4, 0)]
STAR_OUT = [(0, 1), (0, 2), (0, 3), (0, 4)]
TWO_COMPONENTS = [(0, 1), (1, 0), (2, 3), (3, 2)]
DANGLING_PAIR = [(0, 1)]
DUP_EDGES = [(0, 1), (0, 1), (1, 2)]
SELF_LOOP = [(0, 0), (0, 1), (1, 0)]
TRIANGLE_PLUS = [
    (0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0), (2, 3),
]

ALL_FIXTURES = {
    "chain5": CHAIN5,
    "cycle4": CYCLE4,
    "star_in": STAR_IN,
    "star_out": STAR_OUT,
    "two_components": TWO_COMPONENTS,
    "dangling_pair": DANGLING_PAIR,
    "dup_edges": DUP_EDGES,
    "self_loop": SELF_LOOP,
    "triangle_plus": TRIANGLE_PLUS,
}
