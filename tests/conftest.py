from __future__ import annotations

import pytest

from mapreduce6240project_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
    con.close()


def waterfill_reference(supplies: dict, budget: int) -> dict:
    """Shared max-min fair (waterfilling) reference implementation used
    by test_wave103 and test_properties_waterfill -- one copy so the
    two suites cannot silently diverge (review finding)."""
    alloc = {s: 0 for s in supplies}
    live = dict(supplies)
    b = budget
    while live:
        share = b // len(live)
        served = {s: n for s, n in live.items() if n <= share}
        if not served:
            order = sorted(live, key=lambda s: (live[s], s))
            rem = b - share * len(live)
            for j, s in enumerate(order):
                alloc[s] = share + (1 if j < rem else 0)
            return alloc
        for s, n in served.items():
            alloc[s] = n
            b -= n
            del live[s]
    return alloc
