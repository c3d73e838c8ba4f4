"""Contract checks for the driver-facing registry (cheap, no oracle —
the heavy compare lives in tools/check_correctness.py / the driver)."""

import __spark_entry__ as entrymod


def test_registry_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 35
    assert set(oracles) <= set(qs)


def test_entry_runs_with_stable_schema(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]


def test_every_query_runs_at_smallest_sf(spark, sf_dir):
    failures = []
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e)[:100]))
    assert not failures, failures
