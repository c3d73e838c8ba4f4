"""Registry-wide physical-plan audit as a CI gate (r13 VERDICT item 9).

Explain-only (no execution): every registered query's physical plan is
checked for the scale anti-patterns tools/plan_audit.py greps for —
CartesianProduct, SortAggregate, global Sort, partition-less Window, and
BatchEvalPython (a row-at-a-time pickled Python UDF; the engine's Python
paths are Arrow-batched, so one appearing anywhere is a §4 regression
that the bench's 98-row subset would not necessarily catch).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402

from tools.plan_audit import audit_plan  # noqa: E402


def _audit(spark, sf_dir, names):
    from unstract_spark.queries import _REGISTRY

    failures = []
    for name in names:
        fn = _REGISTRY[name][0]
        try:
            df = fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            simple = spark._jvm.PythonSQLUtils.explainString(qe, "simple")
        except Exception as e:  # noqa: BLE001 — the audit must visit every query
            failures.append((name, f"ERR {str(e)[:120]}"))
            continue
        flags, _stats = audit_plan(simple)
        if flags:
            failures.append((name, "; ".join(flags)))
    assert not failures, failures


def test_bench_plans_free_of_scale_antipatterns(spark, sf_dir):
    """Fast-suite gate: the 98 bench rows (the perf surface)."""
    import bench

    _audit(spark, sf_dir, list(bench.BENCH_QUERIES))


@pytest.mark.slow
def test_registry_plans_free_of_scale_antipatterns(spark, sf_dir):
    """Full 292-row audit (~5.5 min: capstone builds execute their
    eager checkpoints) — slow set; the fast gate above covers the
    bench surface every run."""
    from unstract_spark.queries import _REGISTRY

    _audit(spark, sf_dir, list(_REGISTRY))
