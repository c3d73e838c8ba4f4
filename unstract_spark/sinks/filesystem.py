"""D1 — filesystem sink: per-file result artifacts.

Reference mirrors the per-file output tree into the connector's output
folder (destination.py:339-388). Spark-first: results land as a
partitioned dataset (one JSON per source file when partitioned by
file identity), written distributed — no driver-side upload loop.
T16 classification routing (per-bin output dirs,
tools/classifier/src/main.py) is the same write with
partitionBy(classification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_results_tree(
    results: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    fmt: str = "json",
) -> None:
    w = results.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    getattr(w, fmt)(path)


def route_by_classification(
    classified: DataFrame, path: str, class_col: str = "classification"
) -> None:
    """T16: group-by-key routing = partitioned write, one dir per bin."""
    classified.write.mode("overwrite").partitionBy(class_col).json(path)
