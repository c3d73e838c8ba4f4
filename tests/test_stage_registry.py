"""Stage registry (the pluggable executor / tool-UDF surface):
registration contract, composition into one lineage, and the
mapInPandas tool plugin boundary.

Reference semantics: sdk1/execution/registry.py:1-112 (register/get by
name, duplicate = error, fresh instance per get), sdk1/tool/base.py
(one-file tool API -> our Arrow-batched UDTF contract).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from unstract_spark.plans import registry as R


def test_builtin_stages_listed():
    names = R.list_stages()
    for op in ("extract", "chunk", "classify", "evaluate", "summarize",
               "challenge", "json_repair"):
        assert op in names


def test_duplicate_registration_rejected():
    with pytest.raises(ValueError, match="already registered"):

        @R.register_stage("chunk")
        def second_chunk(**config):
            return lambda df: df

    # registry unchanged by the failed attempt
    assert "chunk" in R.list_stages()


def test_unknown_stage_lists_available():
    with pytest.raises(KeyError, match="Available:"):
        R.get_stage("no_such_op")


def test_compose_chunk_then_classify(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join executor " * 30),
            (2, "invoice payment total due " * 30),
        ],
        "doc_id long, text string",
    )
    pipeline = R.compose(
        ("chunk", {"chunk_size": 200, "chunk_overlap": 0}),
        (
            "classify",
            {
                "bins": {
                    "engineering": ["shuffle", "executor"],
                    "finance": ["invoice", "payment"],
                },
                "text_col": "chunk_text",
                "id_col": "doc_id",
            },
        ),
    )
    out = pipeline(docs)
    rows = out.collect()
    assert len(rows) > 2  # chunking fanned out before classification
    labels = {r.doc_id: {x.classification for x in rows if x.doc_id == r.doc_id}
              for r in rows}
    assert labels[1] == {"engineering"}
    assert labels[2] == {"finance"}


def test_tool_udf_contract(spark):
    """A pandas-batch tool registers as a stage and runs distributed
    with a declared schema — the §2.12 plugin boundary."""

    def shout(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "loud": pdf["text"].str.upper()}
            )

    R.register_tool_udf("shout_tool", shout, "doc_id long, loud string")
    try:
        docs = spark.createDataFrame(
            [(1, "quiet words"), (2, "more words")], "doc_id long, text string"
        )
        out = R.get_stage("shout_tool")(docs)
        assert out.schema.simpleString() == "struct<doc_id:bigint,loud:string>"
        got = {r.doc_id: r.loud for r in out.collect()}
        assert got == {1: "QUIET WORDS", 2: "MORE WORDS"}
    finally:
        R.unregister_stage("shout_tool")


def test_compose_is_single_lineage(spark):
    """Composition must not materialize between stages: the composed
    result is one plan (filter pushdown crosses the stage boundary)."""
    docs = spark.createDataFrame(
        [(i, f"text {i} " * 50) for i in range(10)], "doc_id long, text string"
    )
    pipeline = R.compose(("chunk", {"chunk_size": 100, "chunk_overlap": 0}))
    out = pipeline(docs).filter(F.col("doc_id") == 3)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the doc_id filter must appear in the single optimized plan —
    # proof there is no materialization wall between stages
    assert "doc_id" in plan and "3" in plan
