"""F8 variable replacement: static column path, custom-data plan-time
folding, dynamic HTTP vars with injected transport, stage sequencing."""

import pytest
from pyspark.sql import functions as F

from unstract_spark.operators.variables import (
    classify_variable,
    replace_prompt_variables,
    resolve_custom_data,
)
from unstract_spark.plans.fusion import plan_prompt_stages


def test_classify_variable_kinds():
    assert classify_variable("invoice_no") == "static"
    assert classify_variable("http://api.host/lookup[invoice_no]") == "dynamic"
    assert classify_variable("https://x.co/a/b[f]") == "dynamic"
    assert classify_variable("custom_data.client.name") == "custom_data"


def test_static_replacement_and_missing_left(spark):
    df = spark.createDataFrame(
        [(1, "INV-9", "ok"), (2, "", "ok"), (3, None, "ok")],
        "doc_id long, invoice_no string, other string",
    )
    out = {
        r.doc_id: r.prompt
        for r in replace_prompt_variables(
            df, "total for {{invoice_no}} and {{unknown_key}}"
        ).collect()
    }
    assert out[1] == "total for INV-9 and {{unknown_key}}"
    # empty / null outputs leave the marker (reference helper 27-54)
    assert out[2] == "total for {{invoice_no}} and {{unknown_key}}"
    assert out[3] == "total for {{invoice_no}} and {{unknown_key}}"


def test_custom_data_folds_at_plan_time(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    out = replace_prompt_variables(
        df,
        "client {{custom_data.client.name}} tier {{custom_data.tier}}",
        custom_data={"client": {"name": "Acme"}, "tier": 3},
    ).collect()
    assert out[0].prompt == "client Acme tier 3"
    with pytest.raises(ValueError, match="not found"):
        resolve_custom_data("missing.path", {"client": {}})
    with pytest.raises(ValueError, match="not configured"):
        resolve_custom_data("x", None)


def test_dynamic_http_with_fake_transport(spark):
    def fake_transport(url, data):
        if data == "boom":
            raise RuntimeError("endpoint 500")
        if url.endswith("/json"):
            return {"looked_up": data}
        return f"resp:{data}"

    df = spark.createDataFrame(
        [(1, "A-1"), (2, "A-2"), (3, "boom"), (4, None)],
        "doc_id long, invoice_no string",
    ).coalesce(1)
    out = {
        r.doc_id: r
        for r in replace_prompt_variables(
            df,
            "ctx {{http://api.host/txt[invoice_no]}} | {{http://api.host/json[invoice_no]}}",
            transport=fake_transport,
            backoff_s=0.001,
        ).collect()
    }
    assert out[1].prompt == 'ctx resp:A-1 | {"looked_up": "A-1"}'  # json.dumps'd
    assert out[2].prompt == 'ctx resp:A-2 | {"looked_up": "A-2"}'
    assert out[1].var_error is None
    # transport failure: row survives, marker stays, error recorded
    assert "RuntimeError" in out[3].var_error
    assert "{{http://api.host/txt[invoice_no]}}" in out[3].prompt
    # null field output: markers stay, no error (falsy -> skip)
    assert out[4].var_error is None and "{{http" in out[4].prompt


def test_dynamic_calls_memoized_per_task(spark):
    # a transport returning a fresh value per CALL: memoization makes
    # rows with the same data value share one response
    class CountingTransport:
        def __init__(self):
            self.n = 0

        def __call__(self, url, data):
            self.n += 1
            return f"call{self.n}"

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same")], "doc_id long, k string"
    ).coalesce(1)
    prompts = {
        r.doc_id: r.prompt
        for r in replace_prompt_variables(
            df, "v={{http://h/x[k]}}", transport=CountingTransport()
        ).collect()
    }
    assert len(set(prompts.values())) == 1  # one HTTP call served all rows


def test_dynamic_field_sequences_stages():
    specs = [
        {"prompt_key": "invoice_no", "prompt": "find the invoice number"},
        {"prompt_key": "enriched", "prompt": "use {{http://api.host/look[invoice_no]}}"},
    ]
    plan = plan_prompt_stages(specs)
    assert plan.stages[0] == [["invoice_no"]]  # producer first
    assert plan.stages[1] == [["enriched"]]  # HTTP consumer sequenced after
