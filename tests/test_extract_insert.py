"""T1 extraction adapters + D2 INSERT generation."""

import pytest

from unstract_spark.sinks.jdbc import build_table_spec, insert_sql
from unstract_spark.operators.extract import extract_text


@pytest.fixture()
def mixed_catalog(spark):
    rows = [
        ("h1", "text/plain", b"plain body text here"),
        ("h2", "application/json", b'{"title": "Inv", "items": [{"sku": "A1"}, {"sku": "B2"}], "n": 5}'),
        ("h3", "text/csv", b"sku,qty\nA1,3\nB2,7\n"),
        ("h4", "application/pdf", b"%PDF-1.4 fake"),
        ("h5", "image/png", b"\x89PNG"),
        ("h6", "text/plain", bytes([0xFF, 0xFE])),
    ]
    return spark.createDataFrame(rows, "file_hash string, mime_type string, content binary")


def test_extract_dispatch_and_isolation(mixed_catalog):
    out = {r.file_hash: r for r in extract_text(mixed_catalog).collect()}
    assert out["h1"].extracted_text == "plain body text here"
    assert out["h1"].status == "SUCCESS" and out["h1"].page_count == 1
    # JSON: string values flattened depth-first
    assert out["h2"].extracted_text == "Inv\nA1\nB2"
    # CSV: cells joined per line
    assert out["h3"].extracted_text == "sku qty\nA1 3\nB2 7"
    # corrupt PDF (header only, no objects) -> isolated ERROR row
    assert out["h4"].status == "ERROR" and "page" in out["h4"].error_message
    # unknown mime -> ERROR row
    assert out["h5"].status == "ERROR" and "no extraction adapter" in out["h5"].error_message
    # undecodable -> ERROR row, job survived
    assert out["h6"].status == "ERROR"


def test_insert_sql_dialects(spark):
    df = spark.createDataFrame([("x", 1.0)], "invoice_no string, total double")
    pg = build_table_spec(df, "t_out", "postgresql", mode="single_json")
    assert (
        insert_sql(pg, ["data", "status"])
        == 'INSERT INTO "t_out" ("data", "status") VALUES (?, ?)'
    )
    bq = build_table_spec(df, "t_out", "bigquery", mode="single_json")
    assert (
        insert_sql(bq, ["data", "status"])
        == "INSERT INTO `t_out` (`data`, `status`) VALUES (PARSE_JSON(?), ?)"
    )
    sf = build_table_spec(df, "t_out", "snowflake", mode="single_json")
    assert (
        insert_sql(sf, ["data", "status"])
        == 'INSERT INTO "t_out" ("data", "status") SELECT PARSE_JSON(?), ?'
    )
    ms = build_table_spec(df, "t_out", "mssql", mode="split")
    assert insert_sql(ms, ["invoice_no", "total"]) == (
        "INSERT INTO [t_out] ([invoice_no], [total]) VALUES (?, ?)"
    )
