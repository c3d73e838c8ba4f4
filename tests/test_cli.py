"""CLI surface: one submittable module, JSON-line outcomes."""

import json
import os


def test_cli_list_and_query(spark, tmp_path, capsys):
    from unstract_spark import cli

    assert cli.main(["list"]) == 0
    names = capsys.readouterr().out.splitlines()
    assert "q1_pricing_summary" in names and len(names) > 150

    out = str(tmp_path / "q")
    rc = cli.main([
        "query", "--name", "a2_status_rollup",
        "--sf-dir", "/root/testdata/sf0.001", "--out", out,
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["query"] == "a2_status_rollup" and summary["rows"] > 0
    assert spark.read.parquet(out).count() == summary["rows"]

    assert cli.main([
        "query", "--name", "nope", "--sf-dir", "x", "--out", "y",
    ]) == 2


def test_cli_extract_e2e(spark, tmp_path, capsys):
    from unstract_spark import cli

    docs = tmp_path / "docs"
    os.makedirs(docs)
    for i in range(4):
        (docs / f"d{i}.txt").write_text(
            f"Invoice {i}: total {i * 3} dollars. " * 5
        )
    job = {
        "source_dir": str(docs),
        "history_path": str(tmp_path / "hist"),
        "max_files": 4,
        "prompt_specs": [
            {"prompt_key": "invoice_no", "prompt": "id",
             "enforce_type": "text"},
            {"prompt_key": "total", "prompt": "total",
             "enforce_type": "number"},
        ],
    }
    jp = tmp_path / "job.json"
    jp.write_text(json.dumps(job))
    out = str(tmp_path / "out")
    assert cli.main(["extract", "--job", str(jp), "--out", out]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["results"] > 0 and summary["usage"] > 0
    res = spark.read.parquet(os.path.join(out, "results"))
    assert res.count() == summary["results"]
