"""CLI parity test: the `python -m json2hbase_spark` surface mirrors
the reference utility's one-pass JSON→HBase ETL (SURVEY.md §3.1)."""

from __future__ import annotations

import json

from json2hbase_spark.__main__ import run


def test_cli_end_to_end(spark, tmp_path):
    src = tmp_path / "docs.jsonl"
    src.write_text(
        "\n".join(
            [
                json.dumps({"id": 1, "name": "alice", "addr": {"city": "oslo"}, "tags": ["a", "b"]}),
                json.dumps({"id": 2, "name": "bob", "addr": {"city": None}, "tags": []}),
            ]
        )
    )
    out = tmp_path / "table"
    status = run(
        [
            "--input", str(src),
            "--rowkey", "id",
            "--output", str(out),
            "--regions", "2",
        ]
    )
    assert status["cells"] == 7  # null city and empty tags emit nothing

    cells = {
        (r.rowkey, r.qualifier): r.value
        for r in spark.read.parquet(str(out)).collect()
    }
    assert cells[("1", "addr.city")] == "oslo"
    assert cells[("1", "tags.0")] == "a"
    assert cells[("1", "tags.1")] == "b"
    assert ("2", "addr.city") not in cells
    assert cells[("2", "name")] == "bob"
