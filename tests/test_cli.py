"""CLI smoke: `python -m revtron_utils_spark` command surface (driven
in-process — get_spark reuses the active test session)."""

from __future__ import annotations

import json

from revtron_utils_spark.__main__ import main


def test_cli_commands(spark, sf_dir, capsys):
    assert main(["tables", "--dir", sf_dir]) == 0
    tables = json.loads(capsys.readouterr().out.strip())
    assert "lineitem" in tables

    assert main(["count", "--dir", sf_dir, "--table", "region"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["count"] == 5

    assert (
        main(
            [
                "get",
                "--dir", sf_dir,
                "--table", "orders",
                "--columns", "o_orderkey,o_totalprice",
                "--where", '{"o_orderstatus": "F"}',
                "--sort-by", "o_totalprice",
                "--desc",
                "--limit", "3",
            ]
        )
        == 0
    )
    rows = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 3
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)

    assert main(["sql", "--dir", sf_dir, "SELECT count(*) AS n FROM nation"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["n"] == 25
