"""P10 error-tolerant transform + S8 discovery."""

import pytest

from rex_spark.operators.safety import discover_inputs, tolerant_map_in_pandas


def test_tolerant_skip_counts_and_output(spark):
    df = spark.createDataFrame(
        [(1, "2"), (2, "x"), (3, "4"), (4, "boom"), (5, "10")],
        "id long, val string",
    )

    def parse(row):
        rid, val = row
        return [(rid, int(val) * 10)]  # int("x") raises

    out, skipped = tolerant_map_in_pandas(
        df, parse, "id long, parsed long", ["id", "val"], ["id", "parsed"]
    )
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(1, 20), (3, 40), (5, 100)]
    assert skipped.value == 2


def test_tolerant_raise_mode(spark):
    df = spark.createDataFrame([(1, "x")], "id long, val string")

    def parse(row):
        return [(row[0], int(row[1]))]

    out, _ = tolerant_map_in_pandas(
        df, parse, "id long, parsed long", ["id", "val"], ["id", "parsed"],
        on_error="raise",
    )
    with pytest.raises(Exception):
        out.collect()


def test_tolerant_one_to_many(spark):
    df = spark.createDataFrame([(2,), (3,)], "n long")

    def expand(row):
        return [(row[0], i) for i in range(row[0])]

    out, skipped = tolerant_map_in_pandas(
        df, expand, "n long, i long", ["n"], ["n", "i"]
    )
    assert out.count() == 5
    assert skipped.value == 0


def test_discover_inputs(spark, tmp_path):
    (tmp_path / "a.jsonl").write_text("{}\n")
    (tmp_path / "b.jsonl").write_text("{}\n")
    (tmp_path / "c.txt").write_text("x\n")
    found = discover_inputs(spark, str(tmp_path), r".*\.jsonl$")
    names = sorted(r["file"].rsplit("/", 1)[-1] for r in found.collect())
    assert names == ["a.jsonl", "b.jsonl"]
