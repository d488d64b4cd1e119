"""Sources/sinks (SURVEY §2.1 S1-S9): round trips, reference quirks
(embedding header/dim-mismatch skipping), and the fan-out sink."""

import json
import os

from rex_spark.io.readers import (
    filtered_fanout_sink,
    load_side_input,
    read_delimited,
    read_embedding_text,
    read_jsonlines,
    read_lines,
    write_jsonlines,
)


def test_jsonlines_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, name string"
    )
    path = str(tmp_path / "jl")
    write_jsonlines(df, path)
    back = read_jsonlines(spark, path, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jsonlines_gzip(spark, tmp_path):
    """Compressed jsonl reads transparently (the Common-Crawl-adjacent
    shape: WET/jsonl drops arrive gzipped; Spark's codec dispatch is by
    extension, so the same reader covers both)."""
    import gzip
    import json as _json

    from rex_spark.io.readers import read_jsonlines

    p = tmp_path / "part-000.jsonl.gz"
    rows = [{"id": i, "text": f"doc {i}"} for i in range(50)]
    with gzip.open(p, "wt") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    got = read_jsonlines(spark, str(p))
    assert got.count() == 50
    assert {r["id"] for r in got.collect()} == set(range(50))


def test_delimited_with_and_without_header(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("a\t1\nb\t2\n")
    df = read_delimited(spark, str(p), sep="\t", header=False)
    assert df.count() == 2 and len(df.columns) == 2
    p2 = tmp_path / "h.tsv"
    p2.write_text("name\tnum\na\t1\n")
    df2 = read_delimited(spark, str(p2), sep="\t", header=True)
    assert df2.columns == ["name", "num"] and df2.count() == 1


def test_lines_and_side_input(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("one\ntwo\nthree\n")
    assert read_lines(spark, str(p)).count() == 3
    j = tmp_path / "rel2id.json"
    j.write_text(json.dumps({"born_in": 0, "works_for": 1}))
    bc = load_side_input(spark, str(j))
    assert bc.value["works_for"] == 1


def test_embedding_text_header_and_mismatch_skipped(spark, tmp_path):
    """Reference quirks (rex/utils/io.py:138-169): 'N dim' first line
    and wrong-dimension rows are dropped; good rows survive."""
    p = tmp_path / "emb.txt"
    p.write_text(
        "4 3\n"             # header -> dim 2, minority -> dropped
        "cat 0.1 0.2 0.3\n"
        "dog 0.4 0.5 0.6\n"
        "bad 0.7 0.8\n"     # dim mismatch -> dropped
        "eel 0.9 1.0 1.1\n"
    )
    rows = {r["token"]: list(r["vec"]) for r in read_embedding_text(spark, str(p)).collect()}
    assert set(rows) == {"cat", "dog", "eel"}
    assert rows["cat"] == [0.1, 0.2, 0.3]


def test_filtered_fanout_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i / 10.0) for i in range(10)], "id long, prob double"
    )
    base = str(tmp_path / "fan")
    counts = filtered_fanout_sink(df, "prob", [0.2, 0.5, 0.8], base)
    assert counts == {0.2: 7, 0.5: 4, 0.8: 1}
    for t, n in counts.items():
        back = spark.read.json(f"{base}/gt{t}")
        assert back.count() == n
    assert sorted(os.listdir(base)) == ["gt0.2", "gt0.5", "gt0.8"]
