"""URL canonicalization (operators/urls.py): crafted vectors, the
idempotence property, and the all-JVM plan contract."""

from pyspark.sql import functions as F

from rex_spark.operators.urls import canonical_url


CASES = [
    # (raw, canonical)
    ("HTTP://Example.COM:80/Path?b=2&a=1#frag",
     "http://example.com/Path?a=1&b=2"),
    ("https://Example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x?z=9&y=8", "https://example.com:8443/x?y=8&z=9"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com#only-frag", "http://example.com/"),
    ("http://example.com/?", "http://example.com/"),
    ("HTTPS://WWW.EXAMPLE.COM/CaseKept/Path", "https://www.example.com/CaseKept/Path"),
    ("http://example.com:8080/p?q=1", "http://example.com:8080/p?q=1"),
]


def test_canonical_url_vectors(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    got = [r["canon"] for r in
           df.select(canonical_url("url").alias("canon")).collect()]
    assert got == [c for _, c in CASES]


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) for every vector."""
    df = spark.createDataFrame([(c,) for _, c in CASES], ["url"])
    got = [r["c2"] for r in
           df.select(canonical_url(canonical_url("url")).alias("c2")).collect()]
    assert got == [c for _, c in CASES]


def test_canonical_url_plan_is_jvm_only(spark):
    """The crawl dedup key must be pure codegen — no Python stage."""
    df = spark.range(10).select(
        canonical_url(F.concat(F.lit("http://h/"), F.col("id"))).alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
