"""Connected components: the driver union-find fast path and the
iterative large-star/small-star DataFrame loop must label identically
(component = min node id), including on a skewed hub graph."""

import random

from rex_spark.operators.canonical import connected_components


def _hub_graph():
    rng = random.Random(7)
    edges = []
    # one hub component (star with 200 spokes — the Zipfian head case)
    for i in range(1, 201):
        edges.append((i * 7, 0) if i % 2 else (0, i * 7))
    # three long chains (worst case for naive propagation)
    for base in (10_000, 20_000, 30_000):
        for i in range(60):
            edges.append((base + i, base + i + 1))
    # self-loops and duplicates must be ignored
    edges += [(0, 0), (10_000, 10_001), (10_001, 10_000)]
    rng.shuffle(edges)
    return edges


def test_cc_driver_vs_distributed(spark):
    df = spark.createDataFrame(_hub_graph(), "a long, b long")
    drv, it_drv = connected_components(df)
    dist, it_dist = connected_components(df, driver_max_edges=0)
    assert it_drv == 0  # small graph takes the driver path
    assert it_dist >= 1  # forced distributed loop
    assert sorted(map(tuple, drv.collect())) == sorted(map(tuple, dist.collect()))


def test_cc_labels_are_component_min(spark):
    df = spark.createDataFrame(_hub_graph(), "a long, b long")
    comp, _ = connected_components(df)
    rows = comp.collect()
    labels = {r["node_id"]: r["component"] for r in rows}
    # hub component min is 0; each chain's min is its base
    assert labels[7] == 0 and labels[1400] == 0
    for base in (10_000, 20_000, 30_000):
        assert labels[base + 60] == base
    # every component id is itself labeled with itself
    for node, c in labels.items():
        assert labels.get(c, c) == c


def test_cc_reliable_checkpoint_matches(spark, tmp_path):
    """checkpoint_dir= switches the loop's per-round materialization to
    reliable .checkpoint() (the 100x-deployment answer to executor
    loss); components must be identical to the localCheckpoint path and
    the checkpoint data must actually land in the directory."""
    import os

    df = spark.createDataFrame(_hub_graph(), "a long, b long")
    ckpt = str(tmp_path / "cc_ckpt")
    rel, it_rel = connected_components(
        df, driver_max_edges=0, checkpoint_dir=ckpt
    )
    local, _ = connected_components(df, driver_max_edges=0)
    assert it_rel >= 1
    assert sorted(map(tuple, rel.collect())) == sorted(
        map(tuple, local.collect())
    )
    # reliable blocks were written (an RDD checkpoint dir per round)
    assert os.path.isdir(ckpt) and len(os.listdir(ckpt)) > 0


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "a long, b long")
    comp, _ = connected_components(df)
    assert comp.count() == 0


def test_driver_canonicalization_matches_distributed(spark):
    """The driver-side small-vocabulary canonicalization (same kernels,
    same banding) must produce exactly the distributed path's labels."""
    from rex_spark.operators.canonical import canonicalize_surfaces
    from rex_spark.operators.extraction import detect_mentions
    from rex_spark.operators.textplane import clean_pages, segment_sentences
    from rex_spark.pipeline import build_pages_df

    mentions = detect_mentions(
        segment_sentences(clean_pages(build_pages_df(spark, 100, seed=42)))
    )
    drv = canonicalize_surfaces(spark, mentions)
    dist = canonicalize_surfaces(spark, mentions, driver_max_surfaces=0)
    assert sorted(map(tuple, drv.collect())) == sorted(map(tuple, dist.collect()))


def test_salted_collect_slice_matches_unsalted(spark):
    """The two-phase salted distinct-collect must equal the direct
    aggregation exactly, including on a heavily skewed key."""
    import random

    from rex_spark.operators.skew import salted_collect_slice

    rng = random.Random(3)
    rows = [("hub", rng.randint(0, 40)) for _ in range(5000)]
    rows += [(f"k{i%7}", rng.randint(0, 1000)) for i in range(300)]
    rows += [("hub", None), ("k0", None)]  # NULL items: dropped from the
    # slice (collect_set semantics) but still counted in support
    df = spark.createDataFrame(rows, "key string, item long")
    a = salted_collect_slice(df, ["key"], "item", k=5, salt_partitions=0)
    b = salted_collect_slice(df, ["key"], "item", k=5, salt_partitions=16)
    ra = {r["key"]: (list(r["items"]), r["support"]) for r in a.collect()}
    rb = {r["key"]: (list(r["items"]), r["support"]) for r in b.collect()}
    assert ra == rb
    assert ra["hub"][1] == 5001 and len(ra["hub"][0]) == 5

    # the GROUPED_MAP form (no JVM partials — the case the salt is FOR)
    # must produce the identical contract, salted and direct
    from rex_spark.operators.skew import salted_udf_collect_slice

    c = salted_udf_collect_slice(df, ["key"], "item", k=5, salt_partitions=0)
    d = salted_udf_collect_slice(df, ["key"], "item", k=5, salt_partitions=16)
    rc = {r["key"]: (list(r["items"]), r["support"]) for r in c.collect()}
    rd = {r["key"]: (list(r["items"]), r["support"]) for r in d.collect()}
    assert rc == ra and rd == ra
