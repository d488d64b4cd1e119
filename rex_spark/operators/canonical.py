"""Graph plane: entity canonicalization + entity/edge materialization.

North-star requirement with no reference implementation (REx's nearest
analog is the exact-surface bag key, rex/data/transforms/bag_re.py:68-78).
Pipeline:

1. ``surface_nodes``      distinct mention surfaces -> stable 64-bit ids
                          (xxhash64, JVM-side).
2. ``similarity_edges``   three edge sources union-ed:
                          a) exact normalized-form match (lower, collapse
                             whitespace, strip punctuation) — built-ins;
                          b) KB alias table (broadcast join) — the
                             rel2id.json-style side input;
                          c) MinHash-LSH blocking over char-3-gram
                             shingles + exact-Jaccard verification —
                             the fuzzy path.
3. ``connected_components``  iterative large-star / small-star on an
                          edges DataFrame (Kiveris et al., "Connected
                          Components in MapReduce and Beyond"), with
                          per-iteration localCheckpoint to cut lineage
                          and AQE skew-join handling; converges in
                          O(log n) rounds even on hub-entity chains.
4. ``build_entities_edges``  canonical entity table (component ->
                          surfaces, canonical = most frequent surface)
                          and edge table aggregated to canonical ids
                          with support counts, salted-repartition ready.

Scale notes: LSH band join is the only quadratic-risk step; banding
keys bound bucket sizes and a bucket-size cap drops degenerate buckets
(counted, not silent).  Component ids are min-node-id, so results are
deterministic.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernels import kb
from ..kernels.hashing import (
    band_keys,
    band_keys_batch,
    minhash_params,
    minhash_signature,
    minhash_signatures_batch,
)
from ..kernels.textnorm import char_shingles

NUM_PERM = 64
NUM_BANDS = 16
JACCARD_THRESHOLD = 0.60
MAX_BUCKET = 200  # LSH buckets larger than this are degenerate; dropped


def normalize_surface(col):
    """casefold + strip punctuation + collapse whitespace (built-in)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\p{L}\p{Nd}\s]+", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def surface_nodes(mentions: DataFrame) -> DataFrame:
    """Distinct surfaces with stable ids and frequency (for canonical
    name election and skew diagnostics)."""
    return (
        mentions.groupBy("surface")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("node_id", F.xxhash64("surface"))
        .withColumn("norm", normalize_surface(F.col("surface")))
    )


def _alias_edges(spark, nodes: DataFrame) -> DataFrame:
    """KB alias side input: surfaces of the same canonical entity are
    linked via a broadcast join (a is the min-id surface per canonical)."""
    rows = []
    for canonical, (_etype, surfaces) in kb.ENTITIES.items():
        for s in surfaces:
            surf = " ".join(s.split()) if not kb._is_zh(s) else " ".join(s)
            rows.append((canonical, surf))
    alias_df = spark.createDataFrame(rows, ["canonical", "surface"])
    linked = nodes.join(F.broadcast(alias_df), "surface").select(
        "canonical", "node_id"
    )
    reps = linked.groupBy("canonical").agg(F.min("node_id").alias("rep"))
    return (
        linked.join(F.broadcast(reps), "canonical")
        .where(F.col("node_id") != F.col("rep"))
        .select(F.col("node_id").alias("a"), F.col("rep").alias("b"))
    )


def _exact_norm_edges(nodes: DataFrame) -> DataFrame:
    """Surfaces sharing a normalized form: link to the min node id."""
    reps = nodes.groupBy("norm").agg(F.min("node_id").alias("rep"))
    return (
        nodes.join(reps, "norm")
        .where(F.col("node_id") != F.col("rep"))
        .select(F.col("node_id").alias("a"), F.col("rep").alias("b"))
    )


_SHINGLE_SCHEMA = StructType(
    [
        StructField("node_id", LongType(), False),
        StructField("shingles", ArrayType(StringType()), False),
    ]
)

_SIG_SCHEMA = StructType(
    [
        StructField("node_id", LongType(), False),
        StructField("band_id", IntegerType(), False),
        StructField("band_key", LongType(), False),
    ]
)


def _shingle_table(nodes: DataFrame) -> DataFrame:
    """One Arrow pass: (node_id, sorted char-3-gram shingles of norm);
    empty-shingle surfaces are dropped (they cannot LSH-link)."""

    def shingle_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, shs = [], []
            for node_id, norm in zip(pdf["node_id"], pdf["norm"]):
                sh = sorted(set(char_shingles(norm or "", 3)))
                if sh:
                    ids.append(node_id)
                    shs.append(sh)
            yield pd.DataFrame({"node_id": ids, "shingles": shs})

    return nodes.select("node_id", "norm").mapInPandas(
        shingle_batches, schema=_SHINGLE_SCHEMA
    )


def _lsh_edges(nodes: DataFrame) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard (J6).

    r4 shape (soak-profiled: the edge build dominated the CC soak
    14:1): shingling runs in ONE Arrow pass; signatures are the
    VECTORIZED batch kernels (minhash_signatures_batch /
    band_keys_batch — pinned equal to the scalar kernels by
    tests/test_property_kernels.py) derived from that shingle table;
    and the band rows entering the bucket-size and self-join shuffles
    are NARROW (node_id, band_id, band_key) — shingle arrays are
    joined back only for the (small) verified-candidate set, the same
    design dedup.py measured faster than carrying them on band rows
    (dedup.py:215-225), and the shuffle-width argument only grows at
    web scale.
    """
    import numpy as np

    params = minhash_params(NUM_PERM)

    from pyspark import StorageLevel

    # surface-vocab-sized; persisted because the signature pass and the
    # two verification joins all consume it within the caller's first
    # materializing action.
    sh = _shingle_table(nodes).persist(StorageLevel.MEMORY_AND_DISK)

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["node_id"].to_numpy()
            d = len(ids)
            sigs = minhash_signatures_batch(
                [set(s) for s in pdf["shingles"]], params
            )
            keys = band_keys_batch(sigs, NUM_BANDS)
            yield pd.DataFrame(
                {
                    "node_id": np.repeat(ids, NUM_BANDS),
                    "band_id": np.tile(np.arange(NUM_BANDS, dtype=np.int32), d),
                    # signed band-key CONVENTION (shared with
                    # dedup.band_rows): uint64 -> int64 by
                    # bit-reinterpretation (two's complement view), NOT
                    # an offset shift — persisted band tables from the
                    # two LSH surfaces must stay join-comparable
                    "band_key": (
                        keys.reshape(-1).view(np.int64)
                        if d
                        else np.array([], dtype=np.int64)
                    ),
                }
            )

    banded = sh.mapInPandas(sig_batches, schema=_SIG_SCHEMA)
    # cap degenerate buckets (count them instead of letting the join blow up)
    bucket_sizes = banded.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    banded = banded.join(
        bucket_sizes.where(F.col("bsz") <= MAX_BUCKET), ["band_id", "band_key"]
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band_id", "band_key"])
        .where(F.col("x.node_id") < F.col("y.node_id"))
        .select(
            F.col("x.node_id").alias("a"), F.col("y.node_id").alias("b")
        )
        .dropDuplicates(["a", "b"])
    )
    verified = (
        cand.join(
            sh.select(F.col("node_id").alias("a"), F.col("shingles").alias("sh_a")),
            "a",
        )
        .join(
            sh.select(F.col("node_id").alias("b"), F.col("shingles").alias("sh_b")),
            "b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("a", "b")
    )
    # materialize eagerly (edge-set-sized, tiny next to the shingle
    # table) so the sh cache can be RELEASED here instead of leaking a
    # persisted DataFrame per canonicalize_surfaces call for the
    # session lifetime — same contract as the nodes persist/unpersist
    # pair in canonicalize_surfaces.  Cluster caveat as there:
    # localCheckpoint -> .checkpoint() on a real deployment.
    verified = verified.localCheckpoint(eager=True)
    sh.unpersist()
    return verified


def similarity_edges(spark, nodes: DataFrame) -> DataFrame:
    """Union of alias, exact-normalized and LSH edge sources."""
    return (
        _alias_edges(spark, nodes)
        .unionByName(_exact_norm_edges(nodes))
        .unionByName(_lsh_edges(nodes))
        .dropDuplicates(["a", "b"])
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's min neighborhood id."""
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        sym.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor <= u (and u) to the min neighborhood id."""
    # orient edges high->low so each node aggregates its smaller neighbors
    lo = F.least("a", "b")
    hi = F.greatest("a", "b")
    oriented = edges.select(hi.alias("a"), lo.alias("b")).where(
        F.col("a") != F.col("b")
    )
    mins = oriented.groupBy("a").agg(F.min("b").alias("m"))
    relinked = (
        oriented.join(mins, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .unionByName(mins.select(F.col("a"), F.col("m").alias("b")))
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    return relinked


def _edge_digest(edges: DataFrame) -> Tuple[int, int]:
    """(row count, order-independent hash-xor) of the canonical edge set
    — one cheap aggregation job, computed on the already-checkpointed
    iteration output so nothing upstream re-runs.  bit_xor is overflow-
    free under ANSI mode, unlike a hash sum."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(a, b))").alias("h"),
    ).first()
    return (row["n"], row["h"])


def _driver_union_find(rows) -> list:
    """Union-find over collected (a, b) edges; component id = min node
    id, matching the distributed algorithm's labeling exactly."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict = {}
    for node in parent:
        root = find(node)
        comp_min[root] = min(comp_min.get(root, node), node)
    return [(node, comp_min[find(node)]) for node in parent]


# Edge sets at or below this size are solved with driver-side
# union-find (one collect job, microseconds of CPU) instead of the
# iterative join loop — the same small-input escape hatch AQE applies
# when it converts a shuffle join to broadcast.  200k edges collect to
# ~3 MB; the distributed loop exists for everything beyond.
DRIVER_CC_MAX_EDGES = 200_000


def connected_components(
    edges: DataFrame,
    max_iterations: int = 12,
    driver_max_edges: int | None = None,
    checkpoint_dir: str | None = None,
) -> Tuple[DataFrame, int]:
    """Large-star/small-star alternation until the edge set is a stable
    star forest.  Returns (node_id -> component_id mapping, iterations).

    Scale-adaptive: the canonical edge set is first probed with a
    ``limit(threshold + 1)`` collect; if it fits, union-find runs on
    the driver (0 iterations reported) — at web scale the surface graph
    exceeds the threshold and the iterative DataFrame loop below runs
    instead.  Both paths label every node with its component's min node
    id, so results are identical.

    Each round materializes via localCheckpoint: cuts the join-loop
    lineage (REx's pickle-cache analog for iterative state) and gives
    the optimizer fresh statistics per round.  localCheckpoint blocks
    live on executors and do NOT survive executor loss — fine on
    local[*], a liability on a 1000-executor cluster where one
    preempted node would fail the whole loop.  Pass ``checkpoint_dir``
    to switch every round to reliable ``.checkpoint()`` into that
    (HDFS/object-store) directory instead; results are identical
    (pinned by tests/test_canonical_cc.py).  Convergence is detected
    by an order-independent (count, hash-sum) digest of the edge set —
    a single aggregation per round instead of two exceptAll jobs.  A
    digest collision between two DIFFERENT edge sets would stop the
    loop before convergence and could yield wrong labels; with a
    64-bit hash-sum the per-round collision probability is ~2^-64,
    which we accept in exchange for halving the per-round job count
    (an exact exceptAll check would double it back).
    """
    canon = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    threshold = (
        DRIVER_CC_MAX_EDGES if driver_max_edges is None else driver_max_edges
    )
    if threshold > 0:
        probe = canon.limit(threshold + 1).collect()
        if len(probe) <= threshold:
            mapping = _driver_union_find([(r["a"], r["b"]) for r in probe])
            spark = edges.sparkSession
            schema = "node_id long, component long"
            return spark.createDataFrame(mapping, schema=schema), 0

    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _materialize(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def _materialize(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    cur = _materialize(canon)
    prev_digest = _edge_digest(cur)
    iterations = 0
    for _ in range(max_iterations):
        iterations += 1
        stepped = _materialize(_small_star(_large_star(cur)))
        digest = _edge_digest(stepped)
        cur = stepped
        if digest == prev_digest:
            break
        prev_digest = digest
    # stable state is a star forest: b is the component min for every a
    membership = cur.select(
        F.col("a").alias("node_id"), F.col("b").alias("component")
    )
    # roots themselves
    roots = membership.select(F.col("component").alias("node_id")).distinct()
    membership = (
        membership.unionByName(roots.withColumn("component", F.col("node_id")))
        .groupBy("node_id")
        .agg(F.min("component").alias("component"))
    )
    return membership, iterations


# Surface vocabularies at or below this size canonicalize driver-side
# (one Spark job to collect distinct surfaces, then the SAME alias /
# exact-norm / MinHash-band / union-find algorithms in-process).  A
# fixed KB-bounded gazetteer stays tiny however large the corpus is;
# an open-vocabulary web crawl blows past this and takes the
# distributed path.  Both paths are pinned identical by
# tests/test_canonical_cc.py.
DRIVER_CANON_MAX_SURFACES = 100_000


def _driver_similarity_edges(rows) -> set:
    """In-process replica of similarity_edges over collected
    (surface, freq, node_id, norm) rows — same kernels, same banding,
    same bucket cap, so the edge set is identical to the distributed
    plan's."""
    sid = {r["surface"]: r["node_id"] for r in rows}
    edges: set = set()
    # (a) KB alias table
    for canonical, (_etype, surfaces) in kb.ENTITIES.items():
        ids = []
        for s in surfaces:
            surf = " ".join(s.split()) if not kb._is_zh(s) else " ".join(s)
            if surf in sid:
                ids.append(sid[surf])
        if len(ids) > 1:
            rep = min(ids)
            edges.update((i, rep) for i in ids if i != rep)
    # (b) exact normalized form
    by_norm: dict = {}
    for r in rows:
        by_norm.setdefault(r["norm"], []).append(r["node_id"])
    for ids in by_norm.values():
        if len(ids) > 1:
            rep = min(ids)
            edges.update((i, rep) for i in ids if i != rep)
    # (c) MinHash-LSH banding + exact-Jaccard verification
    params = minhash_params(NUM_PERM)
    shingle_of = {}
    buckets: dict = {}
    for r in rows:
        sh = sorted(set(char_shingles(r["norm"] or "", 3)))
        if not sh:
            continue
        shingle_of[r["node_id"]] = set(sh)
        sig = minhash_signature(sh, params)
        for band_id, key in enumerate(band_keys(sig, NUM_BANDS)):
            buckets.setdefault((band_id, key), []).append(r["node_id"])
    cand = set()
    for ids in buckets.values():
        if len(ids) > MAX_BUCKET:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    for a, b in cand:
        sa, sb = shingle_of[a], shingle_of[b]
        inter = len(sa & sb)
        if inter / (len(sa) + len(sb) - inter) >= JACCARD_THRESHOLD:
            edges.add((a, b))
    return edges


def canonicalize_surfaces(
    spark, mentions: DataFrame, driver_max_surfaces: int | None = None
) -> DataFrame:
    """mentions -> labeled surface table (surface, freq, node_id,
    entity_id): the checkpointable output of the canonicalization
    stage, consumed by both the entity and edge materializers."""
    from pyspark import StorageLevel

    threshold = (
        DRIVER_CANON_MAX_SURFACES
        if driver_max_surfaces is None
        else driver_max_surfaces
    )
    if threshold > 0:
        probe = surface_nodes(mentions).limit(threshold + 1).collect()
        if len(probe) <= threshold:
            edges = _driver_similarity_edges(probe)
            comp = dict(_driver_union_find(edges))
            rows = [
                (
                    r["surface"],
                    r["freq"],
                    r["node_id"],
                    comp.get(r["node_id"], r["node_id"]),
                )
                for r in probe
            ]
            return spark.createDataFrame(
                rows, "surface string, freq long, node_id long, entity_id long"
            )

    # nodes feeds three edge sources plus the final label join: persist
    # so the mention scan + surface groupBy runs once, not four times.
    nodes = surface_nodes(mentions).persist(StorageLevel.MEMORY_AND_DISK)
    comp, _iters = connected_components(similarity_edges(spark, nodes))
    labeled = (
        nodes.join(comp, "node_id", "left")
        .withColumn("entity_id", F.coalesce("component", "node_id"))
        .select("surface", "freq", "node_id", "entity_id")
        # surface-vocab-sized (one row per surface, not per mention):
        # materialize eagerly so the nodes cache can be released now
        # instead of leaking across repeated calls in one session.
        # Cluster caveat: localCheckpoint blocks don't survive executor
        # loss; a real deployment lands this stage in the StageStore
        # (and passes checkpoint_dir= to connected_components above,
        # which switches its loop to reliable .checkpoint()).
        .localCheckpoint(eager=True)
    )
    nodes.unpersist()
    return labeled


def entities_from_labeled(labeled: DataFrame) -> DataFrame:
    """entities: entity_id BIGINT, canonical STRING (most frequent
    surface, ties broken lexicographically-max), surfaces
    ARRAY<STRING>, n_mentions BIGINT."""
    return labeled.groupBy("entity_id").agg(
        F.max_by("surface", F.struct(F.col("freq"), F.col("surface"))).alias(
            "canonical"
        ),
        F.sort_array(F.collect_set("surface")).alias("surfaces"),
        F.sum("freq").alias("n_mentions"),
    )


def edges_from_labeled(
    labeled: DataFrame, triples: DataFrame, salt_partitions: int = 0
) -> DataFrame:
    """edges: src BIGINT, pred STRING, dst BIGINT, support BIGINT.

    ``salt_partitions`` > 0 enables the J7 hub-entity skew defusal: a
    deterministic salt spreads each hot (src, pred, dst) key over
    ``salt_partitions`` partial counts, then a second (tiny)
    aggregation sums them.  For a plain count, Spark's own map-side
    partial aggregation already bounds what any reducer receives
    (partials, not raw rows), so the salt is belt-and-braces here; it
    becomes load-bearing when the support aggregation grows non-partial
    state (collect_list of provenance urls, exact distinct counts),
    which is the production shape for edge evidence tracking.
    """
    # surface->entity resolution: the surface dimension is much smaller
    # than the triples fact table but NOT guaranteed broadcastable at
    # 10^12 documents, so no forced broadcast hint — AQE converts to a
    # runtime broadcast join whenever the built dimension fits under
    # spark.sql.autoBroadcastJoinThreshold, else shuffles both sides.
    surf2ent = labeled.select("surface", "entity_id")
    t = (
        triples.select("subj", "pred", "obj")
        .join(
            surf2ent.withColumnRenamed("surface", "subj").withColumnRenamed(
                "entity_id", "src"
            ),
            "subj",
        )
        .join(
            surf2ent.withColumnRenamed("surface", "obj").withColumnRenamed(
                "entity_id", "dst"
            ),
            "obj",
        )
    )
    if salt_partitions > 0:
        # two-phase skew-proof aggregation: salt on a deterministic hash
        # of the full row (no rand(): rerun-stable)
        salted = t.withColumn(
            "_salt",
            F.pmod(F.xxhash64("src", "pred", "dst", "subj"), F.lit(salt_partitions)),
        )
        partial = salted.groupBy("src", "pred", "dst", "_salt").agg(
            F.count(F.lit(1)).alias("c")
        )
        return partial.groupBy("src", "pred", "dst").agg(
            F.sum("c").alias("support")
        )
    return t.groupBy("src", "pred", "dst").agg(F.count(F.lit(1)).alias("support"))


def build_entities_edges(
    spark,
    mentions: DataFrame,
    triples: DataFrame,
    salt_partitions: int = 0,
) -> Tuple[DataFrame, DataFrame]:
    """Convenience wrapper: canonicalize once, materialize both tables."""
    labeled = canonicalize_surfaces(spark, mentions)
    return (
        entities_from_labeled(labeled),
        edges_from_labeled(labeled, triples, salt_partitions=salt_partitions),
    )
