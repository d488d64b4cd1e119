"""P9 drop accounting: the pair cap and mention validity filter must
COUNT what they drop (rex/data/transforms/sent_re.py:44-58 logs these
per transform) and the counts must land via StageStore.write_metrics."""

import os

from pyspark.sql import Observation

from rex_spark.io.stages import StageStore
from rex_spark.operators.extraction import candidate_pairs, filter_valid_mentions


def _mentions(spark):
    rows = [
        # sentence A: 3 mentions -> 9 > cap(4): dropped whole (6 pairs)
        ("u1", 0, "PER", 0, 2, "a b"),
        ("u1", 0, "ORG", 3, 4, "c"),
        ("u1", 0, "LOC", 5, 6, "d"),
        # sentence B: 2 mentions -> 4 <= cap: kept (2 ordered pairs)
        ("u1", 1, "PER", 0, 1, "e"),
        ("u1", 1, "ORG", 2, 3, "f"),
        # sentence C: 1 mention, no pairs but not "dropped"
        ("u2", 0, "PER", 0, 1, "g"),
    ]
    return spark.createDataFrame(
        rows, "url string, sent_id int, ent_type string, start int, end int, surface string"
    )


def test_pair_cap_drop_counts_observed(spark):
    obs = Observation("pair_drops")
    pairs = candidate_pairs(_mentions(spark), max_pairs_per_sentence=4,
                            observation=obs)
    assert pairs.count() == 2  # only sentence B's ordered pairs
    got = obs.get
    assert got["dropped_sentences"] == 1
    assert got["dropped_pairs"] == 6
    assert got["input_sentences"] == 3


def test_valid_mention_drop_counts_observed(spark):
    obs = Observation("mention_drops")
    kept, dropped = filter_valid_mentions(_mentions(spark), max_seq_len=4,
                                          observation=obs)
    assert kept.count() == 5
    got = obs.get
    assert got["dropped_mentions"] == 1  # end 6 exceeds max_seq_len 4
    assert got["input_mentions"] == 6
    assert dropped.count() == 1


def test_metrics_land_in_store(spark, tmp_path):
    store = StageStore(spark, os.path.join(tmp_path, "stages"))
    obs = Observation("pair_drops2")
    pairs = candidate_pairs(_mentions(spark), max_pairs_per_sentence=4,
                            observation=obs)
    pairs.count()
    store.write_metrics("pairs", obs.get)
    back = {r["metric"]: r["value"] for r in store.metrics("pairs").collect()}
    assert back == {
        "dropped_sentences": 1, "dropped_pairs": 6, "input_sentences": 3,
    }
    assert {r["stage"] for r in store.metrics("pairs").collect()} == {"pairs"}
