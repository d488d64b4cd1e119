"""Config merge semantics: defaults -> yaml files (later wins) ->
dotlist (wins over all), mirroring rex/utils/config.py:96-160."""

import json

import pytest

from rex_spark.config import PipelineConfig, dump_config, load_config


def test_defaults():
    cfg = load_config()
    assert cfg.salt_partitions == 8
    assert cfg.seed == 42
    assert cfg.include_sentence_text is True


def test_yaml_merge_order(tmp_path):
    a = tmp_path / "a.yaml"
    a.write_text("salt_partitions: 16\nseed: 7\n")
    b = tmp_path / "b.yaml"
    b.write_text("salt_partitions: 32\n")
    cfg = load_config([str(a), str(b)])
    assert cfg.salt_partitions == 32  # later file wins
    assert cfg.seed == 7              # untouched by later file


def test_dotlist_wins_and_parses_scalars(tmp_path):
    a = tmp_path / "a.yaml"
    a.write_text("salt_partitions: 16\n")
    cfg = load_config(
        [str(a)],
        ["salt_partitions=64", "master=null", "include_sentence_text=false"],
    )
    assert cfg.salt_partitions == 64
    assert cfg.master is None
    assert cfg.include_sentence_text is False


def test_unknown_key_rejected(tmp_path):
    a = tmp_path / "bad.yaml"
    a.write_text("no_such_option: 1\n")
    with pytest.raises(KeyError):
        load_config([str(a)])
    with pytest.raises(KeyError):
        load_config(None, ["typo_key=1"])


def test_dump_roundtrip(tmp_path):
    cfg = PipelineConfig(synthetic_pages=100, stage_root=str(tmp_path))
    path = dump_config(cfg, str(tmp_path))
    data = json.loads(open(path).read())
    assert data["synthetic_pages"] == 100
    assert data["seed"] == 42
