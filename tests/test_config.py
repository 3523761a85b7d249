import os

import yaml

from conan_tpu.config import HParams, load_config, parse_hparams_overrides, set_hparams


def test_base_config_inheritance(tmp_path):
    (tmp_path / "base.yaml").write_text(yaml.safe_dump({"a": 1, "b": {"c": 2, "d": 3}}))
    (tmp_path / "mid.yaml").write_text(
        yaml.safe_dump({"base_config": "base.yaml", "b": {"c": 20}, "e": 5}))
    (tmp_path / "top.yaml").write_text(
        yaml.safe_dump({"base_config": ["mid.yaml"], "a": 100}))
    cfg = load_config(str(tmp_path / "top.yaml"))
    assert cfg == {"a": 100, "b": {"c": 20, "d": 3}, "e": 5}


def test_cycle_guard(tmp_path):
    (tmp_path / "a.yaml").write_text(yaml.safe_dump({"base_config": "b.yaml", "x": 1}))
    (tmp_path / "b.yaml").write_text(yaml.safe_dump({"base_config": "a.yaml", "y": 2}))
    cfg = load_config(str(tmp_path / "a.yaml"))
    assert cfg["x"] == 1 and cfg["y"] == 2


def test_dotted_overrides():
    ov = parse_hparams_overrides("a=1,b.c=[2,3],d=hello,e=1e-4,f=true")
    assert ov == {"a": 1, "b": {"c": [2, 3]}, "d": "hello", "e": 1e-4, "f": True}


def test_hparams_immutable_and_hashable():
    hp = HParams({"a": 1, "b": {"c": [1, 2]}})
    assert hp.a == 1
    assert hp.b.c == (1, 2)
    assert hash(hp) == hash(HParams({"b": {"c": [1, 2]}, "a": 1}))
    hp2 = hp.replace(**{"b.c": [9]})
    assert hp2.b.c == (9,) and hp.b.c == (1, 2)


def test_set_hparams_cli(tmp_path, monkeypatch):
    (tmp_path / "cfg.yaml").write_text(yaml.safe_dump({"lr": 0.1, "n": 2}))
    monkeypatch.chdir(tmp_path)
    hp = set_hparams(argv=["--config", str(tmp_path / "cfg.yaml"), "--exp_name", "e1",
                           "--hparams", "lr=0.5", "--reset"])
    assert hp.lr == 0.5 and hp.n == 2
    assert os.path.exists(tmp_path / "checkpoints/e1/config.yaml")
    # saved-config reuse without --reset
    hp2 = set_hparams(argv=["--config", "", "--exp_name", "e1"])
    assert hp2.lr == 0.5
