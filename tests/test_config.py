import os
import textwrap

from paddlerec_tpu.core.config import (
    coerce_value,
    flatten_config,
    load_config,
    parse_overrides,
    resolve_path,
)


def test_flatten_nested():
    flat = flatten_config(
        {"runner": {"train_batch_size": 2, "sub": {"x": 1}}, "top": "v"}
    )
    assert flat["runner.train_batch_size"] == 2
    assert flat["runner.sub.x"] == 1
    assert flat["top"] == "v"


def test_load_yaml_and_workspace(tmp_path):
    cfg_file = tmp_path / "config.yaml"
    cfg_file.write_text(
        textwrap.dedent(
            """
            workspace: "/ws"
            runner:
              train_data_dir: "{workspace}/data"
              train_batch_size: 2
            hyper_parameters:
              fc_sizes: [512, 256]
            """
        )
    )
    cfg = load_config(str(cfg_file))
    assert cfg.runner("train_batch_size") == 2
    assert cfg.runner("train_data_dir") == "/ws/data"
    assert cfg.hyper("fc_sizes") == [512, 256]
    assert cfg.get("config_dir") == str(tmp_path)


def test_overrides_typed():
    o = parse_overrides(
        ["runner.epochs=5", "runner.use_gpu=False", "hyper_parameters.lr=0.01", "a.b=text"]
    )
    assert o["runner.epochs"] == 5
    assert o["runner.use_gpu"] is False
    assert o["hyper_parameters.lr"] == 0.01
    assert o["a.b"] == "text"
    assert coerce_value("[1, 2]") == [1, 2]
    assert coerce_value("true") is True


def test_override_applies(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("runner:\n  epochs: 3\n")
    cfg = load_config(str(cfg_file), {"runner.epochs": 7})
    assert cfg.runner("epochs") == 7


def test_resolve_path(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("runner:\n  train_data_dir: data/train\n")
    cfg = load_config(str(cfg_file))
    assert resolve_path(cfg, "runner.train_data_dir") == os.path.join(
        str(tmp_path), "data/train"
    )
