"""Every shipped example config parses and its model instantiates."""

import glob
import os

import pytest

from paddlerec_tpu.core.config import load_config
from paddlerec_tpu.core.registry import get_model_class

CONFIGS = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "configs", "*", "*",
                 "config.yaml")
))


def test_catalog_covers_all_builtins():
    from paddlerec_tpu.models import _BUILTIN

    names = set()
    for path in CONFIGS:
        cfg = load_config(path)
        names.add(str(cfg.runner("model")))
    assert set(_BUILTIN) <= names


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[p.split("configs/")[-1] for p in CONFIGS]
)
def test_config_instantiates_model(path):
    cfg = load_config(path)
    name = str(cfg.runner("model"))
    md = get_model_class(name)(cfg)
    assert md.module is not None or name == "treebased.tdm" or hasattr(
        md, "train_forward"
    )
