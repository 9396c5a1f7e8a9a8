"""Export / predict / feature-importance tool flows."""

import numpy as np

from paddlerec_tpu.data.synthetic import write_criteo_sample
from paddlerec_tpu.tools.export import export_model, load_exported
from paddlerec_tpu.tools.predict import run_predict
from paddlerec_tpu.train.trainer import Trainer
from tests.conftest import small_config


def _trained_cfg(tmp_path):
    write_criteo_sample(str(tmp_path / "train"), num_lines=128, num_files=2,
                        vocab=5000)
    cfg = small_config(tmp_path, model="rank.deepfm")
    cfg["hyper_parameters.sparse_feature_number"] = 5000
    cfg["runner.model_save_path"] = str(tmp_path / "out")
    cfg["runner.infer_load_path"] = str(tmp_path / "out")
    cfg["runner.epochs"] = 1
    return cfg


def test_export_and_predict(tmp_path):
    cfg = _trained_cfg(tmp_path)
    Trainer(cfg).train()

    export_dir = str(tmp_path / "exported")
    export_model(cfg, export_dir, epoch_tag=0)

    model_def, params = load_exported(export_dir)
    assert model_def.registry_name == "rank.deepfm"

    outputs, report = run_predict(
        export_dir, str(tmp_path / "train"), batch_size=32
    )
    assert outputs and all(np.isfinite(o).all() for o in outputs)
    assert report["qps"] > 0


def test_feature_importance(tmp_path):
    from paddlerec_tpu.tools import feature_importance as fi

    cfg = _trained_cfg(tmp_path)
    Trainer(cfg).train()
    cfg["runner.model_init_path"] = str(tmp_path / "out" / "0")
    result = fi.run(cfg, [[0], [1, 2]])
    assert "baseline" in result and "0" in result and "1,2" in result
    assert 0.0 <= result["baseline"] <= 1.0
