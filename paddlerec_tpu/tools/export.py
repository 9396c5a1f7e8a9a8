"""Export a trained checkpoint as a self-contained inference artifact.

The reference exports a static inference program via paddle.jit.to_static
(tools/to_static.py:48-96) consumed by paddle_inference / serving.  The
TPU-native artifact is:

    <export_dir>/
      config.yaml        — the (flattened) model config, self-describing
      params/            — orbax checkpoint of the parameters

Loading reconstructs the ModelDef from the registry and jits
``infer_forward`` — one artifact serves Python batch inference
(tools/predict.py), the serving demo (serving/), and offline eval.

Usage:
    python -m paddlerec_tpu.tools.export -m config.yaml \
        -o runner.model_init_path=output_model_deepfm/2
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Tuple

import jax

from paddlerec_tpu.core.config import Config, load_config, parse_overrides, resolve_path
from paddlerec_tpu.train import checkpoint as ckpt_lib
from paddlerec_tpu.train.trainer import Trainer, logger


def export_model(config: Config, export_dir: str, epoch_tag=None) -> str:
    trainer = Trainer(config)
    trainer.init_state()
    init_path = resolve_path(config, "runner.model_init_path")
    if epoch_tag is not None:
        load_root = resolve_path(config, "runner.infer_load_path")
        if not load_root:
            raise ValueError(
                "exporting a specific epoch requires "
                "runner.infer_load_path (the checkpoint root)"
            )
        trainer.load_checkpoint(load_root, epoch_tag, params_only=True)
    elif init_path:
        trainer.load_checkpoint(
            os.path.dirname(init_path), os.path.basename(init_path),
            params_only=True,
        )
    else:
        logger.warning(
            "no runner.model_init_path / epoch given — exporting FRESHLY "
            "INITIALIZED (untrained) parameters"
        )
    os.makedirs(export_dir, exist_ok=True)
    params = jax.device_get(trainer.state.params)
    cfg_out = {k: v for k, v in config.items() if _jsonable(v)}
    if getattr(trainer.model_def, "sparse_update_enabled", bool)():
        # training-only grad-tap deltas are all-zero and can be 100MB+;
        # drop them and flip the artifact to the plain lookup path
        # (numerically identical forward)
        params = _strip_deltas(params)
        cfg_out["hyper_parameters.sparse_update"] = False
    ckpt_lib.save_params_only(params, export_dir, "params")
    with open(os.path.join(export_dir, "config.json"), "w") as f:
        json.dump(cfg_out, f, indent=2)
    logger.info(f"exported inference artifact to {export_dir}")
    return export_dir


def _strip_deltas(params):
    """Remove 'embedding_delta' leaves (dict pytrees) recursively."""
    if isinstance(params, dict):
        return {
            k: _strip_deltas(v) for k, v in params.items()
            if k != "embedding_delta"
        }
    return params


def _jsonable(v) -> bool:
    try:
        json.dumps(v)
        return True
    except TypeError:
        return False


def load_exported(export_dir: str) -> Tuple[Any, Any]:
    """Returns (model_def, params) ready for jit(infer_forward).

    Transparently handles compressed artifacts (tools/compress.py):
    quantized tables restore from ``quantized.npz`` and dequantize into
    the full tree; small leaves come from the orbax checkpoint."""
    from paddlerec_tpu.core.registry import load_model_def

    with open(os.path.join(export_dir, "config.json")) as f:
        config = Config(json.load(f))
    model_def = load_model_def(config)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        model_def.init_params(jax.random.PRNGKey(0)),
    )
    quant_path = os.path.join(export_dir, "quantized.npz")
    if os.path.exists(quant_path):
        import numpy as np

        from paddlerec_tpu.ops.sparse_update import set_path
        from paddlerec_tpu.tools.compress import dequantize_into

        z = np.load(quant_path)
        names = {k[:-2] for k in z.files if k.endswith("/q")}
        for name in names:  # placeholders replace the quantized leaves
            abstract = set_path(
                abstract, tuple(name.split("/")),
                jax.ShapeDtypeStruct((0,), jax.numpy.float32),
            )
        params = ckpt_lib.load_params_only(export_dir, "params", abstract)
        return model_def, dequantize_into(params, z)
    params = ckpt_lib.load_params_only(export_dir, "params", abstract)
    return model_def, params


def main(argv=None):
    parser = argparse.ArgumentParser(description="export inference artifact")
    parser.add_argument("-m", "--config_yaml", required=True)
    parser.add_argument("-o", "--opt", nargs="*", default=None)
    parser.add_argument("--export_dir", default=None)
    parser.add_argument("--epoch", default=None)
    args = parser.parse_args(argv)
    config = load_config(args.config_yaml, parse_overrides(args.opt))
    export_dir = args.export_dir or resolve_path(
        config, "runner.export_dir", "exported_model"
    )
    export_model(config, export_dir, args.epoch)


if __name__ == "__main__":
    main()
