"""Post-training compression of exported inference artifacts.

Parity target: the reference UAPI ships ``compression()`` (PaddleSlim
auto-compression producing a smaller serving model,
uapi_rec/base/model.py).  The TPU-era equivalent is post-training
quantization of the artifact's dominant mass — the embedding tables —
to int8 with per-row absmax scales (4× smaller than f32, 2× smaller
than bf16; dense tower params stay f32, they are KBs).  Dequantization
happens once at load: serving-side compute is byte-identical code.

    python -m paddlerec_tpu.tools.compress --export_dir exported_model \
        --out compressed_model

``tools/predict.py`` / serving load compressed artifacts transparently
(`load_exported` detects ``quantized.npz``).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

QUANT_FILE = "quantized.npz"
MIN_ROWS = 1024  # only quantize real tables, not tiny dense params


def _walk(params, path=()):
    if isinstance(params, dict):
        for k, v in params.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, params


def quantize_params(params, min_rows: int = MIN_ROWS):
    """Split a params tree into (small_leaves_tree, quantized_dict).

    quantized_dict maps 'a/b/c' → (q int8 (R,C), scale f32 (R,)).
    """
    from paddlerec_tpu.ops.sparse_update import set_path

    quant = {}
    small = params
    for path, leaf in list(_walk(params)):
        arr = np.asarray(leaf)
        if arr.ndim == 2 and arr.shape[0] >= min_rows and \
                np.issubdtype(arr.dtype, np.floating):
            f32 = arr.astype(np.float32)
            scale = np.abs(f32).max(axis=1) / 127.0
            scale = np.maximum(scale, 1e-12)
            q = np.clip(
                np.rint(f32 / scale[:, None]), -127, 127
            ).astype(np.int8)
            key = "/".join(path)
            quant[key] = (q, scale.astype(np.float32),
                          str(arr.dtype))
            # placeholder keeps the tree structure for the loader
            small = set_path(small, path, np.zeros((0,), np.float32))
    return small, quant


def dequantize_into(params, quant_npz) -> object:
    """Rebuild the full params tree from placeholders + quantized data."""
    from paddlerec_tpu.ops.sparse_update import set_path

    names = set()
    for k in quant_npz.files:
        if k.endswith("/q"):
            names.add(k[: -len("/q")])
    out = params
    for name in names:
        q = quant_npz[f"{name}/q"]
        scale = quant_npz[f"{name}/scale"]
        dtype = str(quant_npz[f"{name}/dtype"])
        dense = (q.astype(np.float32) * scale[:, None])
        import jax.numpy as jnp

        dense = jnp.asarray(dense).astype(dtype)
        out = set_path(out, tuple(name.split("/")), dense)
    return out


def compress_artifact(export_dir: str, out_dir: str,
                      min_rows: int = MIN_ROWS) -> str:
    from paddlerec_tpu.train import checkpoint as ckpt_lib

    with open(os.path.join(export_dir, "config.json")) as f:
        cfg = json.load(f)
    import jax

    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.core.registry import load_model_def

    model_def = load_model_def(Config(dict(cfg)))
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        model_def.init_params(jax.random.PRNGKey(0)),
    )
    params = ckpt_lib.load_params_only(export_dir, "params", abstract)
    params = jax.device_get(params)
    small, quant = quantize_params(params, min_rows)
    os.makedirs(out_dir, exist_ok=True)
    payload = {}
    for name, (q, scale, dtype) in quant.items():
        payload[f"{name}/q"] = q
        payload[f"{name}/scale"] = scale
        payload[f"{name}/dtype"] = np.asarray(dtype)
    np.savez_compressed(os.path.join(out_dir, QUANT_FILE), **payload)
    ckpt_lib.save_params_only(small, out_dir, "params")
    cfg["compressed"] = True
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)

    def tree_bytes(root):
        total = 0
        for r, _d, fs in os.walk(root):
            total += sum(os.path.getsize(os.path.join(r, x)) for x in fs)
        return total

    before, after = tree_bytes(export_dir), tree_bytes(out_dir)
    print(
        f"compressed {len(quant)} table(s): {before / 1e6:.1f} MB -> "
        f"{after / 1e6:.1f} MB ({before / max(after, 1):.1f}x)"
    )
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser(description="artifact compression")
    p.add_argument("--export_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--min_rows", type=int, default=MIN_ROWS)
    args = p.parse_args(argv)
    compress_artifact(args.export_dir, args.out, args.min_rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
