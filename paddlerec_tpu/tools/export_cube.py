"""Export a trained model's embedding tables to cube KV shards.

Parity target: the reference's serving-side table dump pipeline
(tools/inference/cpp README + get_xbox_model.py): large sparse tables
leave the inference artifact and are published to the cube KV store the
serving fleet queries.

Usage:
    python -m paddlerec_tpu.tools.export_cube -m config.yaml \
        -o runner.model_init_path=output/3 \
        --out cube_out --shards 8
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from paddlerec_tpu.core.config import load_config, parse_overrides, resolve_path


def collect_embedding_tables(params, vocab_size: int, embedding_dim: int):
    """Find embedding params in a pytree and unpack them to (keys, values).

    Packed (R, 128) tables unpack via ops.packed_embedding.unpack_table;
    plain (V, E) tables pass through."""
    from paddlerec_tpu.ops.embedding import EMBEDDING_PARAM_NAME
    from paddlerec_tpu.ops.packed_embedding import unpack_table

    tables = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        if not hasattr(node, "shape") or len(getattr(node, "shape", ())) != 2:
            return
        # exact path-component match: a substring test would also pick up
        # the all-zero 'embedding_delta' grad-tap param under sparse_update
        # and export it as a spurious zero-valued cube table.  The LEAF
        # name must be checked too — the tap lives under a module that is
        # itself named 'embedding', so a parent-component match alone
        # still lets it through.
        if path and str(path[-1]) == "embedding_delta":
            return
        if not any(str(p) == EMBEDDING_PARAM_NAME for p in path):
            return
        arr = np.asarray(node)
        name = "/".join(path)
        dense = None
        if arr.shape[1] == 128 and vocab_size:
            # packed table: infer the lane-window width from the row count
            # (models fuse extra lanes, e.g. deepfm's dim+1 w1 lane, so the
            # window may be wider than sparse_feature_dim).  mp-sharded
            # tables carry a few padding rows (rounded up to an mp
            # multiple), so rows may exceed the exact base slightly.
            # Widths are tried DESCENDING: the true width has the largest
            # base that still fits under the row count (padding < base/2),
            # while an ascending scan would match the next-narrower width
            # whenever rows > base (its window [base_narrow, 2*base_narrow)
            # contains every wider table's row count).
            for w in (128, 64, 32, 16, 8):
                pack = 128 // w
                base = (vocab_size + pack - 1) // pack
                if base <= arr.shape[0] < 2 * base:
                    dense = unpack_table(arr[:base], vocab_size, w)
                    break
        if dense is None:
            dense = arr[:vocab_size] if arr.shape[0] >= vocab_size else arr
        tables[name] = dense

    walk(params, ())
    return tables


def main(argv=None):
    parser = argparse.ArgumentParser(description="export tables to cube KV")
    parser.add_argument("-m", "--config_yaml", required=True)
    parser.add_argument("-o", "--opt", nargs="*", default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--shards", type=int, default=1)
    args = parser.parse_args(argv)

    config = load_config(args.config_yaml, parse_overrides(args.opt))
    from paddlerec_tpu.native.cube import export_table
    from paddlerec_tpu.train.trainer import Trainer, logger

    trainer = Trainer(config)
    trainer.init_state()
    init_path = resolve_path(config, "runner.model_init_path")
    if init_path:
        trainer.load_checkpoint(
            os.path.dirname(init_path), os.path.basename(init_path),
            params_only=True,
        )
    md = trainer.model_def
    import jax

    params = jax.device_get(trainer.state.params)
    tables = collect_embedding_tables(
        params,
        int(config.hyper("sparse_feature_number", 0)),
        int(config.hyper("sparse_feature_dim", 0)),
    )
    if not tables:
        logger.warning("no embedding tables found in params")
        return 1
    for name, dense in tables.items():
        out_dir = os.path.join(args.out, name.replace("/", "_"))
        keys = np.arange(len(dense), dtype=np.int64)
        paths = export_table(out_dir, keys, dense.astype(np.float32),
                             args.shards)
        logger.info(
            f"exported table {name} ({dense.shape[0]}x{dense.shape[1]}) "
            f"to {len(paths)} cube shards under {out_dir}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
