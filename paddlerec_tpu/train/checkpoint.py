"""Checkpoint save/load.

Parity with the reference's artifact layout (`tools/utils/save_load.py`):
per-epoch numbered directories under ``runner.model_save_path`` containing
params (+ optimizer state for exact resume).  Uses orbax for the on-disk
format; a ``donefile.txt`` in the save root records the latest finished
epoch (the single-machine analog of flow_helper's donefile protocol,
`tools/utils/static_ps/flow_helper.py:287-371`) so resume is one read.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

DONEFILE = "donefile.txt"


def _abs_root(root: str) -> str:
    # remote roots (gs:// — orbax writes them via tensorstore) must not
    # be abspath'd into ./gs:/...
    return root if "://" in root else os.path.abspath(root)


def _ckpt_dir(root: str, tag) -> str:
    return os.path.join(_abs_root(root), str(tag))


def save_model(params: Any, opt_state: Any, root: str, tag,
               extra: Any = None) -> str:
    """Save params+opt (+ sparse-update side state) under root/tag and
    update the donefile."""
    path = _ckpt_dir(root, tag)
    ckpt = ocp.StandardCheckpointer()
    state = {"params": params, "opt_state": opt_state}
    if extra is not None:
        state["extra"] = extra
    ckpt.save(
        os.path.join(path, "state"),
        state,
        force=True,
    )
    ckpt.wait_until_finished()
    # multi-host: EVERY process must call save (orbax rendezvouses via
    # sync_global_devices; a rank-0-only call deadlocks the cluster) but
    # only the primary writes the donefile
    if jax.process_index() == 0:
        from paddlerec_tpu.utils.fs import get_fs

        done = os.path.join(_abs_root(root), DONEFILE)
        get_fs(done).append_line(done, f"{tag}\t{path}")
    return path


def load_model(root: str, tag, abstract_state: Optional[Any] = None
               ) -> Tuple[Any, Any, Any]:
    """Load (params, opt_state, extra) from root/tag; ``extra`` is None
    for checkpoints saved without sparse-update side state.

    abstract_state: optional {"params":..., "opt_state":...} pytree of
    jax.ShapeDtypeStruct (with shardings) — restores the original pytree
    structure directly into the target device layout.
    """
    path = os.path.join(_ckpt_dir(root, tag), "state")
    ckpt = ocp.StandardCheckpointer()
    if abstract_state is not None:
        restored = ckpt.restore(path, abstract_state)
    else:
        restored = ckpt.restore(path)
    return (restored["params"], restored["opt_state"],
            restored.get("extra"))


def last_saved_tag(root: str) -> Optional[str]:
    """Latest tag recorded in the donefile (resume point), or None."""
    from paddlerec_tpu.utils.fs import get_fs

    done = os.path.join(_abs_root(root), DONEFILE)
    fs = get_fs(done)
    if not fs.exists(done):
        return None
    lines = [l.strip() for l in fs.read_text(done).splitlines() if l.strip()]
    if not lines:
        return None
    return lines[-1].split("\t")[0]


def save_params_only(params: Any, root: str, tag) -> str:
    """Inference-model analog: params without optimizer state."""
    path = _ckpt_dir(root, tag)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(path, "params"), jax.device_get(params), force=True)
    return path


def load_params_only(root: str, tag, abstract_params: Optional[Any] = None) -> Any:
    path = os.path.join(_ckpt_dir(root, tag), "params")
    ckpt = ocp.PyTreeCheckpointer()
    if abstract_params is not None:
        return ckpt.restore(path, item=abstract_params)
    return ckpt.restore(path)


def load_params_from_state(root: str, tag,
                           abstract_params: Optional[Any] = None) -> Any:
    """Restore ONLY the params subtree of a full train checkpoint.

    Export/inference tools use this so a checkpoint saved under any
    optimizer config loads without reconstructing that optimizer's state
    structure (a full-state restore demands an exactly matching
    opt_state pytree)."""
    path = os.path.join(_ckpt_dir(root, tag), "state")
    # structure-free read: the opt_state subtree restores as plain arrays
    # and is discarded, so no optimizer pytree needs reconstructing
    restored = ocp.PyTreeCheckpointer().restore(path)
    del abstract_params  # placement happens in the caller (put_like)
    return restored["params"]
