"""Slot schema: describes the on-disk slot:feasign text format.

The reference encodes this per-model inside each reader class
(e.g. `models/rank/deepfm/criteo_reader.py:46-59`: 26 sparse slots named
"1".."26", a label slot "click", and a 13-wide dense slot).  We lift it into
a declarative :class:`SlotSchema` that the generic reader consumes, so new
datasets are a schema, not a new reader.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence


@dataclass
class SlotSchema:
    """Schema for slot:feasign text data.

    Attributes:
      label_slot: slot name carrying the label (e.g. "click"); parsed float.
      sparse_slots: ordered sparse slot names; each contributes int ids.
      dense_slots: ordered dense slot names.
      dense_dims: widths of each dense slot.
      ids_per_slot: fixed ids emitted per sparse slot (pad/truncate to this);
        1 for Criteo-style one-hot slots, >1 for multi-hot.
      padding_id: id used to pad missing sparse slots (reference pads 0,
        criteo_reader.py:59).
    """

    label_slot: str = "click"
    sparse_slots: List[str] = field(default_factory=list)
    dense_slots: List[str] = field(default_factory=list)
    dense_dims: List[int] = field(default_factory=list)
    ids_per_slot: int = 1
    padding_id: int = 0
    num_labels: int = 1

    @property
    def num_sparse(self) -> int:
        return len(self.sparse_slots)

    @property
    def dense_dim(self) -> int:
        return sum(self.dense_dims)

    @staticmethod
    def criteo(num_sparse: int = 26, dense_dim: int = 13) -> "SlotSchema":
        return SlotSchema(
            label_slot="click",
            sparse_slots=[str(i) for i in range(1, num_sparse + 1)],
            dense_slots=["dense_feature"],
            dense_dims=[dense_dim],
        )


def schema_from_config(cfg) -> SlotSchema:
    """Build a schema from reference-style hyper_parameters keys.

    ``sparse_inputs_slots`` counts the label slot too (reference
    `models/rank/deepfm/config.yaml:48` uses 27 = click + 26).
    Optional overrides: ``runner.sparse_slots`` (space-separated names),
    ``runner.dense_slots`` (e.g. "dense_feature:13").
    """
    sparse_names: Optional[str] = cfg.runner("sparse_slots")
    dense_spec: Optional[str] = cfg.runner("dense_slots")
    label_slot = cfg.runner("label_slot", "click")

    if sparse_names:
        names = sparse_names.split()
        if names and names[0] == label_slot:
            names = names[1:]
    else:
        n = int(cfg.hyper("sparse_inputs_slots", 27)) - 1
        names = [str(i) for i in range(1, n + 1)]

    if dense_spec:
        dense_slots, dense_dims = [], []
        for item in dense_spec.split():
            name, _, dim = item.partition(":")
            dense_slots.append(name)
            dense_dims.append(int(dim) if dim else 1)
    else:
        d = int(cfg.hyper("dense_input_dim", 0))
        dense_slots = ["dense_feature"] if d else []
        dense_dims = [d] if d else []

    return SlotSchema(
        label_slot=label_slot,
        sparse_slots=names,
        dense_slots=dense_slots,
        dense_dims=dense_dims,
        ids_per_slot=int(cfg.runner("ids_per_slot", 1)),
    )
