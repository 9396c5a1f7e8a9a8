"""slot_dnn: slot-based online-learning CTR DNN.

Parity target: reference models/rank/slot_dnn/ — structurally the CtrDnn
tower over per-slot embeddings, distinguished by its use of the full CTR
metric bundle (static_model.py:80-94 `ctr_metric_bundle`) for online
monitoring.  Our streaming AUC state already carries the full bundle
(mae/rmse/actual ctr/predicted ctr/copc/q — core/metrics.py), so this model
is the CtrDnn net with bundle-reporting semantics.
"""

from __future__ import annotations

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.rank.dnn.model import ModelDef as DnnModelDef


@register_model("rank.slot_dnn")
class ModelDef(DnnModelDef):
    pass
