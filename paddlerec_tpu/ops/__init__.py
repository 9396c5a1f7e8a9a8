from paddlerec_tpu.ops.layers import (
    MLP,
    FMInteraction,
    FMFirstOrder,
    CrossNet,
    CrossNetV2,
    CrossNetMix,
    CIN,
    TargetAttention,
)
from paddlerec_tpu.ops.embedding import SlotEmbedding
