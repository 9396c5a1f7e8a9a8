"""AutoFIS: automatic feature-interaction selection (AutoDeepFM).

Parity target: reference models/rank/autofis/net.py:40-102 — DeepFM whose
pairwise FM interactions are gated by a learnable mask over all C(F,2)
pairs, trained in two stages (dygraph_model.py:48-70):

  * stage 0 (search): dense weights use Adam, the gate uses **GRDA** so
    gates shrink exactly to zero; surviving pairs form ``comb_mask``;
  * stage 1 (retrain): only the selected pairs are kept, gates become
    plain trainable weights under Adam.

TPU-first: all pairs are materialized as two static index vectors and the
pairwise products run as one gathered elementwise-multiply + reduction —
no per-pair Python loop; the two-optimizer split is an
``optax.multi_transform`` keyed on the parameter path.
"""

from __future__ import annotations

from itertools import combinations
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP
from paddlerec_tpu.train.optimizers import grda


def _batch_standardize(x, scale=None, bias=None, eps=1e-5):
    """Training-mode BatchNorm computation, stateless: per-feature
    statistics over the batch axis."""
    mean = x.mean(0, keepdims=True)
    var = x.var(0, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out


class AutoFISNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    num_fields: int
    width: int = 700
    depth: int = 5
    comb_mask: Optional[tuple] = None  # stage-1: indices of kept pairs

    @nn.compact
    def __call__(self, sparse_ids, dense):
        fused = SlotEmbedding(
            self.vocab_size, self.embedding_dim + 1, name="embedding"
        )(sparse_ids)
        xv = fused[..., : self.embedding_dim]  # (B, F, E)
        xw = fused[..., self.embedding_dim]  # (B, F) first-order
        first = xw.sum(1)

        # reference bin_mlp interleaves BatchNorm before each ReLU
        # (net.py use_bn=True); stateless batch-stat normalization (the
        # training-mode BN computation, no running averages) keeps the
        # one-pytree functional step
        h = xv.reshape(xv.shape[0], -1)
        for i in range(self.depth):
            h = nn.Dense(self.width, name=f"bin_fc{i}")(h)
            h = _batch_standardize(h, self.param(
                f"bin_bn{i}_scale", nn.initializers.ones, (self.width,)
            ), self.param(
                f"bin_bn{i}_bias", nn.initializers.zeros, (self.width,)
            ))
            h = nn.relu(h)
        h = nn.Dense(1, name="bin_out")(h)[:, 0]

        pairs = list(combinations(range(self.num_fields), 2))
        if self.comb_mask is not None:
            pairs = [pairs[i] for i in self.comb_mask]
        left = jnp.asarray([p[0] for p in pairs])
        right = jnp.asarray([p[1] for p in pairs])
        inter = (xv[:, left, :] * xv[:, right, :]).sum(-1)  # (B, P)
        # PER-PAIR standardization over the batch (reference
        # nn.BatchNorm(pairs), scale/bias disabled): LayerNorm across
        # the pair axis coupled every pair within a sample and changed
        # which gates GRDA drives to zero
        inter = _batch_standardize(inter)
        gate = self.param(
            "interaction_mask",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, 0.599, 0.601),
            (len(pairs),),
        )
        fm_out = (inter * gate).sum(-1)
        return first + fm_out + h


@register_model("rank.autofis")
class ModelDef(CTRModelDef):
    def __init__(self, config: Config):
        super().__init__(config)
        self.stage = int(config.get("stage", 0))
        self.num_fields = int(config.hyper("num_inputs", self.num_sparse))
        self.num_sparse = self.num_fields
        self.vocab_size = int(config.hyper("input_size", self.vocab_size))
        self.embedding_dim = int(
            config.hyper("embedding_size", self.embedding_dim)
        )
        comb_mask = config.hyper("comb_mask", None)
        if self.stage == 1 and comb_mask is not None:
            comb_mask = tuple(int(i) for i in comb_mask)
        else:
            comb_mask = None
        self.dense_dim = 0
        self.sparse_embed_logical_dim = self.embedding_dim + 1  # fused lane
        self.module = AutoFISNet(
            self.vocab_size,
            self.embedding_dim,
            self.num_fields,
            int(config.hyper("width", 700)),
            int(config.hyper("depth", 5)),
            comb_mask,
        )

    def model_inputs(self, batch):
        return (batch["sparse"], None)

    def create_optimizer(self):
        lr = float(self.config.hyper("optimizer.learning_rate", 0.001))
        if self.stage == 1:
            return optax.adam(lr)
        # search stage: GRDA drives the gate sparse, Adam trains the rest
        # (dygraph_model.py:51-70)
        c = float(self.config.hyper("grad_c", 0.0005))
        mu = float(self.config.hyper("grad_mu", 0.8))

        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "gate"
                if any(
                    getattr(p, "key", None) == "interaction_mask"
                    for p in path
                )
                else "dense",
                params,
            )

        return optax.multi_transform(
            {"dense": optax.adam(lr), "gate": grda(lr, c=c, mu=mu)}, label_fn
        )

    def selected_pairs(self, params, threshold: float = 0.0):
        """Host-side: indices of surviving pairs after the search stage
        (the comb_mask the reference saves to comb_mask.npy)."""
        gate = np.asarray(params["interaction_mask"])
        return np.nonzero(np.abs(gate) > threshold)[0].tolist()
