"""Matched-form probe learner for the v3 synthetic quality benchmark.

The posterior oracle (tools_dev/posterior_oracle.py) assumes every
planted parameter is observed DIRECTLY with Fisher information I*n_id.
That is exact for the additive scalar effects (an LR fit reaches its
0.690 ceiling within 0.007 — measured), but it over-credits the
pairwise-latent part: a real learner only sees latents through bilinear
products with co-occurring partner ids, a non-convex joint estimation
problem with far worse statistical efficiency than n_id direct draws.

This module is the honest "oracle given data" for that part: a model
whose hypothesis class IS the generative family (per-feasign scalar w,
per-feasign 4-dim latent used only in the six planted slot pairs, dense
linear, bias) fit by SGD on the train split.  No generic learner can be
expected to beat it — it knows the true functional form, so the ONLY
thing it has to do is estimate.  Its best test AUC therefore replaces
the direct-observation oracle as the realizable ceiling, and the
quality table certifies by "generic model within eps of matched-form".

Register: "dev.synth_pair" (import this module before building Trainer).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding

# the generator's planted pair structure (tools_dev/synth_model.py)
PAIR_SLOTS = [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11)]
LAT_DIM = 4


class SynthPairNet(nn.Module):
    """score = sum_s w[fs_s] + sum_{(a,b)} lat[fs_a].lat[fs_b]
             + dense @ beta + bias  — exactly synth_model.score()."""

    vocab_size: int
    init_stddev: float = 0.05  # symmetry breaking for the bilinear part
    table_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        fused = SlotEmbedding(
            self.vocab_size, 1 + LAT_DIM, name="embedding",
            init_stddev=self.init_stddev, param_dtype=self.table_dtype,
        )(sparse_ids)  # (B, S, 1+LAT): lane 0 = w, lanes 1: = latent
        first = fused[..., 0].sum(axis=1)
        lat = fused[..., 1:]
        second = jnp.zeros_like(first)
        for a, b in PAIR_SLOTS:
            second = second + (lat[:, a] * lat[:, b]).sum(axis=-1)
        beta = self.param(
            "dense_w", nn.initializers.normal(1e-2), (dense.shape[-1],)
        )
        bias = self.param("bias", nn.initializers.zeros, ())
        return first + second + dense @ beta + bias


class SynthFMNet(nn.Module):
    """Matched form for the v4 ("fm" pair_mode) corpus:
    score = sum_s w[fs_s] + sum_{a<b} lat[fs_a].lat[fs_b]
          + dense @ beta + bias — exactly synth_model.score(pair_mode=
    "fm"), i.e. a factorization machine with a scalar lane."""

    vocab_size: int
    init_stddev: float = 0.05
    table_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        fused = SlotEmbedding(
            self.vocab_size, 1 + LAT_DIM, name="embedding",
            init_stddev=self.init_stddev, param_dtype=self.table_dtype,
        )(sparse_ids)  # (B, S, 1+LAT): lane 0 = w, lanes 1: = latent
        first = fused[..., 0].sum(axis=1)
        lat = fused[..., 1:].astype(jnp.float32)
        tot = lat.sum(axis=1)
        second = 0.5 * ((tot * tot).sum(axis=-1)
                        - (lat * lat).sum(axis=(1, 2)))
        beta = self.param(
            "dense_w", nn.initializers.normal(1e-2), (dense.shape[-1],)
        )
        bias = self.param("bias", nn.initializers.zeros, ())
        return first + second + dense @ beta + bias


class SynthCrossNet(nn.Module):
    """Matched form for the v5 ("cross" pair_mode) corpus:
    score = sum_s w[fs_s] + sum_{a<b} lat[fs_a]^T M_ab lat[fs_b]
          + dense @ beta + bias — exactly synth_model.score(pair_mode=
    "cross"), with the per-pair bilinear maps M learned jointly.  M is
    population-level (325 pairs x 16 = 5200 params observed by every
    row), so the estimation burden stays on the per-feasign table, same
    as the fm probe."""

    vocab_size: int
    init_stddev: float = 0.05
    m_init_stddev: float = 0.5  # the generator prior's sigma_M = 1/sqrt(K)
    # when set, M is FIXED to the generator's true pair_matrix(seed)
    # instead of learned: the per-feasign-estimation-only ceiling, the
    # exact counterpart of the posterior oracle's M-known assumption.
    # The M-learned probe measures what JOINT bilinear SGD achieves —
    # the fair peer for dcn_v2, which also learns its cross weights.
    fixed_m_seed: int = -1
    table_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        s = sparse_ids.shape[1]
        k = LAT_DIM
        fused = SlotEmbedding(
            self.vocab_size, 1 + LAT_DIM, name="embedding",
            init_stddev=self.init_stddev, param_dtype=self.table_dtype,
        )(sparse_ids)  # (B, S, 1+LAT): lane 0 = w, lanes 1: = latent
        first = fused[..., 0].sum(axis=1)
        lat = fused[..., 1:].astype(jnp.float32)  # (B, S, K)
        if self.fixed_m_seed >= 0:
            import sys as _sys
            import os as _os

            _sys.path.insert(0, _os.path.dirname(
                _os.path.abspath(__file__)))
            import synth_model as _sm

            m = jnp.asarray(_sm.pair_matrix({"seed": self.fixed_m_seed}))
        else:
            m = self.param(
                "pair_m", nn.initializers.normal(self.m_init_stddev),
                (s, s, k, k),
            )
            m = m * jnp.triu(jnp.ones((s, s), bool), 1)[:, :, None, None]
        g2 = lat.reshape(lat.shape[0], s * k)
        m2 = m.transpose(0, 2, 1, 3).reshape(s * k, s * k)
        second = ((g2 @ m2) * g2).sum(axis=-1)
        beta = self.param(
            "dense_w", nn.initializers.normal(1e-2), (dense.shape[-1],)
        )
        bias = self.param("bias", nn.initializers.zeros, ())
        return first + second + dense @ beta + bias


@register_model("dev.synth_pair")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.sparse_embed_logical_dim = 1 + LAT_DIM
        self.module = SynthPairNet(
            self.vocab_size,
            init_stddev=float(config.hyper("probe_init_stddev", 0.05)),
            table_dtype=self.table_dtype(),
        )


@register_model("dev.synth_fm")
class FMModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.sparse_embed_logical_dim = 1 + LAT_DIM
        self.module = SynthFMNet(
            self.vocab_size,
            init_stddev=float(config.hyper("probe_init_stddev", 0.05)),
            table_dtype=self.table_dtype(),
        )


@register_model("dev.synth_cross")
class CrossModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.sparse_embed_logical_dim = 1 + LAT_DIM
        self.module = SynthCrossNet(
            self.vocab_size,
            init_stddev=float(config.hyper("probe_init_stddev", 0.05)),
            m_init_stddev=float(config.hyper("probe_m_init_stddev", 0.5)),
            fixed_m_seed=int(config.hyper("probe_fixed_m_seed", -1)),
            table_dtype=self.table_dtype(),
        )
