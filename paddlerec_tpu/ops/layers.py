"""Shared layer library for the model zoo (flax.linen).

Each layer re-implements an interaction family used across the reference's
models — behavior parity is cited per class; the implementations are fresh
TPU-friendly JAX: batched matmuls that map onto the MXU, no Python-level
dynamic control flow, static shapes throughout.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


def _act(name: str) -> Callable:
    return {
        "relu": nn.relu,
        "sigmoid": nn.sigmoid,
        "tanh": jnp.tanh,
        "gelu": nn.gelu,
        "leaky_relu": nn.leaky_relu,
        "prelu": nn.relu,  # PReLU handled separately where it matters
        "none": lambda x: x,
        "linear": lambda x: x,
    }[name]


class MLP(nn.Module):
    """Stacked fully-connected tower.

    Parity: the `fc_sizes` towers used by nearly every rank model
    (e.g. reference models/rank/dnn/net.py:48-68 builds Linear+ReLU stacks
    sized by ``fc_sizes`` with sqrt-fan-in-scaled normal init).
    """

    layer_sizes: Sequence[int]
    activation: str = "relu"
    output_activation: Optional[str] = None
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = _act(self.activation)
        for i, size in enumerate(self.layer_sizes):
            fan_in = x.shape[-1]
            x = nn.Dense(
                size,
                use_bias=self.use_bias,
                kernel_init=nn.initializers.normal(stddev=1.0 / jnp.sqrt(fan_in)),
                param_dtype=self.param_dtype,
                name=f"fc_{i}",
            )(x)
            if i < len(self.layer_sizes) - 1:
                x = act(x)
            elif self.output_activation:
                x = _act(self.output_activation)(x)
            else:
                x = act(x)
        return x


class FMFirstOrder(nn.Module):
    """First-order FM term: per-id scalar weight embedding, summed.

    Parity: reference models/rank/deepfm/net.py first-order branch
    (a rank-1 embedding table plus dense linear weights).
    """

    vocab_size: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: Optional[jnp.ndarray] = None):
        from paddlerec_tpu.ops.packed_embedding import init_packed_table, packed_lookup

        w = self.param(
            "sparse_w",
            lambda key: init_packed_table(
                key, self.vocab_size, 1, stddev=1e-4, dtype=self.param_dtype
            ),
        )
        ids = (sparse_ids % self.vocab_size).astype(jnp.int32)
        first = packed_lookup(w, ids, 1).sum(axis=(-2, -1))  # (B,)
        if dense is not None:
            dense_w = self.param(
                "dense_w",
                nn.initializers.normal(stddev=1e-4),
                (dense.shape[-1],),
                self.param_dtype,
            )
            first = first + dense @ dense_w
        bias = self.param("bias", nn.initializers.zeros, (), self.param_dtype)
        return first + bias


def fm_second_order(emb: jnp.ndarray) -> jnp.ndarray:
    """FM second-order interaction: 0.5 * ((Σv)² − Σv²) summed over dim.

    emb: (B, S, E) field embeddings → (B,) interaction scalar.
    Parity: models/rank/deepfm/net.py:116-137 (sum-square minus square-sum).
    """
    summed = emb.sum(axis=1)  # (B, E)
    sum_sq = summed * summed
    sq_sum = (emb * emb).sum(axis=1)
    return 0.5 * (sum_sq - sq_sum).sum(axis=-1)


class FMInteraction(nn.Module):
    """Second-order FM over field embeddings; returns (B,) or (B, E)."""

    reduce_dim: bool = True

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        summed = emb.sum(axis=1)
        sq_sum = (emb * emb).sum(axis=1)
        pair = 0.5 * (summed * summed - sq_sum)  # (B, E)
        return pair.sum(axis=-1) if self.reduce_dim else pair


class CrossNet(nn.Module):
    """DCN-v1 cross layers: x_{l+1} = x0 * (x_l · w_l) + b_l + x_l.

    Parity: reference models/rank/dcn/net.py cross network.
    """

    num_layers: int
    # the reference DCN shares ONE (layer_w, layer_b) across all cross
    # layers (net.py:117-138); per-layer params are the DCN-paper
    # variant — reference parity uses share_weights=True
    share_weights: bool = False
    # when True, also return Σ_layers ||x ⊙ w||² — the reference's
    # l2_reg_cross penalizes the per-batch PRODUCT, not the raw weights
    return_l2: bool = False
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x0: jnp.ndarray):
        d = x0.shape[-1]
        x = x0
        if self.share_weights:
            w_shared = self.param(
                "layer_w", nn.initializers.normal(1.0 / jnp.sqrt(d)), (d,),
                self.param_dtype,
            )
            b_shared = self.param(
                "layer_b", nn.initializers.zeros, (d,), self.param_dtype
            )
        l2 = 0.0
        for i in range(self.num_layers):
            if self.share_weights:
                w, b = w_shared, b_shared
            else:
                w = self.param(
                    f"w_{i}", nn.initializers.normal(1.0 / jnp.sqrt(d)),
                    (d,), self.param_dtype,
                )
                b = self.param(
                    f"b_{i}", nn.initializers.zeros, (d,), self.param_dtype
                )
            xw = (x * w).sum(axis=-1, keepdims=True)  # (B, 1)
            if self.return_l2:
                l2 = l2 + jnp.sum((x * w) ** 2)
            x = x0 * xw + b + x
        if self.return_l2:
            return x, l2
        return x


class CrossNetV2(nn.Module):
    """DCN-v2 cross: x_{l+1} = x0 ⊙ (W_l x_l + b_l) + x_l.

    Parity: models/rank/dcn_v2/net.py:214-226. Full-rank W maps onto the MXU.
    """

    num_layers: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        d = x0.shape[-1]
        x = x0
        for i in range(self.num_layers):
            xw = nn.Dense(
                d,
                kernel_init=nn.initializers.normal(1.0 / jnp.sqrt(d)),
                param_dtype=self.param_dtype,
                name=f"cross_{i}",
            )(x)
            x = x0 * xw + x
        return x


class CrossNetMix(nn.Module):
    """DCN-v2 low-rank mixture-of-experts cross layer.

    x_{l+1} = Σ_e G_e(x_l) · (x0 ⊙ U_e g(C_e g(V_eᵀ x_l)) + b_e) + x_l
    Parity: models/rank/dcn_v2/net.py:229-330 (low_rank, num_experts, gating).
    """

    num_layers: int
    low_rank: int = 32
    num_experts: int = 4
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        d = x0.shape[-1]
        r, e = self.low_rank, self.num_experts
        # Deliberate init deviation from the reference's XavierNormal
        # (net.py:240-265): a round-5 A/B on the criteo-scale fm corpus
        # measured normal(1/sqrt(d)) at 0.7682 test AUC (rank 32) vs
        # Xavier's 0.7321 — Xavier's fan_in = d*r shrinks the expert
        # path ~4-11x with rank, starving the cross signal so training
        # leans on the deep tower.  Rank-independent 1/sqrt(d) keeps the
        # expert output O(1); both inits were also measured identical
        # (additive wall) on the cross corpus (doc/benchmark.md).
        init = nn.initializers.normal(1.0 / jnp.sqrt(d))
        x = x0
        for layer in range(self.num_layers):
            u = self.param(f"U_{layer}", init, (e, d, r), self.param_dtype)
            v = self.param(f"V_{layer}", init, (e, d, r), self.param_dtype)
            c = self.param(f"C_{layer}", init, (e, r, r), self.param_dtype)
            b = self.param(f"b_{layer}", nn.initializers.zeros, (d,), self.param_dtype)
            gate_w = self.param(f"gate_{layer}", init, (e, d), self.param_dtype)

            # gates: (B, e)
            gates = jax.nn.softmax(x @ gate_w.T, axis=-1)
            # expert outputs, batched over experts on the MXU:
            # (e, B, r) = einsum(B d, e d r)
            vx = jnp.einsum("bd,edr->ebr", x, v)
            vx = jnp.tanh(vx)
            cvx = jnp.einsum("ebr,ers->ebs", vx, c)
            cvx = jnp.tanh(cvx)
            ux = jnp.einsum("ebr,edr->ebd", cvx, u)  # (e, B, d)
            expert_out = x0[None] * (ux + b)  # (e, B, d)
            mixed = jnp.einsum("ebd,be->bd", expert_out, gates)
            x = mixed + x
        return x


class CIN(nn.Module):
    """Compressed Interaction Network (xDeepFM).

    Layer k: X^k_{h} = Σ_{i,j} W^k_{h,i,j} (X^{k-1}_i ∘ X^0_j), implemented
    as an outer product over fields followed by a 1x1 conv — expressed here
    as one einsum per layer so XLA lowers it to MXU matmuls.
    Parity: models/rank/xdeepfm/net.py:123-205.
    """

    layer_sizes: Sequence[int]
    split_half: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        # emb: (B, F, E)
        b, f0, e = emb.shape
        x0 = emb
        xk = emb
        outputs = []
        for k, size in enumerate(self.layer_sizes):
            fk = xk.shape[1]
            w = self.param(
                f"cin_w_{k}",
                nn.initializers.normal(1.0 / jnp.sqrt(fk * f0)),
                (size, fk, f0),
                self.param_dtype,
            )
            # z: (B, fk, f0, E) outer interactions; contract with W → (B, size, E)
            z = jnp.einsum("bie,bje->bije", xk, x0)
            xk_next = jnp.einsum("bije,hij->bhe", z, w)
            if self.split_half and k < len(self.layer_sizes) - 1:
                if size % 2:
                    raise ValueError("split_half requires even CIN layer sizes")
                half = size // 2
                direct, xk = xk_next[:, :half], xk_next[:, half:]
            else:
                direct, xk = xk_next, xk_next
            outputs.append(direct.sum(axis=-1))  # (B, size_out)
        return jnp.concatenate(outputs, axis=-1)


class TargetAttention(nn.Module):
    """DIN-style target attention over a behavior history.

    score = MLP(concat[hist, target, hist − target, hist * target]) per
    position, masked softmax over the sequence, weighted-sum of history.
    Parity: models/rank/din/net.py:139-184.
    """

    hidden_sizes: Sequence[int] = (80, 40)
    use_softmax: bool = True
    # DIN scales scores by dim^-0.5 before the softmax (net.py:170)
    scale_scores: bool = False
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        history: jnp.ndarray,  # (B, T, E)
        target: jnp.ndarray,  # (B, E)
        mask: jnp.ndarray,  # (B, T) 1=valid
    ) -> jnp.ndarray:
        t = history.shape[1]
        tgt = jnp.broadcast_to(target[:, None, :], history.shape)
        feat = jnp.concatenate(
            [history, tgt, history - tgt, history * tgt], axis=-1
        )  # (B, T, 4E)
        scores = MLP(
            list(self.hidden_sizes) + [1],
            activation="sigmoid",
            output_activation="none",
            param_dtype=self.param_dtype,
            name="att_mlp",
        )(feat)[..., 0]  # (B, T)
        if self.scale_scores:
            scores = scores * (history.shape[-1] ** -0.5)
        if self.use_softmax:
            scores = jnp.where(mask > 0, scores, -1e9)
            weights = jax.nn.softmax(scores, axis=-1)
        else:
            weights = scores * mask
        return jnp.einsum("bt,bte->be", weights, history)
