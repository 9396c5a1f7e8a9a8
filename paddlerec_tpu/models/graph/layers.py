"""GNN aggregation layers over fixed-fanout neighbor samples.

Parity target: reference models/graph/models/layers.py:32-302 — GIN,
GraphSAGE (mean/bow/max), GAT, LightGCN, TransformerConv.  The reference
aggregates over PGL edge lists with ``send_u_recv``; dynamic per-batch
edge sets don't jit, so the TPU formulation is **fixed-fanout dense
sampling**: every node carries K sampled neighbors, aggregation is a
masked reduction over the K axis (one VPU/MXU op, no segment scatter).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _masked_mean(x, mask):
    return (x * mask[..., None]).sum(-2) / jnp.maximum(
        mask.sum(-1, keepdims=True), 1.0
    )


def _masked_sum(x, mask):
    return (x * mask[..., None]).sum(-2)


def _l2norm(x):
    return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)


class GINConv(nn.Module):
    """self + Σ neigh → linear → act → +self (layers.py:32-62)."""

    hidden: int
    act: str = "relu"

    @nn.compact
    def __call__(self, self_feat, neigh_feats, neigh_mask):
        out = self_feat + _masked_sum(neigh_feats, neigh_mask)
        out = getattr(nn, self.act)(nn.Dense(self.hidden, name="lin")(out))
        return out + self_feat


class GraphSAGEMeanConv(nn.Module):
    hidden: int
    act: str = "relu"

    @nn.compact
    def __call__(self, self_feat, neigh_feats, neigh_mask):
        neigh = _masked_mean(neigh_feats, neigh_mask)
        out = nn.Dense(self.hidden, name="lin")(
            jnp.concatenate([self_feat, neigh], -1)
        )
        return _l2norm(getattr(nn, self.act)(out))


class GraphSAGEBowConv(nn.Module):
    hidden: int
    act: str = "relu"

    @nn.compact
    def __call__(self, self_feat, neigh_feats, neigh_mask):
        return _l2norm(self_feat + _masked_mean(neigh_feats, neigh_mask))


class GraphSAGEMaxConv(nn.Module):
    hidden: int
    act: str = "relu"

    @nn.compact
    def __call__(self, self_feat, neigh_feats, neigh_mask):
        neg = jnp.where(neigh_mask[..., None] > 0, neigh_feats, -1e9)
        neigh = neg.max(-2)
        neigh = jnp.where(neigh_mask.sum(-1, keepdims=True) > 0, neigh, 0.0)
        out = nn.Dense(self.hidden, name="lin")(
            jnp.concatenate([self_feat, neigh], -1)
        )
        return _l2norm(getattr(nn, self.act)(out))


class GATConv(nn.Module):
    """Single-head GAT attention over the sampled neighbors
    (layers.py:137-168)."""

    hidden: int
    act: str = "relu"

    @nn.compact
    def __call__(self, self_feat, neigh_feats, neigh_mask):
        h_self = nn.Dense(self.hidden, use_bias=False, name="w")(self_feat)
        h_neigh = nn.Dense(self.hidden, use_bias=False, name="w_n")(
            neigh_feats
        )
        a_src = nn.Dense(1, use_bias=False, name="a_src")(h_self)[..., 0]
        a_dst = nn.Dense(1, use_bias=False, name="a_dst")(h_neigh)[..., 0]
        e = nn.leaky_relu(a_src[..., None] + a_dst)
        e = jnp.where(neigh_mask > 0, e, -1e9)
        att = jax.nn.softmax(e, -1)
        neigh = jnp.einsum("...k,...kd->...d", att, h_neigh)
        out = nn.Dense(self.hidden, name="lin")(
            jnp.concatenate([self_feat, neigh], -1)
        )
        return getattr(nn, self.act)(out)


class LightGCNConv(nn.Module):
    """Pure degree-normalized propagation, no parameters
    (layers.py:171-191)."""

    hidden: int
    act: str = "relu"

    @nn.compact
    def __call__(self, self_feat, neigh_feats, neigh_mask):
        deg = jnp.maximum(neigh_mask.sum(-1, keepdims=True), 1.0)
        return _masked_sum(neigh_feats, neigh_mask) * jax.lax.rsqrt(deg)


class TransformerConvLayer(nn.Module):
    """Multi-head attention from self (query) to neighbors (keys/values),
    with a gated skip connection (layers.py:194-257)."""

    hidden: int
    act: str = "relu"
    heads: int = 4

    @nn.compact
    def __call__(self, self_feat, neigh_feats, neigh_mask):
        h, hd = self.heads, self.hidden // self.heads
        q = nn.Dense(h * hd, name="q")(self_feat)
        k = nn.Dense(h * hd, name="k")(neigh_feats)
        v = nn.Dense(h * hd, name="v")(neigh_feats)
        shp = neigh_feats.shape[:-2]
        kk = neigh_feats.shape[-2]
        qh = q.reshape(shp + (h, hd))
        kh = k.reshape(shp + (kk, h, hd))
        vh = v.reshape(shp + (kk, h, hd))
        scores = jnp.einsum("...hd,...khd->...hk", qh, kh) / hd**0.5
        scores = jnp.where(neigh_mask[..., None, :] > 0, scores, -1e9)
        att = jax.nn.softmax(scores, -1)
        out = jnp.einsum("...hk,...khd->...hd", att, vh).reshape(
            shp + (h * hd,)
        )
        skip = nn.Dense(self.hidden, name="skip")(self_feat)
        gate = nn.sigmoid(
            nn.Dense(1, name="gate")(
                jnp.concatenate([out, skip, out - skip], -1)
            )
        )
        out = gate * skip + (1 - gate) * out
        return getattr(nn, self.act)(out)


CONV_REGISTRY = {
    "gin": GINConv,
    "graphsage_mean": GraphSAGEMeanConv,
    "graphsage_bow": GraphSAGEBowConv,
    "graphsage_max": GraphSAGEMaxConv,
    "gat": GATConv,
    "lightgcn": LightGCNConv,
    "transformer_conv": TransformerConvLayer,
}
