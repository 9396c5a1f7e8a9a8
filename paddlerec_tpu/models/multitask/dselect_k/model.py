"""DSelect-K: differentiable top-k expert selection on MultiMNIST.

Parity target: reference models/multitask/dselect_k/net.py —
  * SmoothStep gate (cubic ramp on [-γ/2, γ/2], net.py:121-137);
  * DSelectkGate: k "single-expert selectors", each a product of
    ``ceil(log2(E))`` smooth-step bits matched against each expert's binary
    code, mixed by a softmax over selector weights (net.py:221-244);
  * conv experts over 36×36 two-digit MNIST images (net.py:22-87), two
    10-class towers (left/right digit), accuracy metrics
    (dygraph_model.py:64-69).

TPU-first notes: experts run as one batched conv (vmapped parameters would
serialize; instead channels are fused — E experts share a conv tower with
E×50 output units reshaped to (E, 50)), gate algebra is pure VPU math.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _sym_uniform(scale: float):
    """Uniform(-scale, scale) — paddle's Uniform init is symmetric."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import AccuracyModelDef, Aux


def smooth_step(x, gamma: float = 1.0):
    """Cubic smooth step: 0 below -γ/2, 1 above γ/2 (net.py:121-137)."""
    a3 = -2.0 / gamma**3
    a1 = 3.0 / (2.0 * gamma)
    y = a3 * x**3 + a1 * x + 0.5
    return jnp.where(x <= -gamma / 2, 0.0, jnp.where(x >= gamma / 2, 1.0, y))


class DSelectKGate(nn.Module):
    """Static (input-independent) DSelect-K gate (net.py:140-244)."""

    expert_num: int
    num_nonzeros: int
    gamma: float = 1.0

    @nn.compact
    def __call__(self, experts):
        # experts: (B, E, S)
        num_binary = max(1, math.ceil(math.log2(self.expert_num)))
        z_logits = self.param(
            "z_logits",
            _sym_uniform(self.gamma / 100.0),
            (self.num_nonzeros, 1, num_binary),
        )
        w_logits = self.param(
            "w_logits", _sym_uniform(1.0), (self.num_nonzeros, 1)
        )
        # binary code of each expert id: (1, E, num_binary) in {0,1}
        codes = (
            (np.arange(self.expert_num)[:, None]
             >> np.arange(num_binary - 1, -1, -1)[None, :]) & 1
        ).astype(np.float32)[None]
        acts = smooth_step(z_logits, self.gamma)  # (k, 1, nb)
        # selector i selects expert e with prob Π_b code? act : 1-act
        sel = jnp.prod(
            jnp.where(codes > 0.5, acts, 1.0 - acts), axis=2
        )  # (k, E)
        sel_w = nn.softmax(w_logits, axis=0)  # (k, 1)
        expert_weights = jnp.sum(sel_w * sel, axis=0)  # (E,)
        return jnp.einsum("bes,e->bs", experts, expert_weights)


class ConvExperts(nn.Module):
    """E conv experts fused into one tower: conv stacks are shared-shape, so
    they run as grouped channels (10E / 20E) — one MXU-friendly conv instead
    of E small ones (reference runs them as a Python loop, net.py:323-328)."""

    expert_num: int
    expert_size: int

    @nn.compact
    def __call__(self, images):
        e = self.expert_num
        x = nn.Conv(10 * e, (5, 5), padding="VALID", feature_group_count=1,
                    name="conv1")(images)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(20 * e, (5, 5), padding="VALID",
                    feature_group_count=e, name="conv2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        b = x.shape[0]
        # (B, 6, 6, 20E) → per-expert flatten
        x = x.reshape(b, 6 * 6, e, 20).transpose(0, 2, 1, 3).reshape(b, e, -1)
        # per-expert MLP head (linear1 → relu → linear3 of ExpertLayer,
        # net.py:47-86) as batched einsums over the expert axis
        w1 = self.param(
            "fc1_w", nn.initializers.lecun_normal(), (e, x.shape[-1], 50)
        )
        b1 = self.param("fc1_b", nn.initializers.zeros, (e, 50))
        h = nn.relu(jnp.einsum("bei,eio->beo", x, w1) + b1)
        w3 = self.param(
            "fc3_w", nn.initializers.lecun_normal(), (e, 50, self.expert_size)
        )
        b3 = self.param("fc3_b", nn.initializers.zeros, (e, self.expert_size))
        return jnp.einsum("bei,eio->beo", h, w3) + b3


class DSelectKNet(nn.Module):
    expert_num: int
    expert_size: int
    tower_size: int
    gate_num: int
    top_k: int

    @nn.compact
    def __call__(self, images):
        experts = nn.relu(
            ConvExperts(self.expert_num, self.expert_size, name="experts")(
                images
            )
        )
        mixed = DSelectKGate(self.expert_num, self.top_k, name="gate")(experts)
        outs = []
        for i in range(self.gate_num):
            h = nn.relu(nn.Dense(50, name=f"tower_{i}_fc1")(mixed))
            h = nn.relu(nn.Dense(50, name=f"tower_{i}_fc2")(h))
            logits = nn.Dense(10, name=f"tower_{i}_out")(h)
            outs.append(logits)
        return tuple(outs)


@register_model("multitask.dselect_k")
class ModelDef(AccuracyModelDef):
    metric_names = ("left", "right")

    def __init__(self, config: Config):
        super().__init__(config)
        self.module = DSelectKNet(
            int(config.hyper("expert_num", 8)),
            int(config.hyper("expert_size", 50)),
            int(config.hyper("tower_size", 8)),
            int(config.hyper("gate_num", 2)),
            int(config.hyper("top_k", 2)),
        )

    def model_inputs(self, batch):
        return (batch["image"],)

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        return {
            "image": rng.rand(batch_size, 36, 36, 1).astype(np.float32),
            "labels": rng.randint(0, 10, (batch_size, 2)).astype(np.int32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        logits_l, logits_r = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        labels = batch["labels"]
        mask = batch.get("mask")
        w = mask if mask is not None else jnp.ones(labels.shape[0])
        n = jnp.maximum(w.sum(), 1.0)

        def xent(logits, y):
            logp = nn.log_softmax(logits)
            return -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]

        loss = (
            (xent(logits_l, labels[:, 0]) + xent(logits_r, labels[:, 1])) * w
        ).sum() / n
        aux: Aux = {
            # confidence of the left-digit prediction — gives the export/
            # predict tooling a per-row scalar to write
            "probs": nn.softmax(logits_l).max(-1),
            "correct_left": (logits_l.argmax(-1) == labels[:, 0]).astype(
                jnp.float32
            ),
            "correct_right": (logits_r.argmax(-1) == labels[:, 1]).astype(
                jnp.float32
            ),
        }
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def metric_updates(self, aux):
        mask = aux.get("mask")
        return {
            "left": (aux["correct_left"], mask),
            "right": (aux["correct_right"], mask),
        }

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        import jax as _jax

        files = shard_files(
            list_data_files(data_dir), _jax.process_index(), _jax.process_count()
        )
        return MultiMNISTDataset(files, batch_size)


class MultiMNISTDataset:
    """Pickle files of (x: (N, 36*36) uint8, y: (N, 2) labels) — the
    reference's MultiMNIST format (multiMNIST_reader.py:29-41)."""

    def __init__(self, files, batch_size):
        self.files = [f for f in files if f.endswith((".pickle", ".pkl"))]
        self.batch_size = batch_size

    def __iter__(self):
        import pickle

        bs = self.batch_size
        for path in self.files:
            with open(path, "rb") as f:
                x, y = pickle.load(f)
            x = np.asarray(x, np.float32).reshape(-1, 36, 36, 1) / 255.0
            y = np.asarray(y, np.int64).reshape(len(x), -1)[:, :2]
            for i in range(0, len(x), bs):
                xi = x[i : i + bs]
                yi = y[i : i + bs]
                valid = len(xi)
                if valid < bs:  # masked partial tail — don't drop rows
                    xi = np.concatenate(
                        [xi, np.zeros((bs - valid,) + xi.shape[1:],
                                      xi.dtype)]
                    )
                    yi = np.concatenate(
                        [yi, np.zeros((bs - valid,) + yi.shape[1:],
                                      yi.dtype)]
                    )
                m = np.zeros(bs, np.float32)
                m[:valid] = 1.0
                yield {
                    "image": xi,
                    "labels": yi.astype(np.int32),
                    "mask": m,
                }
