"""MAML few-shot Omniglot classifier.

Parity target: reference models/multitask/maml/net.py (4× [conv3x3-64 →
BN → relu → maxpool2] → linear 64→5) with the MAML loop of
dygraph_model.py:60-109 — ``update_step`` inner SGD steps on the support
set, query loss evaluated after each step, outer optimizer minimizes the
final query loss; accuracy is query argmax accuracy.

TPU-native design: the inner loop is ``update_step`` functional SGD
updates (params pytree arithmetic inside jit), tasks run under
``lax.scan``; batch norm is transductive (normalize by the current batch —
standard for MAML and stateless, so the whole meta-step jits cleanly).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import AccuracyModelDef, Aux


class TransductiveBN(nn.Module):
    """Normalize by the current batch's statistics with learned scale/shift.

    MAML adapts through BN at meta-test time anyway, so running averages
    (reference BatchNorm2D momentum=0.9) are deliberately not kept: the
    stateless form is exact for the meta-objective and keeps the step pure.
    """

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class ConvNet(nn.Module):
    n_way: int = 5

    @nn.compact
    def __call__(self, images):  # (B, 28, 28, 1)
        x = images
        for i in range(4):
            x = nn.Conv(64, (3, 3), padding=1, name=f"conv_{i}")(x)
            x = TransductiveBN(name=f"bn_{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.n_way, name="head")(x)


@register_model("multitask.maml")
class ModelDef(AccuracyModelDef):
    metric_names = ("acc",)

    def __init__(self, config: Config):
        super().__init__(config)
        self.n_way = int(config.hyper("n_way", 5))
        self.k_spt = int(config.hyper("k_spt", 1))
        self.k_query = int(config.hyper("k_query", 15))
        self.imgsize = int(config.hyper("imgsize", 28))
        self.update_step = int(config.hyper("update_step", 5))
        self.inner_lr = float(config.hyper("base_optimizer.learning_rate", 0.1))
        self.module = ConvNet(self.n_way)

    def _base_optimizer(self):
        import optax

        lr = float(self.config.hyper("meta_optimizer.learning_rate", 0.001))
        return optax.adam(lr)

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        t, s = batch_size, self.imgsize
        ns, nq = self.n_way * self.k_spt, self.n_way * self.k_query
        return {
            "x_spt": rng.randn(t, ns, s, s, 1).astype(np.float32),
            "y_spt": rng.randint(0, self.n_way, (t, ns)).astype(np.int32),
            "x_qry": rng.randn(t, nq, s, s, 1).astype(np.float32),
            "y_qry": rng.randint(0, self.n_way, (t, nq)).astype(np.int32),
        }

    def init_with_batch(self, rng, batch):
        return self.module.init(rng, batch["x_spt"][0])["params"]

    def _loss(self, params, x, y):
        logits = self.module.apply({"params": params}, x)
        logp = nn.log_softmax(logits)
        loss = -jnp.take_along_axis(logp, y[:, None], axis=1).mean()
        return loss, logits

    def train_forward(self, params, batch):
        inner_lr, steps = self.inner_lr, self.update_step

        def per_task(_, task):
            xs, ys, xq, yq = task
            fast = params
            for _i in range(steps):
                grads, _ = jax.grad(self._loss, has_aux=True)(fast, xs, ys)
                fast = jax.tree.map(
                    lambda p, g: p - inner_lr * g, fast, grads
                )
            loss_q, logits_q = self._loss(fast, xq, yq)
            correct = (logits_q.argmax(-1) == yq).astype(jnp.float32)
            return None, (loss_q, correct)

        _, (losses, correct) = jax.lax.scan(
            per_task,
            None,
            (batch["x_spt"], batch["y_spt"], batch["x_qry"], batch["y_qry"]),
        )
        aux: Aux = {"correct": correct.reshape(-1)}
        return losses.mean(), aux

    def metric_updates(self, aux):
        return {"acc": (aux["correct"], None)}

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        return OmniglotTaskDataset(
            data_dir, self, batch_size, episodes=int(
                self.config.runner("episodes_per_epoch", 200)
            )
        )


class OmniglotTaskDataset:
    """N-way K-shot episode sampler over a directory of per-character
    subdirectories of 28×28 grayscale images stored as .npy arrays
    (the reference loads pngs via cv2, omniglot_reader.py:22-52; the TPU
    pipeline pre-converts to npy — see datasets/omniglot tooling)."""

    def __init__(self, data_dir, model_def, batch_size, episodes=200):
        import os

        self.md = model_def
        self.batch_size = batch_size
        self.episodes = episodes
        chars = []
        for root, _dirs, files in os.walk(data_dir):
            imgs = [f for f in files if f.endswith(".npy")]
            if imgs:
                arrs = [np.load(os.path.join(root, f)) for f in sorted(imgs)]
                chars.append(np.stack(arrs).astype(np.float32))
        self.chars = chars
        self.rng = np.random.RandomState(12345)

    def __iter__(self):
        md, bs = self.md, self.batch_size
        if not self.chars:
            return
        for _ in range(self.episodes):
            xs, ys, xq, yq = [], [], [], []
            for _t in range(bs):
                cls = self.rng.choice(
                    len(self.chars), md.n_way, replace=False
                )
                sx, sy, qx, qy = [], [], [], []
                for j, c in enumerate(cls):
                    imgs = self.chars[c]
                    pick = self.rng.choice(
                        len(imgs), md.k_spt + md.k_query, replace=False
                    )
                    sx.append(imgs[pick[: md.k_spt]])
                    qx.append(imgs[pick[md.k_spt:]])
                    sy += [j] * md.k_spt
                    qy += [j] * md.k_query
                sx = np.concatenate(sx)[..., None]
                qx = np.concatenate(qx)[..., None]
                sy, qy = np.asarray(sy, np.int32), np.asarray(qy, np.int32)
                p = self.rng.permutation(len(sy))
                q = self.rng.permutation(len(qy))
                xs.append(sx[p]); ys.append(sy[p])
                xq.append(qx[q]); yq.append(qy[q])
            yield {
                "x_spt": np.stack(xs) * 2.0 - 1.0,
                "y_spt": np.stack(ys),
                "x_qry": np.stack(xq) * 2.0 - 1.0,
                "y_qry": np.stack(yq),
            }
