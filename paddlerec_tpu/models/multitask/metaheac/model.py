"""MetaHEAC: meta-learned hybrid expert/critic model for cold-start ads.

Parity target: reference models/multitask/metaheac/net.py (WideAndDeepModel:
static + dynamic + ad embeddings, expert MLPs mixed by an ad-conditioned
attention softmax, multiple sigmoid output heads mixed the same way) and the
meta-training loop of dygraph_model.py:79-125 — per task: one inner SGD step
on the support half (fast weights), then the query loss with adapted
weights; the outer optimizer sees the mean query loss.

TPU-native design: paddle emulates fast weights by mutating ``.fast`` on
every parameter (net.py:20-51).  Here the inner update is literally
``params - lr * grad`` on the params pytree inside the jitted step, and the
task loop is a ``lax.scan`` over the leading task axis — one compiled
program, no Python-side state.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import Aux, ModelDef

# field widths of the Tencent Lookalike dataset used by the reference
# (reader_train.py:30-57): 7 static, 7 dynamic (multi-hot, padded lens
# below), 6 ad fields.
DYNAMIC_SPANS: Tuple[Tuple[int, int], ...] = (
    (0, 10), (10, 20), (20, 30), (30, 35), (35, 40), (40, 45), (45, 50),
)


class HybridExpertNet(nn.Module):
    """Attention-mixed expert MLPs (net.py:173-221)."""

    static_vocabs: Sequence[int]
    dynamic_vocabs: Sequence[int]
    ad_vocabs: Sequence[int]
    embed_dim: int
    mlp_dims: Sequence[int]
    num_expert: int
    num_output: int

    @nn.compact
    def __call__(self, static_ids, dynamic_ids, dynamic_lengths, ad_ids):
        e = self.embed_dim
        # static: one embedding per field
        static_emb = jnp.stack(
            [
                nn.Embed(v + 1, e, name=f"static_{i}")(static_ids[:, i])
                for i, v in enumerate(self.static_vocabs)
            ],
            axis=1,
        )  # (B, 7, E)
        # dynamic: mean-pooled multi-hot per field
        dyn = []
        for i, (v, (lo, hi)) in enumerate(
            zip(self.dynamic_vocabs, DYNAMIC_SPANS)
        ):
            ids = dynamic_ids[:, lo:hi]
            emb = nn.Embed(v + 1, e, name=f"dynamic_{i}")(ids)  # (B, L, E)
            L = hi - lo
            lens = dynamic_lengths[:, i].astype(jnp.float32)
            m = (
                jnp.arange(L)[None, :] < lens[:, None]
            ).astype(jnp.float32)
            pooled = (emb * m[..., None]).sum(1) / jnp.maximum(
                lens[:, None], 1.0
            )
            dyn.append(pooled)
        dyn_emb = jnp.stack(dyn, axis=1)  # (B, 7, E)
        emb = jnp.concatenate([static_emb, dyn_emb], axis=1)  # (B, 14, E)

        ad_emb = jnp.stack(
            [
                nn.Embed(v + 1, e, name=f"ad_{i}")(ad_ids[:, i])
                for i, v in enumerate(self.ad_vocabs)
            ],
            axis=1,
        )  # (B, A, E)
        ad_feat = jnp.concatenate(
            [emb.mean(axis=1, keepdims=True), ad_emb], axis=1
        ).reshape(static_ids.shape[0], -1)  # (B, (A+1)E)

        flat = emb.reshape(static_ids.shape[0], -1)
        expert_outs = []
        for i in range(self.num_expert):
            h = flat
            for j, d in enumerate(self.mlp_dims):
                h = nn.relu(nn.Dense(d, name=f"expert_{i}_fc{j}")(h))
            expert_outs.append(h)
        experts = jnp.stack(expert_outs, axis=1)  # (B, N, H)
        att = nn.softmax(
            nn.Dense(self.num_expert, name="att_out")(
                nn.relu(nn.Dense(self.mlp_dims[-1], name="att_hidden")(ad_feat))
            ),
            axis=1,
        )
        fea = jnp.einsum("bnh,bn->bh", experts, att)

        heads = jnp.concatenate(
            [
                nn.sigmoid(nn.Dense(1, name=f"head_{i}")(fea))
                for i in range(self.num_output)
            ],
            axis=1,
        )  # (B, O)
        att2 = nn.softmax(
            nn.Dense(self.num_output, name="att2_out")(
                nn.relu(nn.Dense(self.mlp_dims[-1], name="att2_hidden")(ad_feat))
            ),
            axis=1,
        )
        return jnp.clip((heads * att2).sum(axis=1), 1e-7, 1 - 1e-7)


@register_model("multitask.metaheac")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        max_idxs = config.hyper(
            "max_idxs",
            [[3, 2, 855, 5, 7, 2, 1],
             [124, 82, 12, 263312, 49780, 10002, 9984],
             [78, 137, 14, 39, 32, 3]],
        )
        self.static_vocabs = [int(v) for v in max_idxs[0]]
        self.dynamic_vocabs = [int(v) for v in max_idxs[1]]
        self.ad_vocabs = [int(v) for v in max_idxs[2]]
        self.task_count = int(config.hyper("task_count", 5))
        self.local_lr = float(config.hyper("local_lr", 0.0002))
        self.module = HybridExpertNet(
            self.static_vocabs,
            self.dynamic_vocabs,
            self.ad_vocabs,
            int(config.hyper("embed_dim", 64)),
            list(config.hyper("mlp_dims", [64, 64])),
            int(config.hyper("num_expert", 8)),
            int(config.hyper("num_output", 5)),
        )

    def _base_optimizer(self):
        import optax

        lr = float(
            self.config.hyper("optimizer.global_learning_rate", 0.001)
        )
        return optax.adam(lr)

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        t = self.task_count

        def feats():
            return {
                "static": np.stack(
                    [
                        rng.randint(0, v + 1, (t, batch_size))
                        for v in self.static_vocabs
                    ],
                    axis=-1,
                ).astype(np.int32),
                "dynamic_ids": rng.randint(
                    0, min(self.dynamic_vocabs), (t, batch_size, 50)
                ).astype(np.int32),
                "dynamic_lengths": np.stack(
                    [
                        rng.randint(1, (hi - lo) + 1, (t, batch_size))
                        for lo, hi in DYNAMIC_SPANS
                    ],
                    axis=-1,
                ).astype(np.int32),
                "ad": np.stack(
                    [
                        rng.randint(0, v + 1, (t, batch_size))
                        for v in self.ad_vocabs
                    ],
                    axis=-1,
                ).astype(np.int32),
                "label": (rng.rand(t, batch_size) < 0.3).astype(np.float32),
            }

        spt, qry = feats(), feats()
        return {
            **{f"spt_{k}": v for k, v in spt.items()},
            **{f"qry_{k}": v for k, v in qry.items()},
        }

    def init_with_batch(self, rng, batch):
        variables = self.module.init(
            rng,
            batch["spt_static"][0],
            batch["spt_dynamic_ids"][0],
            batch["spt_dynamic_lengths"][0],
            batch["spt_ad"][0],
        )
        return variables["params"]

    def _task_loss(self, params, static, dyn, lens, ad, label):
        pred = self.module.apply({"params": params}, static, dyn, lens, ad)
        loss = -(
            label * jnp.log(pred) + (1 - label) * jnp.log(1 - pred)
        ).mean()
        return loss, pred

    def train_forward(self, params, batch):
        local_lr = self.local_lr

        def per_task(_, task):
            (s, d, ln, a, y), (qs, qd, qln, qa, qy) = task

            # inner step: fast weights = params - lr * ∇ support loss
            grads, _ = jax.grad(self._task_loss, has_aux=True)(
                params, s, d, ln, a, y
            )
            fast = jax.tree.map(lambda p, g: p - local_lr * g, params, grads)
            loss_q, pred_q = self._task_loss(fast, qs, qd, qln, qa, qy)
            return None, (loss_q, pred_q, qy)

        spt = (
            batch["spt_static"], batch["spt_dynamic_ids"],
            batch["spt_dynamic_lengths"], batch["spt_ad"], batch["spt_label"],
        )
        qry = (
            batch["qry_static"], batch["qry_dynamic_ids"],
            batch["qry_dynamic_lengths"], batch["qry_ad"], batch["qry_label"],
        )
        _, (losses, preds, labels) = jax.lax.scan(per_task, None, (spt, qry))
        aux: Aux = {
            "predictions": preds.reshape(-1),
            "labels": labels.reshape(-1),
        }
        return losses.mean(), aux

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        import os

        files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith((".pkl", ".pickle"))
        )
        return _LookalikeDataset(files, self, batch_size)


class _LookalikeDataset:
    """Groups pickled DataFrame rows by ad id into meta-tasks, yielding
    support/query halves (reader_train.py:64-120's sampling, simplified to
    sequential task packing)."""

    def __init__(self, files, model_def, batch_size):
        self.files = files
        self.md = model_def
        self.batch_size = batch_size

    def __iter__(self):
        import pickle

        md, bs, t = self.md, self.batch_size, self.md.task_count
        for path in self.files:
            with open(path, "rb") as f:
                df = pickle.load(f)
            # column layout per reader_train.py:58-61: label, aid, 7 static,
            # 50 dynamic ids (padded to the spans), 7 lengths, 6 ad
            rows = np.asarray(df if isinstance(df, np.ndarray) else df.to_numpy())
            n = (len(rows) // (2 * bs * t)) * (2 * bs * t)
            if n == 0:
                continue
            rows = rows[:n]
            # task-major pairing: each task's 2*bs consecutive rows stay
            # together (support then query from the SAME ad) — the old
            # (-1, 2, t, bs, C) layout paired task i's support with a
            # different task's query, breaking the meta objective
            chunk = rows.reshape(-1, t, 2, bs, rows.shape[-1])
            for grp in chunk:
                spt, qry = grp[:, 0], grp[:, 1]

                def unpack(g, prefix):
                    return {
                        f"{prefix}_label": g[..., 0].astype(np.float32),
                        f"{prefix}_static": g[..., 2:9].astype(np.int32),
                        f"{prefix}_dynamic_ids": g[..., 9:59].astype(np.int32),
                        f"{prefix}_dynamic_lengths": g[..., 59:66].astype(
                            np.int32
                        ),
                        f"{prefix}_ad": g[..., 66:72].astype(np.int32),
                    }

                yield {**unpack(spt, "spt"), **unpack(qry, "qry")}
