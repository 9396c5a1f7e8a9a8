"""TDM: tree-based deep match (layer-wise softmax over a binary tree).

Parity target: reference models/treebased/tdm/model.py:20-103 —
  * user behavior ids grouped by ``fea_groups`` (e.g. "20,20,10,10,…"),
    mean-pooled per group into user feature vectors;
  * per candidate node: interaction features [user⊙node, user−node,
    user·node] → relu fc → 2-way softmax (middle_transform,
    model.py:47-87);
  * training pairs come from layer-wise tree sampling (positives =
    ancestors of the clicked leaf, negatives = same-layer uniform) —
    the engine-side ``tdm_sample`` hook (tools/static_trainer.py:152-159)
    reproduced by TreeIndex.sample;
  * retrieval = layer-wise beam search (tdm/infer.py:145-235), here one
    jit per level over static-shape candidate sets.

Node embeddings live in ONE table indexed by tree code — internal nodes
and leaves share it, exactly like the reference's unit-id embedding.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import Aux, ModelDef
from paddlerec_tpu.models.treebased.tree import TreeIndex


class TDMNet(nn.Module):
    total_nodes: int
    node_emb_size: int = 24
    fea_groups: tuple = (20, 20, 10, 10, 2, 2, 2, 1, 1, 1)

    @nn.compact
    def __call__(self, hist_ids, hist_mask, unit_codes):
        """hist_ids (B, S) leaf codes of the behavior history;
        hist_mask (B, S); unit_codes (B, T) candidate node codes.
        Returns logits (B, T, 2)."""
        emb = nn.Embed(self.total_nodes, self.node_emb_size, name="node_emb")
        hist = emb(hist_ids) * hist_mask[..., None]
        # grouped mean pooling (fea_groups, model.py:95-100)
        groups = []
        start = 0
        for g in self.fea_groups:
            seg = hist[:, start : start + g]
            seg_m = hist_mask[:, start : start + g]
            groups.append(
                seg.sum(1) / jnp.maximum(seg_m.sum(1, keepdims=True), 1.0)
            )
            start += g
        # concat the group vectors, then project: keeps the fea_groups
        # structure the reference preserves (collapsing to a mean made
        # the grouped pooling a no-op)
        user = nn.Dense(self.node_emb_size, name="group_proj")(
            jnp.concatenate(groups, axis=-1)
        )  # (B, E)

        node = emb(unit_codes)  # (B, T, E)
        u = user[:, None, :]
        feat = jnp.concatenate(
            [u * node, u - node, (u * node).sum(-1, keepdims=True)], -1
        )
        h = nn.relu(nn.Dense(self.node_emb_size, name="relu_fc")(feat))
        return nn.Dense(2, name="cos_sim_fc")(h)  # (B, T, 2)


@register_model("treebased.tdm")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.node_emb_size = int(h("node_emb_size", 24))
        self.neg_per_layer = int(h("neg_sampling_list", 4))
        fg = h("fea_groups", "20,20,10,10,2,2,2,1,1,1")
        if isinstance(fg, (list, tuple)):  # CLI -o coerces "3,3" to a tuple
            self.fea_groups = tuple(int(x) for x in fg)
        else:
            self.fea_groups = tuple(int(x) for x in str(fg).split(","))
        self.tree: Optional[TreeIndex] = None
        tree_path = config.get("hyper_parameters.tree_path")
        if tree_path:
            import os as _os

            p = str(tree_path)
            if _os.path.exists(p) or _os.path.exists(p + ".npz"):
                self.tree = TreeIndex.load(p)
            # a missing artifact is fine at instantiation time (example
            # configs ship placeholder paths); training/retrieval assert
            # a tree with a pointed message
        self.total_nodes = int(
            h("total_nodes", self.tree.total_nodes if self.tree else 2047)
        )
        self.module = TDMNet(
            self.total_nodes, self.node_emb_size, self.fea_groups
        )

    def set_tree(self, tree: TreeIndex):
        self.tree = tree
        self.total_nodes = tree.total_nodes
        self.module = TDMNet(
            self.total_nodes, self.node_emb_size, self.fea_groups
        )

    def model_inputs(self, batch):
        return (batch["hist_ids"], batch["hist_mask"], batch["unit_codes"])

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        s = sum(self.fea_groups)
        layers = max(int(np.log2(max(self.total_nodes, 2))), 1)
        t = layers * (1 + self.neg_per_layer)
        labels = np.zeros((batch_size, t), np.float32)
        labels[:, :: (1 + self.neg_per_layer)] = 1.0
        return {
            "hist_ids": rng.randint(0, self.total_nodes, (batch_size, s)
                                    ).astype(np.int64),
            "hist_mask": (rng.rand(batch_size, s) < 0.8).astype(np.float32),
            "unit_codes": rng.randint(0, self.total_nodes, (batch_size, t)
                                      ).astype(np.int64),
            "labels": labels,
            "unit_mask": np.ones((batch_size, t), np.float32),
        }

    def train_forward(self, params, batch):
        logits = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )  # (B, T, 2)
        labels = batch["labels"].astype(jnp.int32)
        w = batch.get("unit_mask")
        w = w if w is not None else jnp.ones(labels.shape, jnp.float32)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        loss = (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
        probs = jax.nn.softmax(logits, -1)[..., 1]
        aux: Aux = {
            "predictions": probs.reshape(-1),
            "labels": labels.astype(jnp.float32).reshape(-1),
            "mask": w.reshape(-1),
        }
        return loss, aux

    # -- layer-wise beam-search retrieval (tdm/infer.py:145-235) -------------
    def retrieve(self, params, hist_ids, hist_mask, topk: int = 10,
                 beam: int = 20):
        """Returns the top-`topk` leaf item ids per example."""
        assert self.tree is not None, "set_tree() or hyper_parameters.tree_path"
        tree = self.tree
        b = hist_ids.shape[0]

        def score(codes):  # (B, N) → (B, N) p(positive)
            logits = self.module.apply(
                {"params": params}, hist_ids, hist_mask, codes
            )
            return jax.nn.softmax(logits, -1)[..., 1]

        levels = tree.beam_layers(beam)
        # first level: score all candidates, keep beam
        cand = jnp.broadcast_to(
            jnp.asarray(levels[0])[None], (b, len(levels[0]))
        )
        for depth, level_codes in enumerate(levels):
            if depth > 0:
                # expand previous beam into children, mask those absent
                # from this level's valid set
                children = jnp.concatenate(
                    [tree.branch * cand + k
                     for k in range(1, tree.branch + 1)],
                    axis=1,
                )  # (B, beam·branch)
                valid = jnp.isin(children, jnp.asarray(level_codes))
                cand = children
            else:
                valid = jnp.ones(cand.shape, bool)
            probs = jnp.where(valid, score(cand), -1.0)
            k = min(beam, cand.shape[1])
            _, idx = jax.lax.top_k(probs, k)
            cand = jnp.take_along_axis(cand, idx, axis=1)
            last_valid = jnp.take_along_axis(valid, idx, axis=1)
        # final rescore must keep the validity mask — an invalid code
        # with a high raw score would displace real leaves in the top-k
        probs = jnp.where(last_valid, score(cand), -1.0)
        k = min(topk, cand.shape[1])
        _, idx = jax.lax.top_k(probs, k)
        top_codes = np.asarray(jnp.take_along_axis(cand, idx, axis=1))
        return [tree.leaf_items(row)[:topk] for row in top_codes]

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return TDMDataset(
            files, self, batch_size,
            seed=int(self.config.runner("seed", 2023)),
        )


class TDMDataset:
    """Lines: ``hist_item1 ... hist_itemS | target_item`` (item ids);
    layer-wise sampling happens here — the host-side analog of the
    engine's dataset.tdm_sample."""

    def __init__(self, files, md, batch_size, seed=2023):
        self.files = files
        self.md = md
        self.batch_size = batch_size
        self.seed = seed

    def __iter__(self):
        md = self.md
        assert md.tree is not None
        rng = np.random.RandomState(self.seed)
        s = sum(md.fea_groups)
        item_to_code = {
            int(i): int(c) for i, c in zip(md.tree.item_ids, md.tree.codes)
        }
        hist_buf, tgt_buf = [], []
        for path in self.files:
            with open(path) as f:
                for line in f:
                    left, _, right = line.partition("|")
                    try:
                        hist = [int(x) for x in left.split()][:s]
                        tgt = int(right.split()[0])
                    except (ValueError, IndexError):
                        continue  # malformed lines are skipped, like the
                        # slot readers
                    hist_buf.append(hist)
                    tgt_buf.append(tgt)
                    if len(hist_buf) == self.batch_size:
                        yield self._batch(hist_buf, tgt_buf, item_to_code,
                                          rng, s)
                        hist_buf, tgt_buf = [], []
        if hist_buf:
            yield self._batch(hist_buf, tgt_buf, item_to_code, rng, s)

    def _batch(self, hists, targets, item_to_code, rng, s):
        md = self.md
        n = len(hists)
        hist_ids = np.zeros((n, s), np.int64)
        hist_mask = np.zeros((n, s), np.float32)
        for i, h in enumerate(hists):
            codes = [item_to_code.get(x, 0) for x in h]
            hist_ids[i, : len(codes)] = codes
            hist_mask[i, : len(codes)] = [1.0 if c else 0.0 for c in codes]
        units, labels = md.tree.sample(
            np.asarray(targets), md.neg_per_layer, rng
        )
        return {
            "hist_ids": hist_ids,
            "hist_mask": hist_mask,
            "unit_codes": units,
            "labels": labels,
            "unit_mask": np.ones(units.shape, np.float32),
            "mask": np.ones(n, np.float32),
            # target item per row: JTM's sample-set collector groups
            # user histories by clicked item (models/treebased/jtm.py)
            "item_id": np.asarray(targets, np.int64),
        }
