"""ModelDef: the per-model contract.

The reference has two contracts per model — DygraphModel
(create_model/create_feeds/create_loss/train_forward/infer_forward,
models/rank/deepfm/dygraph_model.py:23-98) and StaticModel
(create_feeds/net/infer_net, models/rank/dnn/static_model.py:21-129).
TPU-native replacement: ONE functional contract.  A ModelDef owns a flax
module plus pure functions that jit cleanly; the trainer composes them into
a single compiled train step.  No dygraph/static split.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlerec_tpu.core.config import Config

Batch = Dict[str, jnp.ndarray]
Aux = Dict[str, jnp.ndarray]


class ModelDef:
    """Base contract. Subclasses must set ``self.module`` in __init__ and
    implement train_forward / infer_forward as pure functions of params."""

    # which streaming metric family the trainer should run
    metrics: str = "auc"
    # per-task metric names; multitask models override (e.g. ["ctr","ctcvr"])
    metric_names = ("auc",)

    def __init__(self, config: Config):
        self.config = config
        self.module: nn.Module = None  # set by subclass

    def metric_updates(self, aux: Aux):
        """name → (preds, labels, mask) for each streaming AUC to update."""
        return {
            self.metric_names[0]: (
                aux["predictions"],
                aux["labels"],
                aux.get("mask"),
            )
        }

    # -- streaming-metric hooks (trainer delegates; AUC family by default;
    # accuracy models override all four — see AccuracyModelDef) --------------
    def init_metric_state(self):
        from paddlerec_tpu.core import metrics as metrics_lib

        return {
            name: metrics_lib.init_auc_state() for name in self.metric_names
        }

    def update_metric_state(self, metric_state, aux: Aux):
        from paddlerec_tpu.core import metrics as metrics_lib

        out = dict(metric_state)
        for name, (preds, labels, mask) in self.metric_updates(aux).items():
            out[name] = metrics_lib.update_auc_state(out[name], preds, labels, mask)
        return out

    def compute_metric_bundle(self, metric_state) -> Dict[str, float]:
        """Host-side bundle; primary task flattened to top-level keys."""
        from paddlerec_tpu.core import metrics as metrics_lib

        names = list(self.metric_names)
        out = dict(metrics_lib.compute_metrics(metric_state[names[0]]))
        for name in names[1:]:
            out[f"auc_{name}"] = metrics_lib.compute_metrics(
                metric_state[name]
            )["auc"]
        return out

    def metric_log_str(self, metric_state) -> str:
        from paddlerec_tpu.core import metrics as metrics_lib

        names = self.metric_names
        if len(names) == 1:
            m = metrics_lib.compute_metrics(metric_state[names[0]])
            return f"auc: {m['auc']:.6f}, "
        parts = [
            f"auc_{n}: {metrics_lib.compute_metrics(metric_state[n])['auc']:.6f}"
            for n in names
        ]
        return ", ".join(parts) + ", "

    # -- setup ---------------------------------------------------------------
    def example_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def init_params(self, rng: jax.Array) -> Any:
        batch = jax.tree.map(jnp.asarray, self.example_batch(2))
        return self.init_with_batch(rng, batch)

    def init_with_batch(self, rng: jax.Array, batch: Batch) -> Any:
        variables = self.module.init(rng, *self.model_inputs(batch))
        return variables["params"]

    def model_inputs(self, batch: Batch) -> Tuple[jnp.ndarray, ...]:
        """Map a reader batch to the module's __call__ positional args."""
        raise NotImplementedError

    # -- step functions (pure, jittable) --------------------------------------
    def train_forward(self, params: Any, batch: Batch) -> Tuple[jnp.ndarray, Aux]:
        raise NotImplementedError

    def infer_forward(self, params: Any, batch: Batch) -> Aux:
        _, aux = self.train_forward(params, batch)
        return aux

    # -- sparse (row-wise) embedding updates -----------------------------------
    # hyper_parameters.sparse_update: true routes embedding tables through
    # the delta grad tap (ops/embedding.py external_update) so the
    # optimizer touches ONLY the rows a batch used — the PS-accessor
    # semantics (config_fleet.py:60-104), essential at vocab >= 10^7.
    def sparse_update_enabled(self) -> bool:
        return bool(self.config.hyper("sparse_update", False))

    def _sparse_update_rule(self) -> str:
        # "adam": element-wise moments, exact parity with dense Adam on
        # touched rows.  "adagrad": scalar per-row accumulator — the
        # reference sparse accessor's rule and ~40% less update traffic.
        return str(self.config.hyper("sparse_update_rule", "adam")).lower()

    def init_sparse_state(self, params: Any):
        """Row-wise optimizer state for every tapped table (or None)."""
        from paddlerec_tpu.ops.sparse_update import (
            find_sparse_taps, get_path, rowwise_adagrad_init,
            rowwise_adam_init,
        )

        taps = find_sparse_taps(params)
        if not taps:
            return None
        init = (rowwise_adagrad_init
                if self._sparse_update_rule() == "adagrad"
                else rowwise_adam_init)
        return {
            "/".join(d): init(get_path(params, t))
            for d, t in taps.items()
        }

    def sparse_update_ids(self, batch: Batch) -> jnp.ndarray:
        return batch["sparse"]

    def touched_tables(self, batch: Batch):
        """Host-side map of table name → physical row ids this batch
        touches, for delta publishing / feature-lifecycle bookkeeping
        (OnlineTrainer) and geo delta push.  Table names are the
        "/"-joined param tree paths.  Returning ``None`` selects the
        fused-CTR default (batch["sparse"] mapped through the pack
        arithmetic onto every table with the fused geometry); models
        with several independent tables (din/dien-style item+cat)
        override this so EVERY table gets exact bookkeeping."""
        return None

    def augment_batch_host(self, batch: Batch) -> Batch:
        """Host-side batch enrichment (runs in the input pipeline):
        dedup the batch's physical rows so the device never needs an
        O(vocab) grad scratch or a device-side sort."""
        if not self.sparse_update_enabled() or "sparse_uniq" in batch:
            return batch
        from paddlerec_tpu.ops.packed_embedding import sub_width
        from paddlerec_tpu.ops.sparse_update import host_dedup

        vocab = int(self.config.hyper("sparse_feature_number", 1000001))
        # models whose fused table is wider than sparse_feature_dim
        # (e.g. deepfm's E+1 lanes) set sparse_embed_logical_dim
        dim = int(getattr(
            self, "sparse_embed_logical_dim",
            int(self.config.hyper("sparse_feature_dim", 9)),
        ))
        pack = 128 // sub_width(dim)
        uniq, slot = host_dedup(self.sparse_update_ids(batch), vocab, pack)
        return dict(batch, sparse_uniq=uniq, sparse_slot=slot)

    def global_dedup_arrays(self, batch: Batch):
        """Multi-host dp analog of augment_batch_host: dedup the GLOBAL
        batch's physical rows so the compact row update stays exact when
        each process only holds its own dp shard.

        Every process allgathers the per-host physical row ids (one
        int32 per lookup position — the cheap piece; vectors never move)
        and runs the same np.unique, so the returned (uniq, slot) arrays
        are bit-identical on all hosts and ship as REPLICATED device
        arrays.  ``slot`` indexes the global flattened position order =
        process-major concatenation, matching how per-host batch shards
        concatenate into the global dp-sharded batch.

        MUST be called from the trainer's main thread AFTER the has-next
        sync: it issues a collective (process_allgather), and hosts have
        to reach it in lockstep.

        Parity: the reference's sync-PS semantics — one summed update
        per key per step across all workers (program_helper.py:38-40) —
        not async-PS (each worker updating independently).
        """
        if not self.sparse_update_enabled():
            return None
        import numpy as np
        from jax.experimental import multihost_utils

        from paddlerec_tpu.ops.packed_embedding import sub_width
        from paddlerec_tpu.ops.sparse_update import SENTINEL

        vocab = int(self.config.hyper("sparse_feature_number", 1000001))
        dim = int(getattr(
            self, "sparse_embed_logical_dim",
            int(self.config.hyper("sparse_feature_dim", 9)),
        ))
        pack = 128 // sub_width(dim)
        phys_local = (
            (np.asarray(self.sparse_update_ids(batch)).reshape(-1) % vocab)
            // pack
        ).astype(np.int32)
        gathered = multihost_utils.process_allgather(phys_local)
        phys_global = np.asarray(gathered).reshape(-1)
        uniq_vals, slot = np.unique(phys_global, return_inverse=True)
        uniq = np.full(phys_global.size, SENTINEL, np.int32)
        uniq[: len(uniq_vals)] = uniq_vals
        return uniq, slot.reshape(-1).astype(np.int32)

    def clip_grads(self, grads: Any):
        """One global-norm clip over the FULL grads tree (reference
        ClipGradByGlobalNorm semantics) — used by the trainer for
        sparse runs, where the optax-chained clip would only see the
        non-frozen leaves."""
        clip = self.config.hyper("clip_by_norm")
        if not clip:
            return grads
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, float(clip) / jnp.maximum(gnorm, 1e-12))
        return jax.tree.map(lambda g: g * scale, grads)

    def apply_sparse_updates(self, params: Any, extra, grads: Any,
                             batch: Batch, rng=None,
                             mp_tables: frozenset = frozenset()):
        """Consume delta grads → row-wise Adam on the tapped tables.

        Runs inside the jitted train step, after the dense optimizer
        (which sees zero updates for the table and delta leaves).

        ``mp_tables``: static set of "/"-joined table paths that are
        row-sharded over the mesh's mp axis (the trainer reads it off
        the live param shardings) — those route to the shard_map'd
        row-wise update (ops/sparse_update.apply_sparse_*_sharded)."""
        from paddlerec_tpu.ops.packed_embedding import sub_width
        from paddlerec_tpu.ops.sparse_update import (
            apply_sparse_adagrad, apply_sparse_adagrad_compact,
            apply_sparse_adagrad_sharded, apply_sparse_adam_compact,
            apply_sparse_adam_sharded, apply_sparse_update, dedup_rows,
            find_sparse_taps, get_path, infer_pack, set_path,
        )
        from paddlerec_tpu.parallel import context as parallel_context
        from paddlerec_tpu.parallel.mesh import MP_AXIS

        adagrad = self._sparse_update_rule() == "adagrad"
        if not bool(self.config.hyper("sparse_update_stochastic_round",
                                      False)):
            rng = None  # round-to-nearest (deterministic) by default
        taps = find_sparse_taps(params)
        lr = float(self.config.hyper("optimizer.learning_rate", 0.001))
        scale = None  # grads arrive pre-clipped (see clip_grads)
        vocab = int(self.config.hyper("sparse_feature_number", 1000001))
        default_pack = 128 // sub_width(int(getattr(
            self, "sparse_embed_logical_dim",
            int(self.config.hyper("sparse_feature_dim", 9)),
        )))
        ids = self.sparse_update_ids(batch)
        new_extra = dict(extra)
        for dpath, tpath in taps.items():
            table = get_path(params, tpath)
            key = "/".join(dpath)
            dgrad = get_path(grads, dpath)
            if scale is not None:
                dgrad = dgrad * scale
            if "/".join(tpath) in mp_tables:
                # composed sparse_update × mp: shard-local row-wise step
                mesh = parallel_context.get_mesh()
                mp = mesh.shape[MP_AXIS]
                pack = infer_pack(vocab, table.shape[0], mp)
                if "sparse_uniq" in batch and pack == default_pack:
                    uniq = batch["sparse_uniq"]
                    slot = batch["sparse_slot"]
                else:
                    # in-graph dedup fallback (device argsort — slower;
                    # the input pipeline's host dedup is the fast path)
                    phys = ((ids % vocab).reshape(-1)
                            // pack).astype(jnp.int32)
                    uniq, slot = dedup_rows(phys, table.shape[0])
                apply_fn = (apply_sparse_adagrad_sharded if adagrad
                            else apply_sparse_adam_sharded)
                new_table, st = apply_fn(
                    mesh, table, extra[key], dgrad, uniq, slot, lr,
                    rng=rng,
                )
                params = set_path(params, tpath, new_table)
                new_extra[key] = st
                continue
            pack = infer_pack(vocab, table.shape[0])
            if "sparse_uniq" in batch and pack == default_pack:
                # host-deduped fast path: O(batch) scratch, unique
                # scatter indices — required for vocab >= ~10^8
                apply_fn = (apply_sparse_adagrad_compact if adagrad
                            else apply_sparse_adam_compact)
                new_table, st = apply_fn(
                    table, extra[key], dgrad,
                    batch["sparse_uniq"], batch["sparse_slot"], lr,
                    rng=rng,
                )
            else:
                apply_fn = (apply_sparse_adagrad if adagrad
                            else apply_sparse_update)
                phys = ((ids % vocab).reshape(-1) // pack).astype(jnp.int32)
                new_table, st = apply_fn(
                    table, extra[key], dgrad, phys, lr, rng=rng
                )
            params = set_path(params, tpath, new_table)
            new_extra[key] = st
        return params, new_extra

    # -- optimizer -------------------------------------------------------------
    def create_optimizer(self) -> optax.GradientTransformation:
        """Optimizer from hyper_parameters.optimizer.* (reference
        dygraph_model.create_optimizer: Adam(lr) by default)."""
        cfg = self.config
        if bool(cfg.hyper("optimizer.runtime_inject", False)):
            # lr / embedding_l2 become optimizer-STATE values instead of
            # baked HLO constants: one compile serves every value, and
            # Trainer.set_hyperparams retunes them between steps with no
            # recompile (the tunnel makes each fresh compile ~20 min, so
            # hyperparameter sweeps are infeasible without this).
            if self.sparse_update_enabled():
                raise ValueError(
                    "optimizer.runtime_inject does not compose with "
                    "sparse_update (row-wise updates read lr statically)"
                )
            return optax.inject_hyperparams(self._injectable_optimizer)(
                learning_rate=float(cfg.hyper("optimizer.learning_rate", 0.001)),
                embedding_l2=float(cfg.hyper("embedding_l2", 0.0) or 0.0),
            )
        tx = self._base_optimizer()
        clip = cfg.hyper("clip_by_norm")
        if clip and not self.sparse_update_enabled():
            tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
        el2 = float(cfg.hyper("embedding_l2", 0.0) or 0.0)
        if el2 and not self.sparse_update_enabled():
            # decoupled per-step weight decay on the embedding TABLES
            # only: rows with few gradient hits decay toward 0 while
            # frequently-hit rows are dominated by their gradients —
            # exactly the posterior-shrinkage shape, so multi-epoch
            # training stops memorizing tail ids (the MAP analog of the
            # PS accessors' regularization).  update -= lr * el2 * w.
            lr = float(cfg.hyper("optimizer.learning_rate", 0.001))
            tx = optax.chain(
                tx,
                optax.add_decayed_weights(-el2 * lr, mask=_emb_decay_mask),
            )
        # sparse runs clip ONCE over the whole grads tree in the trainer
        # (clip_grads) so dense and row-wise updates share one norm —
        # a per-transform clip would see only the non-frozen leaves
        if self.sparse_update_enabled():
            # the tapped tables and their deltas are updated row-wise by
            # apply_sparse_updates; freeze them for the dense optimizer so
            # it never traverses the full table
            from paddlerec_tpu.ops.sparse_update import find_sparse_taps

            def label_fn(params):
                taps = find_sparse_taps(params)
                frozen = set(taps) | set(taps.values())
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "frozen"
                    if tuple(
                        getattr(k, "key", k) for k in path
                    ) in frozen else "main",
                    params,
                )

            tx = optax.multi_transform(
                {"main": tx, "frozen": optax.set_to_zero()}, label_fn
            )
        return tx

    def _injectable_optimizer(self, learning_rate, embedding_l2):
        """Graph-stable optimizer body for optax.inject_hyperparams: both
        args arrive as traced scalars read from opt_state.hyperparams, so
        the emitted HLO is identical for every (lr, el2) value.  The el2
        decay chain is present unconditionally (el2=0 is a runtime no-op)
        to keep the opt_state pytree shape value-independent."""
        cfg = self.config
        tx = self._base_optimizer(learning_rate)
        clip = cfg.hyper("clip_by_norm")
        if clip:
            tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
        return optax.chain(
            tx,
            optax.add_decayed_weights(
                -embedding_l2 * learning_rate, mask=_emb_decay_mask
            ),
        )

    def _base_optimizer(self, lr=None) -> optax.GradientTransformation:
        cfg = self.config
        name = str(cfg.hyper("optimizer.class", "Adam")).lower()
        if lr is None:
            lr = float(cfg.hyper("optimizer.learning_rate", 0.001))
        if name == "adam":
            if bool(cfg.hyper("optimizer.lazy_mode", False)):
                # paddle Adam(lazy_mode=True) semantics: embedding tables
                # get row-masked moment updates, dense layers plain Adam
                from paddlerec_tpu.ops.embedding import EMBEDDING_PARAM_NAME
                from paddlerec_tpu.train.optimizers import lazy_adam

                def label_fn(params):
                    return jax.tree_util.tree_map_with_path(
                        lambda path, _: "table"
                        if any(
                            EMBEDDING_PARAM_NAME
                            in str(getattr(p, "key", ""))
                            for p in path
                        )
                        else "dense",
                        params,
                    )

                return optax.multi_transform(
                    {"table": lazy_adam(lr), "dense": optax.adam(lr)},
                    label_fn,
                )
            # float32 first moments even for bf16 tables (otherwise
            # sub-resolution updates round to zero)
            return optax.adam(lr, mu_dtype=jnp.float32)
        if name in ("sgd", "gradientdescent"):
            return optax.sgd(lr)
        if name == "adagrad":
            init_acc = float(cfg.hyper("optimizer.initial_accumulator_value", 0.1))
            return optax.adagrad(lr, initial_accumulator_value=init_acc)
        if name == "rmsprop":
            return optax.rmsprop(lr)
        if name == "adamw":
            wd = float(cfg.hyper("optimizer.weight_decay", 1e-4))
            return optax.adamw(lr, weight_decay=wd)
        raise ValueError(f"unknown optimizer {name!r}")


def _emb_decay_mask(params):
    """True for embedding-table leaves (the only ones embedding_l2 decays)."""
    from paddlerec_tpu.parallel.sharding import is_embedding_path

    return jax.tree_util.tree_map_with_path(
        lambda p, _: is_embedding_path(p), params
    )


def binary_logloss(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Mean binary cross-entropy from logits (numerically stable)."""
    per = optax.sigmoid_binary_cross_entropy(logits, labels)
    if mask is not None:
        return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return per.mean()


class AccuracyModelDef(ModelDef):
    """Base for classification models tracked by streaming accuracy
    (reference: paddle.metric.Accuracy in dselect_k/dygraph_model.py:64-69,
    ad-hoc correct counters in maml/dygraph_model.py:99).

    ``metric_updates`` must return name → (correct_flags, mask)."""

    metrics = "acc"

    def init_metric_state(self):
        from paddlerec_tpu.core import metrics as metrics_lib

        return {
            name: metrics_lib.init_acc_state() for name in self.metric_names
        }

    def update_metric_state(self, metric_state, aux: Aux):
        from paddlerec_tpu.core import metrics as metrics_lib

        out = dict(metric_state)
        for name, (correct, mask) in self.metric_updates(aux).items():
            out[name] = metrics_lib.update_acc_state(out[name], correct, mask)
        return out

    def compute_metric_bundle(self, metric_state) -> Dict[str, float]:
        from paddlerec_tpu.core import metrics as metrics_lib

        return {
            f"acc_{name}" if len(self.metric_names) > 1 else "acc":
                metrics_lib.compute_acc(metric_state[name])
            for name in self.metric_names
        }

    def metric_log_str(self, metric_state) -> str:
        bundle = self.compute_metric_bundle(metric_state)
        return ", ".join(f"{k}: {v:.6f}" for k, v in bundle.items()) + ", "


class CTRModelDef(ModelDef):
    """Base for binary-CTR models over (sparse ids, dense) features.

    Subclass sets ``self.module`` to a flax module mapping
    (sparse_ids (B,S)[,L], dense (B,D)) → logits (B,).  Everything else —
    log-loss, sigmoid predictions, AUC aux, synthetic batches — is shared.
    """

    metrics = "auc"

    def __init__(self, config: Config):
        super().__init__(config)
        self.num_sparse = int(config.hyper("sparse_inputs_slots", 27)) - 1
        self.vocab_size = int(config.hyper("sparse_feature_number", 1000001))
        self.embedding_dim = int(config.hyper("sparse_feature_dim", 9))
        self.dense_dim = int(config.hyper("dense_input_dim", 13))

    def table_dtype(self):
        """Embedding table dtype: hyper_parameters.sparse_feature_dtype
        ∈ {float32, bfloat16}.  bf16 halves the table's HBM footprint
        and traffic (measured +18% full-step throughput on v5e for
        DeepFM @ vocab 10^6); Adam keeps float32 first moments
        (mu_dtype) so tiny updates don't round away."""
        name = str(self.config.hyper(
            "sparse_feature_dtype", "float32"
        )).lower()
        if name in ("bfloat16", "bf16"):
            return jnp.bfloat16
        if name in ("float32", "fp32", "f32"):
            return jnp.float32
        raise ValueError(f"unknown sparse_feature_dtype {name!r}")

    def sparse_embed_kwargs(self) -> Dict[str, Any]:
        """SlotEmbedding kwargs for the sparse_update mode (pass into the
        module's main fused table).  The delta must fit the LARGEST
        batch the module will see — infer batches are routinely bigger
        than train batches."""
        if not self.sparse_update_enabled():
            return {}
        cfg = self.config
        max_bs = max(int(cfg.runner("train_batch_size", 512)),
                     int(cfg.runner("infer_batch_size", 512)))
        # multi-host dp: each process contributes batch_size rows, so the
        # module (which sees GLOBAL shapes under pjit) needs capacity for
        # process_count * batch_size positions
        max_bs *= max(jax.process_count(), 1)
        return {
            "external_update": True,
            "delta_capacity": int(cfg.hyper(
                "sparse_update_capacity", self.num_sparse * max_bs
            )),
        }

    def model_inputs(self, batch: Batch) -> Tuple[jnp.ndarray, ...]:
        if self.dense_dim:
            return (batch["sparse"], batch["dense"])
        return (batch["sparse"],)

    def example_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        from paddlerec_tpu.data.synthetic import synthetic_batch

        rng = np.random.RandomState(0)
        return synthetic_batch(
            rng,
            batch_size,
            num_sparse=self.num_sparse,
            dense_dim=max(self.dense_dim, 1),
            vocab=self.vocab_size,
        )

    def _embed_context(self):
        """Trace-time SlotEmbedding defaults from config: every CTR model
        honors sparse_update / sparse_feature_dtype without per-module
        attribute plumbing (explicit module attrs still win)."""
        from paddlerec_tpu.ops.embedding import slot_embedding_context

        kw = self.sparse_embed_kwargs()
        dtype = self.table_dtype()
        return slot_embedding_context(
            external_update=kw.get("external_update"),
            delta_capacity=kw.get("delta_capacity"),
            param_dtype=None if dtype == jnp.float32 else dtype,
        )

    def init_with_batch(self, rng: jax.Array, batch: Batch) -> Any:
        with self._embed_context():
            return super().init_with_batch(rng, batch)

    def train_forward(self, params: Any, batch: Batch) -> Tuple[jnp.ndarray, Aux]:
        with self._embed_context():
            # mutable intermediates: SlotEmbedding sows the all_to_all
            # exchange's dropped-id count there (mp>1 only); surfaced in
            # aux so the trainer accumulates it psum-exactly in-graph
            logits, muts = self.module.apply(
                {"params": params}, *self.model_inputs(batch),
                mutable=["intermediates"],
            )
        overflow_leaves = jax.tree_util.tree_leaves(
            muts.get("intermediates", {})
        )
        logits = logits.reshape(-1)
        labels = batch["label"].reshape(-1).astype(jnp.float32)
        mask = batch.get("mask")
        loss = binary_logloss(logits, labels, mask)
        aux = {
            "predictions": jax.nn.sigmoid(logits),
            "labels": labels,
        }
        if mask is not None:
            aux["mask"] = mask
        if overflow_leaves:
            aux["embedding_overflow"] = sum(
                jnp.sum(leaf).astype(jnp.int32) for leaf in overflow_leaves
            )
        return loss, aux
