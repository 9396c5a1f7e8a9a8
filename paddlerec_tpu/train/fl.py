"""FL-PS: federated parameter-server training (SURVEY §2.5 P8).

Parity target: the reference's FL mode (tools/static_fl_trainer.py:
71-170) runs three roles — workers wrapped in an ``FLClient`` that
registers its train-example count, brpc servers holding the params, and
a COORDINATOR process (``fleet.init_coordinator`` +
``fleet.make_fl_strategy``) that decides, per round, which clients pull
fresh params, train locally, and push updates, weighting the
aggregation by each client's example count.

TPU-native composition (no separate server/coordinator processes — the
roles collapse into the SPMD program, like the PS itself did):

  * every jax process is one FL CLIENT training on its own private file
    shard with a LOCAL device mesh (zero cross-client traffic during
    local epochs) — the geo substrate;
  * the COORDINATOR is deterministic-by-construction: client selection
    for round r is a seeded Bernoulli draw every process computes
    identically (``runner.fl_client_fraction``), so no strategy RPC is
    needed — process 0 logs the round plan (the make_fl_strategy
    analog);
  * aggregation is FedAvg: base += Σ_k (n_k/Σn) · Δ_k over the selected
    clients' k-local-epoch diffs, with n_k = examples the client
    actually trained this round (the FLClient example-count contract);
    embedding tables ship touched-row diffs only, like geo;
  * straggler tolerance rides the geo rendezvous flags: a client with
    no data (or an unselected one) joins the rendezvous with zero steps
    and weight 0 — the collective sequence never diverges.

Config::

    runner:
      sync_mode: fl
      fl_rounds: 10            # federated rounds
      fl_local_epochs: 1       # local epochs per selected client/round
      fl_client_fraction: 1.0  # coordinator's per-round selection
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.train.trainer import Trainer, logger


class FLTrainer(Trainer):
    """FedAvg over private per-process data shards."""

    def __init__(self, config: Config, model_def=None, mesh=None):
        # ride the geo machinery: local mesh per process, lazy-adam
        # enforcement, touched-row bookkeeping, weighted _geo_sync
        config["runner.sync_mode"] = "geo"
        if config.runner("geo_k_steps") is None:
            config["runner.geo_k_steps"] = 1
        super().__init__(config, model_def=model_def, mesh=mesh)
        if jax.process_count() <= 1:
            raise ValueError(
                "sync_mode: fl needs >1 process (each process is one "
                "federated client with a private data shard); launch "
                "with tools/launch or jax.distributed"
            )
        self.rounds = int(config.runner("fl_rounds", 10))
        self.local_epochs = int(config.runner("fl_local_epochs", 1))
        self.client_fraction = float(
            config.runner("fl_client_fraction", 1.0)
        )
        self.seed = int(config.runner("seed", 2023))

    def _selected(self, rnd: int) -> bool:
        """Coordinator decision for this client in round ``rnd`` — a
        seeded draw every process computes identically (deterministic
        make_fl_strategy analog; no strategy RPC)."""
        if self.client_fraction >= 1.0:
            return True
        rng = np.random.RandomState(self.seed * 9973 + rnd)
        draws = rng.rand(jax.process_count())
        chosen = draws < self.client_fraction
        if not chosen.any():  # coordinator never idles a whole round
            chosen[int(np.argmin(draws))] = True
        return bool(chosen[jax.process_index()])

    def train(self) -> Dict[str, float]:
        from jax.experimental import multihost_utils

        from paddlerec_tpu.core.config import resolve_path
        from paddlerec_tpu.train import checkpoint as ckpt_lib

        cfg = self.config
        batch_size = int(cfg.runner("train_batch_size", 32))
        data_dir = resolve_path(cfg, "runner.train_data_dir")
        save_path = resolve_path(cfg, "runner.model_save_path")
        if self.state is None:
            self.init_state()
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if self._geo_base is None:
            self._init_geo_state()
        import collections

        dataset = self.make_dataset(
            data_dir, batch_size,
            shuffle=bool(cfg.runner("shuffle_files", False)),
        )
        last_metrics: Dict[str, float] = {}
        for rnd in range(self.rounds):
            t0 = time.time()
            selected = self._selected(rnd)
            local_examples = 0
            local_steps = 0
            metric_state = self._init_metric_state()
            if selected:
                self._geo_pending_rows = collections.deque()
                for _ in range(self.local_epochs):
                    for batch in self._device_batches(
                        self._geo_observing(dataset)
                    ):
                        self._geo_mark_consumed()
                        self.state, metric_state, loss = self._train_step(
                            self.state, batch, metric_state
                        )
                        local_examples += self._batch_rows(batch)
                        local_steps += 1
                if local_steps:
                    jax.block_until_ready(loss)
            # FedAvg rendezvous: weights = this round's example counts
            counts = np.asarray(multihost_utils.process_allgather(
                np.asarray([local_examples], np.int64)
            )).reshape(-1)
            total = int(counts.sum())
            weights = (counts / total if total
                       else np.zeros_like(counts, np.float32))
            self._geo_sync(counts, weights=weights.astype(np.float32))
            merged = self._geo_merge_metrics(metric_state)
            last_metrics = (
                self._compute_metrics(merged) if self.use_auc else {}
            )
            if jax.process_index() == 0:
                plan = " ".join(
                    f"c{k}:{int(n)}" for k, n in enumerate(counts)
                )
                logger.info(
                    f"[fl round {rnd}] coordinator plan {plan} | "
                    + (self._bundle_str(last_metrics, "train")
                       if self.use_auc else "")
                    + f" | {time.time() - t0:.2f} s"
                )
        if save_path:
            path = ckpt_lib.save_model(
                jax.device_get(self.state.params),
                jax.device_get(self.state.opt_state),
                save_path, "fl_final",
                extra=(jax.device_get(self.state.extra)
                       if self.state.extra is not None else None),
            )
            if jax.process_index() == 0:
                logger.info(f"saved FL model to {path}")
        last_metrics["rounds"] = float(self.rounds)
        return last_metrics
