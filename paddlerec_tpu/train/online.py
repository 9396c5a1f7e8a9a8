"""Online (streaming) training: the production day/pass loop.

Rebuilds the reference's tools/static_ps_online_trainer.py:60-632 +
tools/utils/static_ps/flow_helper.py:
  * day/pass scheduling from split_interval / split_per_pass;
  * donefile-gated data readiness polling (flow_helper.py:60-77);
  * resume: skip passes already recorded in the model donefile
    (flow_helper.py:245-286);
  * infer-before-train on each pass (join-time eval);
  * checkpoint cadence + delta (mode-1) / base (mode-2) inference-model
    publishing with inference donefiles (flow_helper.py:372-533);
  * end-of-day feature eviction — the `fleet.shrink()` analog — driven by
    per-row show/click-decayed counters like DownpourCtrDymfAccessor
    (config_fleet.py:76-81: show_click_decay_rate, delete_threshold,
    delete_after_unseen_days).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core import metrics as metrics_lib
from paddlerec_tpu.core.config import Config, resolve_path
from paddlerec_tpu.parallel.sharding import is_embedding_path
from paddlerec_tpu.train import checkpoint as ckpt_lib
from paddlerec_tpu.train.trainer import Trainer, logger


def get_online_pass_interval(
    split_interval: int, split_per_pass: int, is_data_hourly_placed: bool = False
) -> List[List[str]]:
    """Partition a day into passes of data sub-dirs.

    Mirrors flow_helper.get_online_pass_interval: directories are named
    HHMM (5-min style) or HH when hourly.
    """
    passes = []
    minutes_per_pass = split_interval * split_per_pass
    n_passes = 24 * 60 // minutes_per_pass
    for p in range(n_passes):
        dirs = []
        for s in range(split_per_pass):
            start_min = p * minutes_per_pass + s * split_interval
            hh, mm = divmod(start_min, 60)
            dirs.append(f"{hh:02d}" if is_data_hourly_placed else f"{hh:02d}{mm:02d}")
        passes.append(dirs)
    return passes


class _ChainDataset:
    """Concatenate re-iterable datasets (split_per_pass > 1 spans
    several data sub-dirs per pass)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)

    def __iter__(self):
        for d in self.datasets:
            yield from d


class FeatureStats:
    """Per-row show counters with daily decay — feature lifecycle bookkeeping.

    The reference keeps show/click statistics inside the PS accessor
    (DownpourCtrDymfAccessor) and evicts features whose decayed score falls
    under delete_threshold or that stay unseen delete_after_unseen_days.
    Here the stats live host-side (one float + one int per physical table
    row) and eviction zeroes the corresponding rows of the table and its
    optimizer moments.
    """

    def __init__(self, num_rows: int, decay: float = 0.98,
                 delete_threshold: float = 0.8,
                 delete_after_unseen_days: int = 30):
        self.show = np.zeros((num_rows,), np.float32)
        self.unseen_days = np.zeros((num_rows,), np.int32)
        # rows the table has actually hosted — only these are eligible
        # for eviction (never-seen rows keep their random init; the
        # reference PS only evicts features that exist in the table)
        self.seen = np.zeros((num_rows,), bool)
        self.decay = decay
        self.delete_threshold = delete_threshold
        self.delete_after_unseen_days = delete_after_unseen_days

    def observe(self, rows: np.ndarray) -> None:
        rows = rows.reshape(-1)
        # O(batch), not O(table): a bincount allocates and streams the
        # whole table length on every batch
        np.add.at(self.show, rows, 1.0)
        self.unseen_days[rows] = -1  # reset at end_day (+1 → 0)
        self.seen[rows] = True

    def end_day(self) -> np.ndarray:
        """Apply decay; return the row ids to evict (seen rows only)."""
        self.show *= self.decay
        self.unseen_days += 1
        evict = self.seen & (
            (self.show < self.delete_threshold)
            | (self.unseen_days > self.delete_after_unseen_days)
        )
        evict_rows = np.nonzero(evict)[0]
        self.show[evict] = 0.0
        self.unseen_days[evict] = 0
        self.seen[evict] = False
        return evict_rows

    def save(self, path: str) -> None:
        np.savez(path, show=self.show, unseen_days=self.unseen_days,
                 seen=self.seen)

    def load(self, path: str) -> None:
        z = np.load(path)
        self.show = z["show"]
        self.unseen_days = z["unseen_days"]
        self.seen = z["seen"]


class OnlineTrainer(Trainer):
    """Day/pass streaming trainer with donefile-based exactly-once passes."""

    def __init__(self, config: Config, model_def=None, mesh=None):
        super().__init__(config, model_def=model_def, mesh=mesh)
        raw_days = config.runner("days", "")
        if isinstance(raw_days, (list, tuple)):
            self.days = [str(d) for d in raw_days] or None
        else:
            self.days = [str(d) for d in str(raw_days).split()] or None
        self.start_day = str(config.runner("start_day", "20240101"))
        self.end_day = str(config.runner("end_day", self.start_day))
        self.split_interval = int(config.runner("split_interval", 5))
        self.split_per_pass = int(config.runner("split_per_pass", 1))
        self.checkpoint_per_pass = int(config.runner("checkpoint_per_pass", 6))
        self.save_delta_frequency = int(config.runner("save_delta_frequency", 6))
        self.save_first_base = bool(config.runner("save_first_base", False))
        self.data_donefile = config.runner("data_donefile", "")
        self.data_sleep_second = float(config.runner("data_sleep_second", 1))
        self.data_wait_timeout = float(config.runner("data_wait_timeout", 0))
        self.infer_before_train = bool(config.runner("infer_first", True))
        self.pass_intervals = get_online_pass_interval(
            self.split_interval,
            self.split_per_pass,
            bool(config.runner("data_hourly_placed", False)),
        )
        self.stats: Optional[FeatureStats] = None
        self._feature_lifecycle = bool(config.runner("feature_lifecycle", True))

    # -- donefile protocol -----------------------------------------------------
    def _donefile(self) -> str:
        root = resolve_path(self.config, "runner.model_save_path")
        os.makedirs(root, exist_ok=True)
        return os.path.join(root, "online_donefile.txt")

    def last_done(self):
        path = self._donefile()
        if not os.path.exists(path):
            return None
        lines = [l for l in open(path).read().splitlines() if l.strip()]
        if not lines:
            return None
        rec = json.loads(lines[-1])
        return rec  # {"day":..., "pass":..., "path":...}

    def write_done(self, day: str, pass_id: int, path: str, kind: str) -> None:
        with open(self._donefile(), "a") as f:
            f.write(
                json.dumps(
                    {"day": day, "pass": pass_id, "path": path, "kind": kind,
                     "ts": time.time()}
                )
                + "\n"
            )

    # -- data gating ---------------------------------------------------------------
    def wait_for_data(self, pass_dir: str) -> bool:
        if not self.data_donefile:
            return os.path.isdir(pass_dir)
        marker = os.path.join(pass_dir, self.data_donefile)
        waited = 0.0
        while not os.path.exists(marker):
            if self.data_wait_timeout and waited >= self.data_wait_timeout:
                return False
            time.sleep(self.data_sleep_second)
            waited += self.data_sleep_second
        return True

    # -- feature lifecycle ------------------------------------------------------------
    def _embedding_entries(self):
        """[(path, leaf)] for every sharded/packed table in params."""
        flat = jax.tree_util.tree_flatten_with_path(self.state.params)[0]
        return [(p, leaf) for p, leaf in flat if is_embedding_path(p)]

    def _observing(self, dataset):
        """Wrap a host-batch iterator: record feature shows BEFORE the
        batch is device_put (np.asarray on a multi-host global array
        crashes; on one host it would force a device->host sync)."""
        for batch in dataset:
            self._observe_batch(batch)
            yield batch

    def _make_stats(self, rows: int) -> FeatureStats:
        return FeatureStats(
            rows,
            decay=float(self.config.get(
                "table_parameters.show_click_decay_rate", 0.98)),
            delete_threshold=float(self.config.get(
                "table_parameters.delete_threshold", 0.8)),
            delete_after_unseen_days=int(self.config.get(
                "table_parameters.delete_after_unseen_days", 30)),
        )

    def _observe_batch(self, batch) -> None:
        if not self._feature_lifecycle or "sparse" not in batch:
            return
        if self.stats is None:
            entries = self._embedding_entries()
            if not entries:
                self._feature_lifecycle = False  # no tables to track
                return
            self.stats = self._make_stats(entries[0][1].shape[0])
        ids = np.asarray(batch["sparse"]).reshape(-1)
        vocab = getattr(self.model_def, "vocab_size", None)
        if vocab:
            ids = ids % vocab
        rows_total = len(self.stats.show)
        if vocab:
            from paddlerec_tpu.ops.sparse_update import infer_pack

            try:
                pack = infer_pack(vocab, rows_total)
            except ValueError:
                pack = max(1, int(np.ceil(vocab / rows_total)))
        else:
            pack = 1
        self.stats.observe((ids // pack) % rows_total)

    def shrink(self) -> int:
        """Evict stale feature rows: zero table rows + optimizer moments."""
        if self.stats is None:
            return 0
        evict_rows = self.stats.end_day()
        if len(evict_rows) == 0:
            return 0
        rows = jnp.asarray(evict_rows, jnp.int32)
        n_rows = len(self.stats.show)

        def zero_rows(path, leaf):
            # row ids come from the FIRST table's geometry; only tables
            # with the same row count can be safely evicted by them
            if (is_embedding_path(path) and leaf.ndim >= 2
                    and leaf.shape[0] == n_rows):
                return leaf.at[rows].set(0.0)
            return leaf

        params = jax.tree_util.tree_map_with_path(zero_rows, self.state.params)
        opt_state = jax.tree_util.tree_map_with_path(
            lambda p, l: l.at[rows].set(0.0)
            if is_embedding_path(p) and hasattr(l, "ndim") and l.ndim >= 2
            and l.shape[0] == n_rows
            else l,
            self.state.opt_state,
        )
        extra = self.state.extra
        if extra is not None:
            # evicted rows must not keep stale row-wise moments
            extra = jax.tree.map(
                lambda l: l.at[rows].set(0)
                if hasattr(l, "shape") and l.ndim >= 1
                and l.shape[0] == n_rows else l,
                extra,
            )
        self.state = self.state.replace(params=params, opt_state=opt_state,
                                        extra=extra)
        logger.info(f"shrink: evicted {len(evict_rows)} stale feature rows")
        return len(evict_rows)

    # -- pass/day loops -------------------------------------------------------------
    def _day_list(self) -> List[str]:
        if self.days:
            return self.days
        days = []
        from datetime import datetime, timedelta

        d = datetime.strptime(self.start_day, "%Y%m%d")
        end = datetime.strptime(self.end_day, "%Y%m%d")
        while d <= end:
            days.append(d.strftime("%Y%m%d"))
            d += timedelta(days=1)
        return days

    def train_pass(self, pass_dir, day: str, pass_id: int) -> Dict[str, float]:
        batch_size = int(self.config.runner("train_batch_size", 32))
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if self._infer_step is None:
            self._infer_step = self._build_infer_step()

        dirs = [pass_dir] if isinstance(pass_dir, str) else list(pass_dir)
        datasets = [self.make_dataset(d, batch_size)
                    for d in dirs if os.path.isdir(d)]
        dataset = _ChainDataset(datasets)

        # join-time eval BEFORE training on the pass (online AUC)
        if self.infer_before_train and self.use_auc:
            metric_state = self._init_metric_state()
            for batch in self._device_batches(dataset):
                metric_state, _ = self._infer_step(self.state, batch, metric_state)
            m = self._compute_metrics(metric_state)
            logger.info(
                f"[day {day} pass {pass_id}] "
                + metrics_lib.metrics_str(m, "online eval (pre-train)")
            )

        metric_state = self._init_metric_state()
        n = 0
        for batch in self._device_batches(self._observing(dataset)):
            self.state, metric_state, loss = self._train_step(
                self.state, batch, metric_state
            )
            n += self._batch_rows(batch)
        metrics = (
            self._compute_metrics(metric_state) if self.use_auc else {}
        )
        if self.use_auc:
            logger.info(
                f"[day {day} pass {pass_id}] "
                + metrics_lib.metrics_str(metrics, "train")
            )
        return metrics

    def run(self) -> Dict[str, float]:
        save_root = resolve_path(self.config, "runner.model_save_path")
        data_root = resolve_path(self.config, "runner.train_data_dir")
        if self.state is None:
            self.init_state()
        # resume from donefile: the last record gates which passes are done;
        # full state restores from the most recent "checkpoint" record
        done = self.last_done()
        if done:
            records = [
                json.loads(l)
                for l in open(self._donefile()).read().splitlines()
                if l.strip()
            ]
            ckpts = [r for r in records if r["kind"] == "checkpoint"]
            if ckpts:
                logger.info(f"resuming state from {ckpts[-1]['path']}")
                tag = os.path.basename(ckpts[-1]["path"])
                self.load_checkpoint(save_root, tag)
                stats_path = os.path.join(save_root, f"{tag}_stats.npz")
                if os.path.exists(stats_path):
                    entries = self._embedding_entries()
                    if entries:
                        self.stats = self._make_stats(entries[0][1].shape[0])
                        self.stats.load(stats_path)
            # the skip gate must match what the restored STATE contains:
            # delta/base records are published artifacts, not resume
            # points — gating on them would skip passes whose training
            # is not in the restored checkpoint
            done = ckpts[-1] if ckpts else None
        last_metrics: Dict[str, float] = {}
        first = True
        for day in self._day_list():
            trained_this_day = False
            for pass_id, pass_dirs in enumerate(self.pass_intervals):
                if done and (
                    day < done["day"]
                    or (day == done["day"] and pass_id <= done["pass"])
                ):
                    continue  # already trained (exactly-once per donefile)
                # a pass may span several split intervals — train them all
                dirs = [os.path.join(data_root, day, d) for d in pass_dirs]
                # every interval of the pass must be ready — gating only
                # the first would train on partial data and mark the
                # pass done forever
                if not all(self.wait_for_data(d) for d in dirs):
                    continue  # no (complete) data for this pass
                if first and self.save_first_base:
                    path = ckpt_lib.save_params_only(
                        jax.device_get(self.state.params), save_root,
                        f"base_{day}",
                    )
                    self.write_done(day, -1, path, "base")
                first = False

                last_metrics = self.train_pass(dirs, day, pass_id)
                trained_this_day = True

                if (pass_id + 1) % self.checkpoint_per_pass == 0:
                    tag = f"ckpt_{day}_{pass_id}"
                    path = ckpt_lib.save_model(
                        jax.device_get(self.state.params),
                        jax.device_get(self.state.opt_state),
                        save_root, tag,
                        extra=(jax.device_get(self.state.extra)
                               if self.state.extra is not None else None),
                    )
                    if self.stats is not None:
                        # feature-lifecycle state must survive restarts
                        # (the reference persists show/click inside the
                        # PS table)
                        self.stats.save(os.path.join(
                            save_root, f"{tag}_stats.npz"
                        ))
                    self.write_done(day, pass_id, path, "checkpoint")
                if (pass_id + 1) % self.save_delta_frequency == 0:
                    tag = f"delta_{day}_{pass_id}"
                    path = ckpt_lib.save_params_only(
                        jax.device_get(self.state.params), save_root, tag
                    )
                    self.write_done(day, pass_id, path, "delta")
            # end of day: shrink + base model — but never republish a
            # historical day whose passes were all skipped on resume
            if not trained_this_day:
                continue
            self.shrink()
            path = ckpt_lib.save_params_only(
                jax.device_get(self.state.params), save_root, f"base_{day}"
            )
            self.write_done(day, len(self.pass_intervals) - 1, path, "base")
        return last_metrics
