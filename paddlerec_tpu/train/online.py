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


class _ArrayDataset:
    """Re-iterable fixed-shape batches over in-memory row arrays (the
    materialized form a global-shuffled pass takes)."""

    def __init__(self, labels, sparse, dense, batch_size: int):
        self.labels = labels
        self.sparse = sparse
        self.dense = dense
        self.batch_size = int(batch_size)

    def __iter__(self):
        bs = self.batch_size
        n = len(self.labels) - (len(self.labels) % bs)
        for i in range(0, n, bs):
            batch = {
                "label": np.asarray(self.labels[i:i + bs], np.float32),
                "sparse": np.asarray(self.sparse[i:i + bs]),
                "mask": np.ones(bs, np.float32),
            }
            if self.dense is not None:
                batch["dense"] = np.asarray(self.dense[i:i + bs])
            yield batch


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
        # rows touched since the last published base/delta (mode-1 delta
        # bookkeeping, flow_helper.py:372-533)
        self._touched: Optional[np.ndarray] = None
        self.global_shuffle = bool(config.runner("global_shuffle", False))
        self.prefetch_next_pass = bool(config.runner("prefetch", False))
        self._prefetch_thread = None
        self._prefetched = None  # (key, dataset)

    # -- donefile protocol -----------------------------------------------------
    # All donefile / data-gating / stats IO routes through utils/fs.py so
    # a ``gs://`` model root (the HDFS analog, flow_helper.py:40-57)
    # works with the online loop, not only the epoch trainer.
    def _fs(self, path: str):
        from paddlerec_tpu.utils.fs import get_fs

        return get_fs(path)

    def _donefile(self) -> str:
        root = resolve_path(self.config, "runner.model_save_path")
        self._fs(root).mkdir(root)
        return os.path.join(root, "online_donefile.txt")

    def last_done(self):
        path = self._donefile()
        fs = self._fs(path)
        if not fs.exists(path):
            return None
        lines = [l for l in fs.read_text(path).splitlines() if l.strip()]
        if not lines:
            return None
        rec = json.loads(lines[-1])
        return rec  # {"day":..., "pass":..., "path":...}

    def write_done(self, day: str, pass_id: int, path: str, kind: str) -> None:
        done = self._donefile()
        self._fs(done).append_line(
            done,
            json.dumps(
                {"day": day, "pass": pass_id, "path": path, "kind": kind,
                 "ts": time.time()}
            ),
        )

    # -- data gating ---------------------------------------------------------------
    def wait_for_data(self, pass_dir: str) -> bool:
        fs = self._fs(pass_dir)
        if not self.data_donefile:
            return fs.isdir(pass_dir)
        marker = os.path.join(pass_dir, self.data_donefile)
        waited = 0.0
        while not fs.exists(marker):
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
        if "sparse" not in batch:
            return
        if self.stats is None:
            entries = self._embedding_entries()
            if not entries:
                self._feature_lifecycle = False  # no tables to track
                return
            self.stats = self._make_stats(entries[0][1].shape[0])
            self._touched = np.zeros(entries[0][1].shape[0], bool)
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
        rows = (ids // pack) % rows_total
        # delta bookkeeping is independent of the lifecycle flag: the
        # mode-1 delta publishes exactly the rows touched since the last
        # published artifact
        if self._touched is not None:
            self._touched[rows] = True
        if self._feature_lifecycle:
            self.stats.observe(rows)

    def _save_stats(self, save_root: str, tag: str) -> None:
        dest = os.path.join(save_root, f"{tag}_stats.npz")
        if "://" in save_root:
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".npz",
                                             delete=False) as t:
                tmp = t.name
            self.stats.save(tmp)
            self._fs(dest).upload(tmp, dest)
            os.unlink(tmp)
        else:
            self.stats.save(dest)

    def _load_stats(self, save_root: str, tag: str) -> None:
        src = os.path.join(save_root, f"{tag}_stats.npz")
        fs = self._fs(src)
        if not fs.exists(src):
            return
        entries = self._embedding_entries()
        if not entries:
            return
        self.stats = self._make_stats(entries[0][1].shape[0])
        self._touched = np.zeros(entries[0][1].shape[0], bool)
        if "://" in save_root:
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".npz",
                                             delete=False) as t:
                tmp = t.name
            fs.download(src, tmp)
            self.stats.load(tmp)
            os.unlink(tmp)
        else:
            self.stats.load(src)

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

    # -- delta publishing -----------------------------------------------------
    def save_delta(self, save_root: str, tag: str) -> str:
        """Mode-1 delta: publish ONLY the rows touched since the last
        published artifact, as cube KV shards (logical id → vector).

        Artifact size ∝ touched rows — the reference's delta exists to
        make pass-cadence publishing cheap (flow_helper.py:372-533); r1
        wrote full params under a delta_ tag, tens of GB at 10^8 vocab.
        The shards are directly consumable by the cube KV store
        (native/cube.py + serving/vector lookup path).
        """
        from paddlerec_tpu.ops.packed_embedding import sub_width

        final_dir = os.path.join(save_root, tag)
        # remote roots: build locally, then upload (export_table and
        # np.savez are local-filesystem writers)
        remote = "://" in save_root
        if remote:
            import tempfile

            out_dir = tempfile.mkdtemp(prefix="delta_")
        else:
            out_dir = final_dir
        vocab = getattr(self.model_def, "vocab_size", None) or int(
            self.config.hyper("sparse_feature_number", 0)
        )
        dim = int(getattr(
            self.model_def, "sparse_embed_logical_dim",
            int(self.config.hyper("sparse_feature_dim", 9)),
        ))
        entries = self._embedding_entries()
        rows = (np.nonzero(self._touched)[0]
                if self._touched is not None else np.zeros(0, np.int64))
        os.makedirs(out_dir, exist_ok=True)
        meta = {"rows_touched": int(len(rows)), "vocab": int(vocab),
                "dim": dim, "tables": []}
        shards = int(self.config.runner("delta_cube_shards", 1))
        for path, leaf in entries:
            if self._touched is None or leaf.shape[0] != len(self._touched):
                continue
            name = "_".join(str(p.key if hasattr(p, "key") else p)
                            for p in path)
            if len(rows) == 0:
                meta["tables"].append({"name": name, "keys": 0})
                continue
            sub = np.asarray(
                jax.device_get(leaf[jnp.asarray(rows)]), np.float32
            )
            if sub.ndim == 2 and sub.shape[1] == 128 and vocab:
                # packed physical rows → logical (id, vector) pairs
                w = sub_width(dim)
                pack = 128 // w
                vals = sub.reshape(-1, pack, w)[:, :, :dim].reshape(-1, dim)
                keys = (rows[:, None] * pack
                        + np.arange(pack)[None, :]).reshape(-1)
                keep = keys < vocab
                from paddlerec_tpu.native.cube import export_table

                export_table(
                    os.path.join(out_dir, name),
                    keys[keep].astype(np.int64),
                    np.ascontiguousarray(vals[keep]), shards,
                )
                meta["tables"].append(
                    {"name": name, "keys": int(keep.sum()), "format": "cube"}
                )
            else:
                # non-standard layout: raw touched rows
                np.savez_compressed(
                    os.path.join(out_dir, f"{name}_delta.npz"),
                    rows=rows, values=sub,
                )
                meta["tables"].append(
                    {"name": name, "keys": int(len(rows)), "format": "npz"}
                )
        with open(os.path.join(out_dir, "delta_meta.json"), "w") as f:
            json.dump(meta, f)
        if remote:
            fs = self._fs(final_dir)
            for root, _dirs, files in os.walk(out_dir):
                for fname in files:
                    local = os.path.join(root, fname)
                    rel = os.path.relpath(local, out_dir)
                    fs.upload(local, os.path.join(final_dir, rel))
            import shutil

            shutil.rmtree(out_dir, ignore_errors=True)
        if self._touched is not None:
            self._touched[:] = False  # next delta counts from here
        return final_dir

    # -- global shuffle + pass prefetch ---------------------------------------
    def _prepare_pass(self, dirs: List[str], seed: int):
        """Materialize a pass (InMemoryDataset.load_into_memory analog).

        With ``runner.global_shuffle`` every worker reads ALL the pass's
        files and keeps rows ``[rank::nproc]`` — a deterministic
        cross-worker redistribution (the dataset.global_shuffle RPC
        analog, static_ps_online_trainer.py:359-368) — then applies a
        seeded local permutation.  Without it, per-worker file shards
        chain as before (zero extra memory).
        """
        batch_size = int(self.config.runner("train_batch_size", 32))
        if not self.global_shuffle:
            fs0 = self._fs(dirs[0]) if dirs else None
            datasets = [self.make_dataset(d, batch_size)
                        for d in dirs if fs0 and fs0.isdir(d)]
            return _ChainDataset(datasets)
        from paddlerec_tpu.data.binary import is_slotbin
        from paddlerec_tpu.data.schema import schema_from_config
        from paddlerec_tpu.data.slot_reader import list_data_files

        schema = schema_from_config(self.config)
        rank, nproc = jax.process_index(), jax.process_count()
        labels, sparse, dense = [], [], []
        for d in dirs:
            if not self._fs(d).isdir(d):
                continue
            for f in list_data_files(d):
                la, sp, de = self._load_rows(f, schema)
                labels.append(la[rank::nproc])
                sparse.append(sp[rank::nproc])
                dense.append(de[rank::nproc] if de is not None else None)
        if not labels:
            return _ChainDataset([])
        la = np.concatenate(labels)
        sp = np.concatenate(sparse)
        de = (np.concatenate([d for d in dense if d is not None])
              if any(d is not None for d in dense) else None)
        perm = np.random.RandomState(seed + rank).permutation(len(la))
        return _ArrayDataset(la[perm], sp[perm],
                             de[perm] if de is not None else None,
                             batch_size)

    def _load_rows(self, path: str, schema):
        from paddlerec_tpu.data.binary import SlotBinFile, is_slotbin

        if path.endswith(".bin") and is_slotbin(path):
            f = SlotBinFile(path)
            sp = np.asarray(f.sparse)
            if sp.ndim == 3 and sp.shape[2] == 1:
                sp = sp[:, :, 0]
            return (np.asarray(f.labels), sp,
                    np.asarray(f.dense) if f.dense is not None else None)
        from paddlerec_tpu.data.binary import _parse_text

        return _parse_text(path, schema.num_sparse, schema.dense_dim,
                           num_threads=4)

    def _next_pass_key(self, day_idx: int, pass_id: int, days: List[str]):
        """(day, pass, dirs) of the pass after (day_idx, pass_id), or None."""
        data_root = resolve_path(self.config, "runner.train_data_dir")
        p = pass_id + 1
        d = day_idx
        if p >= len(self.pass_intervals):
            p = 0
            d += 1
        if d >= len(days):
            return None
        dirs = [os.path.join(data_root, days[d], s)
                for s in self.pass_intervals[p]]
        return (days[d], p, dirs)

    def _data_ready_now(self, pass_dir: str) -> bool:
        """Non-blocking readiness check (prefetch must NEVER read a pass
        whose data_donefile marker is absent — a producer may still be
        writing it)."""
        fs = self._fs(pass_dir)
        if not self.data_donefile:
            return fs.isdir(pass_dir)
        return fs.exists(os.path.join(pass_dir, self.data_donefile))

    def _start_prefetch(self, key, dirs, seed: int) -> None:
        """Overlap the NEXT pass's parse/load with this pass's training
        (static_ps_online_trainer.py:370-371 prefetch analog).  Only
        starts when every interval of the next pass is ALREADY ready;
        otherwise the normal gated path loads it later."""
        if not all(self._data_ready_now(d) for d in dirs):
            return
        import threading

        def work():
            try:
                self._prefetched = (key, self._prepare_pass(dirs, seed))
            except Exception as e:  # surfaced when the pass is consumed
                self._prefetched = (key, e)

        self._prefetch_thread = threading.Thread(target=work, daemon=True)
        self._prefetch_thread.start()

    def _take_prefetched(self, key):
        if self._prefetch_thread is not None:
            self._prefetch_thread.join()
            self._prefetch_thread = None
        if self._prefetched and self._prefetched[0] == key:
            ds = self._prefetched[1]
            self._prefetched = None
            if isinstance(ds, Exception):
                raise ds
            return ds
        return None

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

    def train_pass(self, pass_dir, day: str, pass_id: int,
                   dataset=None) -> Dict[str, float]:
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if self._infer_step is None:
            self._infer_step = self._build_infer_step()

        dirs = [pass_dir] if isinstance(pass_dir, str) else list(pass_dir)
        if dataset is None:
            dataset = self._prepare_pass(
                dirs, seed=int(self.config.runner("seed", 2023)) + pass_id
            )

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
            done_path = self._donefile()
            records = [
                json.loads(l)
                for l in self._fs(done_path).read_text(done_path).splitlines()
                if l.strip()
            ]
            ckpts = [r for r in records if r["kind"] == "checkpoint"]
            if ckpts:
                logger.info(f"resuming state from {ckpts[-1]['path']}")
                tag = os.path.basename(ckpts[-1]["path"])
                self.load_checkpoint(save_root, tag)
                self._load_stats(save_root, tag)
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

                # consume the prefetched dataset if the previous pass
                # staged it; kick off prefetch of the NEXT pass before
                # training this one so parse/load overlaps the steps
                dataset = self._take_prefetched((day, pass_id))
                if self.prefetch_next_pass:
                    days = self._day_list()
                    nxt = self._next_pass_key(
                        days.index(day), pass_id, days
                    )
                    if nxt is not None:
                        nday, npass, ndirs = nxt
                        self._start_prefetch(
                            (nday, npass), ndirs,
                            seed=int(self.config.runner("seed", 2023))
                            + npass,
                        )
                last_metrics = self.train_pass(dirs, day, pass_id,
                                               dataset=dataset)
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
                        self._save_stats(save_root, tag)
                    self.write_done(day, pass_id, path, "checkpoint")
                if (pass_id + 1) % self.save_delta_frequency == 0:
                    tag = f"delta_{day}_{pass_id}"
                    path = self.save_delta(save_root, tag)
                    self.write_done(day, pass_id, path, "delta")
            # end of day: shrink + base model — but never republish a
            # historical day whose passes were all skipped on resume
            if not trained_this_day:
                continue
            self.shrink()
            path = ckpt_lib.save_params_only(
                jax.device_get(self.state.params), save_root, f"base_{day}"
            )
            if self._touched is not None:
                self._touched[:] = False  # deltas count from this base
            self.write_done(day, len(self.pass_intervals) - 1, path, "base")
        return last_metrics
