"""Streaming metrics: histogram-bucket AUC + the full CTR bundle.

TPU-native re-implementation of the reference's metric stack:

  * AUC from 2^12 threshold buckets of positive/negative counts — the exact
    algorithm of `tools/utils/static_ps/metric_helper.py:76-99` (reverse
    trapezoid sweep over buckets).  Buckets are plain arrays, so distributed
    reduction is a single ``psum`` / host allreduce, giving *exact* global
    AUC (not an average of per-worker AUCs).
  * CTR bundle — bucket_error / MAE / RMSE / actual CTR / predicted CTR /
    COPC / mean Q — mirroring `metric_helper.py:102-241`.

Everything in-graph is a pure function: ``update(state, preds, labels)``
returns a new state; states are pytrees of f64-safe f32/ i64 arrays and can
be accumulated inside a jitted step and psum'd over a mesh axis.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

NUM_BUCKETS = 2 ** 12  # matches the in-graph AUC var of the reference
                        # (models/rank/dnn/static_model.py:100-106)

MetricState = Dict[str, jnp.ndarray]


def init_auc_state(num_buckets: int = NUM_BUCKETS) -> MetricState:
    # counts are int32 (exact to 2^31; float32 counters silently stop
    # incrementing at 2^24 — one epoch of full Criteo overflows them);
    # the float sums carry Kahan compensation terms ("*_c") so epoch-
    # scale accumulation keeps ~float64 accuracy on TPU without x64.
    return {
        "stat_pos": jnp.zeros((num_buckets,), jnp.int32),
        "stat_neg": jnp.zeros((num_buckets,), jnp.int32),
        "sqrerr": jnp.zeros((), jnp.float32),
        "sqrerr_c": jnp.zeros((), jnp.float32),
        "abserr": jnp.zeros((), jnp.float32),
        "abserr_c": jnp.zeros((), jnp.float32),
        "prob": jnp.zeros((), jnp.float32),
        "prob_c": jnp.zeros((), jnp.float32),
        "q": jnp.zeros((), jnp.float32),
        "q_c": jnp.zeros((), jnp.float32),
        # instance counters are Kahan-compensated float32 pairs: a plain
        # int32 wraps negative past 2.1B instances in one metric window
        # (a full 1TB-Criteo epoch is ~4.4B); the (total, comp) pair keeps
        # integer increments <= 2^24 accurate to ~2^48 and stays psum-able
        "pos_ins": jnp.zeros((), jnp.float32),
        "pos_ins_c": jnp.zeros((), jnp.float32),
        "total_ins": jnp.zeros((), jnp.float32),
        "total_ins_c": jnp.zeros((), jnp.float32),
    }


def _kahan_add(total, comp, x):
    """Compensated add: returns (new_total, new_comp)."""
    y = x - comp
    t = total + y
    return t, (t - total) - y


def update_auc_state(
    state: MetricState,
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> MetricState:
    """Accumulate a batch of (pred, label) pairs into the bucket histograms.

    preds: (B,) probabilities in [0, 1]; labels: (B,) in {0, 1};
    mask: optional (B,) {0,1} validity mask for padded batches.
    """
    num_buckets = state["stat_pos"].shape[0]
    preds = preds.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(preds)
    else:
        mask = mask.reshape(-1).astype(jnp.float32)

    bucket = jnp.clip(
        (preds * num_buckets).astype(jnp.int32), 0, num_buckets - 1
    )
    pos_w = labels * mask
    neg_w = (1.0 - labels) * mask
    pos_i = jnp.round(pos_w).astype(jnp.int32)
    neg_i = jnp.round(neg_w).astype(jnp.int32)
    stat_pos = state["stat_pos"].at[bucket].add(pos_i)
    stat_neg = state["stat_neg"].at[bucket].add(neg_i)

    err = preds - labels
    q = jnp.where(labels > 0.5, preds, 1.0 - preds)  # per-ins q value
    sqrerr, sqrerr_c = _kahan_add(
        state["sqrerr"], state["sqrerr_c"], jnp.sum(err * err * mask)
    )
    abserr, abserr_c = _kahan_add(
        state["abserr"], state["abserr_c"], jnp.sum(jnp.abs(err) * mask)
    )
    prob, prob_c = _kahan_add(
        state["prob"], state["prob_c"], jnp.sum(preds * mask)
    )
    qs, q_c = _kahan_add(state["q"], state["q_c"], jnp.sum(q * mask))
    pos_ins, pos_ins_c = _kahan_add(
        state["pos_ins"], state["pos_ins_c"],
        jnp.sum(pos_i).astype(jnp.float32),
    )
    total_ins, total_ins_c = _kahan_add(
        state["total_ins"], state["total_ins_c"],
        jnp.sum(jnp.round(mask)).astype(jnp.float32),
    )
    return {
        "stat_pos": stat_pos,
        "stat_neg": stat_neg,
        "sqrerr": sqrerr,
        "sqrerr_c": sqrerr_c,
        "abserr": abserr,
        "abserr_c": abserr_c,
        "prob": prob,
        "prob_c": prob_c,
        "q": qs,
        "q_c": q_c,
        "pos_ins": pos_ins,
        "pos_ins_c": pos_ins_c,
        "total_ins": total_ins,
        "total_ins_c": total_ins_c,
    }


def psum_auc_state(state: MetricState, axis_name: str) -> MetricState:
    """All-reduce a metric state across a mesh axis (inside shard_map/pjit)."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), state)


def auc_from_buckets(stat_pos: np.ndarray, stat_neg: np.ndarray) -> float:
    """Exact reference AUC sweep (metric_helper.py:76-99), vectorized.

    Walk buckets from the highest threshold down; each bucket contributes a
    trapezoid of area (Δneg) * (pos_before + pos_after) / 2.
    """
    pos = np.asarray(stat_pos, dtype=np.float64).reshape(-1)[::-1]
    neg = np.asarray(stat_neg, dtype=np.float64).reshape(-1)[::-1]
    cum_pos = np.cumsum(pos)
    new_neg = np.cumsum(neg)
    old_pos = cum_pos - pos
    area = float(np.sum(neg * (old_pos + cum_pos) / 2.0))
    total_pos = float(cum_pos[-1]) if len(cum_pos) else 0.0
    total_neg = float(new_neg[-1]) if len(new_neg) else 0.0
    if total_pos * total_neg == 0 or (total_pos + total_neg) == 0:
        return 0.5
    return area / (total_pos * total_neg)


def bucket_error(stat_pos: np.ndarray, stat_neg: np.ndarray) -> float:
    """Calibration bucket error, matching metric_helper.py:193-235."""
    pos = np.asarray(stat_pos, dtype=np.float64).reshape(-1)
    neg = np.asarray(stat_neg, dtype=np.float64).reshape(-1)
    num_buckets = len(pos)
    k_max_span = 0.01
    k_relative_error_bound = 0.05
    last_ctr = -1.0
    impression_sum = ctr_sum = click_sum = 0.0
    error_sum = error_count = 0.0
    for i in range(num_buckets):
        click = pos[i]
        show = pos[i] + neg[i]
        ctr = float(i) / num_buckets
        if abs(ctr - last_ctr) > k_max_span:
            last_ctr = ctr
            impression_sum = ctr_sum = click_sum = 0.0
        impression_sum += show
        ctr_sum += ctr * show
        click_sum += click
        if impression_sum == 0:
            continue
        adjust_ctr = ctr_sum / impression_sum
        if adjust_ctr == 0:
            continue
        relative_error = math.sqrt((1 - adjust_ctr) / (adjust_ctr * impression_sum))
        if relative_error < k_relative_error_bound:
            actual_ctr = click_sum / impression_sum
            error_sum += abs(actual_ctr / adjust_ctr - 1) * impression_sum
            error_count += impression_sum
            last_ctr = -1
    return error_sum / error_count if error_count > 0 else 0.0


def compute_metrics(state: MetricState) -> Dict[str, float]:
    """Host-side metric bundle from an (already-reduced) state.

    Returns auc, bucket_error, mae, rmse, actual_ctr, predicted_ctr, copc,
    mean_q, total_ins — the reference's `get_global_metrics` output list.
    """
    host = jax.tree.map(np.asarray, state)
    # Kahan pairs: comp holds the rounding excess, true sum = total - comp
    total = float(host["total_ins"]) - float(host.get("total_ins_c", 0.0))
    pos_ins = float(host["pos_ins"]) - float(host.get("pos_ins_c", 0.0))
    out = {
        "auc": auc_from_buckets(host["stat_pos"], host["stat_neg"]),
        "bucket_error": bucket_error(host["stat_pos"], host["stat_neg"]),
        "total_ins": total,
    }
    if total > 0:
        out["mae"] = float(host["abserr"]) / total
        out["rmse"] = math.sqrt(float(host["sqrerr"]) / total)
        out["actual_ctr"] = pos_ins / total
        out["predicted_ctr"] = float(host["prob"]) / total
        out["mean_q"] = float(host["q"]) / total
        out["copc"] = (
            out["actual_ctr"] / out["predicted_ctr"]
            if abs(out["predicted_ctr"]) > 1e-6
            else 0.0
        )
    else:
        out.update(mae=0.0, rmse=0.0, actual_ctr=0.0, predicted_ctr=0.0,
                   mean_q=0.0, copc=0.0)
    return out


def metrics_str(metrics: Dict[str, float], prefix: str = "") -> str:
    """Format like metric_helper.get_global_metrics_str."""
    return (
        f"{prefix} AUC={metrics['auc']:.6f} "
        f"BUCKET_ERROR={metrics.get('bucket_error', 0.0):.6f} "
        f"MAE={metrics.get('mae', 0.0):.6f} RMSE={metrics.get('rmse', 0.0):.6f} "
        f"Actual_CTR={metrics.get('actual_ctr', 0.0):.6f} "
        f"Predicted_CTR={metrics.get('predicted_ctr', 0.0):.6f} "
        f"COPC={metrics.get('copc', 0.0):.6f} "
        f"MEAN Q_VALUE={metrics.get('mean_q', 0.0):.6f} "
        f"Ins number={int(metrics.get('total_ins', 0))}"
    )


# ---------------------------------------------------------------------------
# Streaming accuracy (classification models: dselect_k, maml — the
# reference tracks these with paddle.metric.Accuracy / ad-hoc counters)
# ---------------------------------------------------------------------------

def init_acc_state() -> MetricState:
    return {
        "correct": jnp.zeros((), jnp.float32),
        "total": jnp.zeros((), jnp.float32),
    }


def update_acc_state(
    state: MetricState,
    correct: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> MetricState:
    """Accumulate per-example correctness flags (floats in {0,1})."""
    correct = correct.reshape(-1).astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(correct)
    else:
        mask = mask.reshape(-1).astype(jnp.float32)
    return {
        "correct": state["correct"] + jnp.sum(correct * mask),
        "total": state["total"] + jnp.sum(mask),
    }


def compute_acc(state: MetricState) -> float:
    host = jax.tree.map(np.asarray, state)
    total = float(host["total"])
    return float(host["correct"]) / total if total > 0 else 0.0


# ---------------------------------------------------------------------------
# Ranking / recall metrics (for match & recall model families)
# ---------------------------------------------------------------------------

def positive_order_ratio(pos_scores: np.ndarray, neg_scores: np.ndarray) -> float:
    """正序率: fraction of (pos, neg) pairs ranked correctly.

    Reference: tools/cal_pos_neg.py:20-96 (pairwise metric for match models).
    Ties count as half.
    """
    pos = np.asarray(pos_scores, dtype=np.float64).reshape(-1, 1)
    neg = np.asarray(neg_scores, dtype=np.float64).reshape(1, -1)
    if pos.size == 0 or neg.size == 0:
        return 0.0
    wins = np.sum(pos > neg) + 0.5 * np.sum(pos == neg)
    return float(wins) / (pos.size * neg.size)


def hit_ratio_at_k(ranks: np.ndarray, k: int) -> float:
    """HR@K given 1-based ranks of the true item (NCF eval protocol)."""
    ranks = np.asarray(ranks)
    return float(np.mean(ranks <= k)) if ranks.size else 0.0


def ndcg_at_k(ranks: np.ndarray, k: int) -> float:
    """NDCG@K with a single relevant item per list (NCF eval protocol)."""
    ranks = np.asarray(ranks, dtype=np.float64)
    if ranks.size == 0:
        return 0.0
    gains = np.where(ranks <= k, 1.0 / np.log2(ranks + 1.0), 0.0)
    return float(np.mean(gains))


def recall_at_k(hits: int, num_relevant: int) -> float:
    return hits / num_relevant if num_relevant else 0.0
