import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core import metrics as M


def _ref_auc_sweep(pos, neg):
    """Direct transcription of the reference bucket sweep for cross-checking."""
    num_bucket = len(pos)
    area = 0.0
    p = n = 0.0
    for i in range(num_bucket):
        idx = num_bucket - 1 - i
        new_p = p + pos[idx]
        new_n = n + neg[idx]
        area += (new_n - n) * (p + new_p) / 2
        p, n = new_p, new_n
    if p * n == 0:
        return 0.5
    return area / (p * n)


def test_auc_matches_reference_sweep(rng):
    pos = rng.randint(0, 100, size=64).astype(np.float64)
    neg = rng.randint(0, 100, size=64).astype(np.float64)
    assert np.isclose(M.auc_from_buckets(pos, neg), _ref_auc_sweep(pos, neg))


def test_auc_matches_sklearn(rng):
    n = 5000
    labels = (rng.rand(n) < 0.3).astype(np.float32)
    # correlated predictions
    preds = np.clip(labels * 0.3 + rng.rand(n) * 0.7, 0, 1).astype(np.float32)
    state = M.init_auc_state()
    # feed in several batches
    for i in range(0, n, 1000):
        state = M.update_auc_state(
            state, jnp.asarray(preds[i : i + 1000]), jnp.asarray(labels[i : i + 1000])
        )
    auc = M.compute_metrics(state)["auc"]

    # exact AUC via rank statistic
    order = np.argsort(preds, kind="mergesort")
    ranks = np.empty(n)
    ranks[order] = np.arange(1, n + 1)
    # tie-corrected average ranks
    sorted_preds = preds[order]
    i = 0
    while i < n:
        j = i
        while j + 1 < n and sorted_preds[j + 1] == sorted_preds[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j + 2) / 2.0
        i = j + 1
    n_pos = labels.sum()
    n_neg = n - n_pos
    exact = (ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    # bucketization quantizes at 1/4096 — tolerance accordingly
    assert abs(auc - exact) < 2e-3


def test_masked_update(rng):
    state = M.init_auc_state()
    preds = jnp.asarray([0.9, 0.1, 0.5, 0.5])
    labels = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    state = M.update_auc_state(state, preds, labels, mask)
    m = M.compute_metrics(state)
    assert m["total_ins"] == 2
    assert m["auc"] == 1.0  # perfect ranking on unmasked pairs


def test_ctr_bundle(rng):
    state = M.init_auc_state()
    preds = jnp.asarray([0.8, 0.2])
    labels = jnp.asarray([1.0, 0.0])
    state = M.update_auc_state(state, preds, labels)
    m = M.compute_metrics(state)
    assert np.isclose(m["mae"], 0.2)
    assert np.isclose(m["rmse"], 0.2)
    assert np.isclose(m["actual_ctr"], 0.5)
    assert np.isclose(m["predicted_ctr"], 0.5)
    assert np.isclose(m["copc"], 1.0)
    assert np.isclose(m["mean_q"], 0.8)


def test_psum_state_equals_concat():
    """Distributed AUC invariant: psum of per-shard buckets == global AUC."""
    from jax.sharding import Mesh, PartitionSpec as P

    shard_map = jax.shard_map

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("dp",))
    n_per = 128
    n = n_per * len(devs)
    rng = np.random.RandomState(1)
    preds = rng.rand(n).astype(np.float32)
    labels = (rng.rand(n) < 0.4).astype(np.float32)

    def shard_fn(p, l):
        st = M.init_auc_state()
        st = M.update_auc_state(st, p, l)
        return M.psum_auc_state(st, "dp")

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=jax.tree.map(lambda _: P(), M.init_auc_state()),
    )
    dist_state = fn(jnp.asarray(preds), jnp.asarray(labels))
    dist_auc = M.compute_metrics(dist_state)["auc"]

    st = M.update_auc_state(M.init_auc_state(), jnp.asarray(preds), jnp.asarray(labels))
    assert np.isclose(dist_auc, M.compute_metrics(st)["auc"])


def test_ranking_metrics():
    assert M.positive_order_ratio([2.0, 3.0], [1.0]) == 1.0
    assert M.positive_order_ratio([1.0], [1.0]) == 0.5
    ranks = np.array([1, 3, 20])
    assert np.isclose(M.hit_ratio_at_k(ranks, 10), 2 / 3)
    assert M.ndcg_at_k(np.array([1]), 10) == 1.0


def test_counters_exact_past_float32_limit():
    """Instance counters must keep incrementing past 2^24 (a naive
    float32 counter silently saturates there — one full-Criteo epoch
    overflows) AND past 2^31 (an int32 wraps negative at 2.1B; a 1TB
    Criteo epoch is ~4.4B instances).  Kahan float32 pairs cover both."""
    import jax.numpy as jnp

    from paddlerec_tpu.core import metrics as metrics_lib

    state = metrics_lib.init_auc_state()
    state = dict(state, total_ins=jnp.asarray(2.0**24, jnp.float32),
                 stat_pos=state["stat_pos"].at[100].set(2**24))
    preds = jnp.full((64,), 100.5 / state["stat_pos"].shape[0])
    labels = jnp.ones((64,))
    state = metrics_lib.update_auc_state(state, preds, labels)
    assert int(state["total_ins"]) - int(state["total_ins_c"]) == 2**24 + 64
    assert int(state["stat_pos"][100]) == 2**24 + 64
    # past the int32 limit: the Kahan pair keeps exact integer resolution
    state = dict(state, total_ins=jnp.asarray(5.0e9, jnp.float32),
                 total_ins_c=jnp.zeros((), jnp.float32))
    for _ in range(4):
        state = metrics_lib.update_auc_state(state, preds, labels)
    got = float(state["total_ins"]) - float(state["total_ins_c"])
    assert got == 5.0e9 + 4 * 64, got


def test_kahan_sums_stay_accurate():
    """Scalar metric sums use compensated accumulation: adding many
    small values to a large total must not round away."""
    import jax.numpy as jnp
    import numpy as np

    from paddlerec_tpu.core import metrics as metrics_lib

    state = metrics_lib.init_auc_state()
    state = dict(state, prob=jnp.asarray(2.0**24, jnp.float32))
    # 1000 batches of tiny prob mass: plain f32 would add ~0 of it
    for _ in range(50):
        preds = jnp.full((20,), 0.25)
        state = metrics_lib.update_auc_state(
            state, preds, jnp.zeros((20,))
        )
    gained = float(state["prob"]) + float(state["prob_c"]) - 2.0**24
    np.testing.assert_allclose(gained, 50 * 20 * 0.25, rtol=1e-3)
