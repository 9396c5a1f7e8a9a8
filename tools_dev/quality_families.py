"""Family quality benchmark driver (VERDICT r3 item 2): trains each
family's flagship on its planted-signal corpus
(tools_dev/gen_family_corpora.py) and reports the metric next to the
corpus ceiling — the same certify-against-achievable discipline as the
CTR benchmark (doc/benchmark.md).

usage:
  python tools_dev/quality_families.py <corpora_root> [fam ...]
Prints one FAMILY_RESULT json line per family and a final
FAMILIES_SUMMARY line.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from paddlerec_tpu.core.config import Config  # noqa: E402
from paddlerec_tpu.train.trainer import Trainer  # noqa: E402

EPOCHS = {"din": 16, "mmoe": 10, "esmm": 10, "ncf": 24, "dssm": 8,
          "bst": 16, "dien": 16, "ple": 10, "aitm": 10,
          "multiview_simnet": 8, "mind": 24, "dsin": 16, "dmr": 12,
          "tagspace": 10, "textcnn": 10, "tdm": 8, "match_pyramid": 8,
          "ncf_multi": 24, "mind_multi": 24}


def _train(cfg_dict, epochs, eval_each=True, lr_decay=0.7,
           decay_from=None):
    cfg = Config(dict(
        cfg_dict, **{"hyper_parameters.optimizer.runtime_inject": True}
    ))
    t = Trainer(cfg)
    t.init_state()
    lr = float(cfg.hyper("optimizer.learning_rate", 1e-3))
    if decay_from is None:
        decay_from = max(epochs // 2, 1)
    best = {}
    for ep in range(epochs):
        if lr_decay and ep >= decay_from:
            lr *= lr_decay
            t.set_hyperparams(learning_rate=lr)
        t.config["runner.epochs"] = 1
        t.train()
        if eval_each:
            ev = t.evaluate()
            print(f"  epoch {ep}: " + json.dumps(
                {k: round(float(v), 5) for k, v in ev.items()
                 if isinstance(v, (int, float))}), flush=True)
            for k, v in ev.items():
                if isinstance(v, (int, float)) and v == v:
                    best[k] = max(best.get(k, 0.0), float(v))
    return t, best


def _register_din_probe():
    """Matched-form probe for the din corpus: learnable item latents +
    the generator's exact softmax-pooled-similarity form (learnable
    tau/gamma/bias).  Pins the REALIZABLE ceiling the way dev.synth_fm
    does for the CTR corpus — DIN's remaining gap to bayes is then
    attributable to its concat-MLP tower having to approximate an inner
    product, not to this framework's optimization."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from paddlerec_tpu.core import registry
    from paddlerec_tpu.core.registry import register_model
    from paddlerec_tpu.models.rank.din.model import ModelDef as DINDef

    if "dev.din_probe" in registry._REGISTRY:
        return

    class MatchedAttnNet(nn.Module):
        item_count: int
        k: int = 8
        # tau (the attention sharpness, the generator's population
        # -level constant) is FIXED — jointly learning it drifts (best
        # 0.700) and fixing calibration scalars too starves the model
        # of bias calibration (best 0.664, measured); gamma/bias stay
        # learnable so the probe can calibrate.
        fix_tau: bool = True

        @nn.compact
        def __call__(self, hist_item, hist_cat, target_item, target_cat,
                     seq_mask):
            z = nn.Embed(self.item_count, self.k, name="z",
                         embedding_init=nn.initializers.normal(0.1))
            rel = jnp.einsum("bk,blk->bl", z(target_item), z(hist_item))
            if self.fix_tau:
                tau = 8.0
            else:
                tau = self.param("tau", nn.initializers.constant(4.0), ())
            gamma = self.param("gamma", nn.initializers.constant(2.0), ())
            bias = self.param("bias", nn.initializers.zeros, ())
            live = seq_mask > 0
            relm = jnp.where(live, rel, -1e30)
            a = jax.nn.softmax(tau * relm, axis=-1) * live
            sig = (a * jnp.where(live, rel, 0.0)).sum(-1)
            return bias + gamma * sig

    @register_model("dev.din_probe")
    class DinProbeDef(DINDef):
        def __init__(self, config):
            super().__init__(config)
            self.module = MatchedAttnNet(self.item_count)


def run_din(root, epochs):
    data = os.path.join(root, "din")
    meta = json.load(open(f"{data}/meta.json"))
    _register_din_probe()
    _, probe_best = _train({
        "runner.model": "dev.din_probe",
        "runner.train_data_dir": f"{data}/train",
        "runner.test_data_dir": f"{data}/test",
        "runner.train_batch_size": 512,
        "runner.infer_batch_size": 512,
        "runner.epochs": 1,
        "runner.print_interval": 500,
        "runner.shuffle_files": True,
        "hyper_parameters.item_count": meta["items"],
        "hyper_parameters.cat_count": meta["cats"],
        "hyper_parameters.max_seq_len": meta["max_len"],
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 5e-3,
    }, epochs)
    _, best = _train({
        "runner.model": "rank.din",
        "runner.train_data_dir": f"{data}/train",
        "runner.test_data_dir": f"{data}/test",
        "runner.train_batch_size": 512,
        "runner.infer_batch_size": 512,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "runner.shuffle_files": True,
        "hyper_parameters.item_count": meta["items"],
        "hyper_parameters.cat_count": meta["cats"],
        "hyper_parameters.max_seq_len": meta["max_len"],
        "hyper_parameters.item_emb_size": 16,
        "hyper_parameters.cat_emb_size": 8,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
    }, epochs)
    probe = probe_best.get("auc", 0.0)
    return {
        "model": "rank.din", "test_auc": round(best.get("auc", 0.0), 5),
        "bayes_auc": meta["bayes_auc"], "sumpool_auc": meta["sumpool_auc"],
        "matched_probe_auc": round(probe, 5),
        "gap_to_bayes": round(meta["bayes_auc"] - best.get("auc", 0.0), 5),
        "gap_to_probe": round(probe - best.get("auc", 0.0), 5),
        "beats_sumpool_by": round(
            best.get("auc", 0.0) - meta["sumpool_auc"], 5),
    }


def _register_mmoe_probe():
    """Matched-form probe for the mmoe corpus: the generator's exact
    two-task form score_t = a_t . tanh(x V) + w_t . x + b_t
    (gen_family_corpora.gen_mmoe), fit by this stack.  Together with the
    Fisher-information oracle (tools_dev/mmoe_oracle.py) it decomposes
    mmoe's gap to bayes: bayes -> Fisher oracle is irreducible
    estimation noise; Fisher oracle -> probe is the non-convex joint
    fit of the shared tanh layer, paid even by the matched form; probe
    -> mmoe is architecture/optimization residual."""
    import flax.linen as nn
    import jax.numpy as jnp

    from paddlerec_tpu.core import registry
    from paddlerec_tpu.core.registry import register_model
    from paddlerec_tpu.models.multitask.mmoe.model import ModelDef as MMoEDef

    if "dev.mmoe_probe" in registry._REGISTRY:
        return

    class MatchedMultitaskNet(nn.Module):
        feature_size: int
        hidden: int = 16
        tasks: int = 2

        @nn.compact
        def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
            V = self.param("V", nn.initializers.normal(0.1),
                           (self.feature_size, self.hidden))
            a = self.param("a", nn.initializers.normal(0.3),
                           (self.tasks, self.hidden))
            w = self.param("w", nn.initializers.normal(0.03),
                           (self.tasks, self.feature_size))
            b = self.param("bias", nn.initializers.zeros, (self.tasks,))
            s = jnp.tanh(x @ V) @ a.T + x @ w.T + b
            return nn.sigmoid(s)

    @register_model("dev.mmoe_probe")
    class MMoEProbeDef(MMoEDef):
        def __init__(self, config):
            super().__init__(config)
            self.module = MatchedMultitaskNet(self.feature_size)


def run_mmoe(root, epochs):
    data = os.path.join(root, "mmoe")
    meta = json.load(open(f"{data}/meta.json"))
    _register_mmoe_probe()
    _, probe_best = _train({
        "runner.model": "dev.mmoe_probe",
        "runner.train_data_dir": f"{data}/train",
        "runner.test_data_dir": f"{data}/test",
        "runner.train_batch_size": 512,
        "runner.infer_batch_size": 512,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "hyper_parameters.feature_size": meta["feature_size"],
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
    }, max(epochs, 16))
    _, best = _train({
        "runner.model": "multitask.mmoe",
        "runner.train_data_dir": f"{data}/train",
        "runner.test_data_dir": f"{data}/test",
        "runner.train_batch_size": 512,
        "runner.infer_batch_size": 512,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "hyper_parameters.feature_size": meta["feature_size"],
        "hyper_parameters.expert_num": 8,
        "hyper_parameters.expert_size": 32,
        "hyper_parameters.tower_size": 16,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 1e-3,
    }, epochs)
    out = {"model": "multitask.mmoe"}
    # evaluate() names the first task's AUC "auc" and later ones
    # "auc_<task>" (core/metrics bundle convention)
    got = {"income": best.get("auc", 0.0),
           "marital": best.get("auc_marital", 0.0)}
    probe = {"income": probe_best.get("auc", 0.0),
             "marital": probe_best.get("auc_marital", 0.0)}
    for task in ("income", "marital"):
        out[f"test_auc_{task}"] = round(got[task], 5)
        out[f"probe_auc_{task}"] = round(probe[task], 5)
        out[f"bayes_auc_{task}"] = meta[f"bayes_auc_{task}"]
        out[f"linear_auc_{task}"] = meta[f"linear_auc_{task}"]
        out[f"gap_{task}"] = round(meta[f"bayes_auc_{task}"] - got[task], 5)
        out[f"gap_to_probe_{task}"] = round(probe[task] - got[task], 5)
    return out


def run_esmm(root, epochs):
    data = os.path.join(root, "esmm")
    meta = json.load(open(f"{data}/meta.json"))
    _, best = _train({
        "runner.model": "multitask.esmm",
        "runner.train_data_dir": f"{data}/train",
        "runner.test_data_dir": f"{data}/test",
        "runner.train_batch_size": 1024,
        "runner.infer_batch_size": 1024,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "hyper_parameters.sparse_feature_number": meta["vocab"],
        "hyper_parameters.sparse_feature_dim": 12,
        "hyper_parameters.num_field": meta["fields"],
        "hyper_parameters.max_len": 1,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
    }, epochs)
    ctr = best.get("auc", 0.0)
    ctcvr = best.get("auc_ctcvr", 0.0)
    out = {
        "model": "multitask.esmm",
        "test_auc_ctr": round(ctr, 5),
        "bayes_auc_ctr": meta["bayes_auc_ctr"],
        "gap_ctr": round(meta["bayes_auc_ctr"] - ctr, 5),
        "test_auc_ctcvr": round(ctcvr, 5),
        "bayes_auc_ctcvr": meta["bayes_auc_ctcvr"],
        "gap_ctcvr": round(meta["bayes_auc_ctcvr"] - ctcvr, 5),
    }
    # estimation-aware ceilings (posterior shrinkage; see gen_esmm)
    if "oracle_auc_ctr" in meta:
        out["oracle_auc_ctr"] = meta["oracle_auc_ctr"]
        out["oracle_auc_ctcvr"] = meta["oracle_auc_ctcvr"]
        out["gap_ctr_oracle"] = round(meta["oracle_auc_ctr"] - ctr, 5)
        out["gap_ctcvr_oracle"] = round(
            meta["oracle_auc_ctcvr"] - ctcvr, 5)
    return out


def _ncf_ranked_eval(t, test_file, group=100):
    """HR@10 / NDCG@10 over per-user (1 pos + N neg) groups — the
    reference's movielens protocol (models/recall/ncf/readme.md)."""
    rows = np.loadtxt(test_file, delimiter=",", dtype=np.int64)
    users = rows[:, 0].astype(np.int32)
    items = rows[:, 1].astype(np.int32)
    labels = rows[:, 2]
    params = jax.device_get(t.state.params)
    logits = np.asarray(t.model_def.module.apply(
        {"params": params}, users, items))
    hr = ndcg = 0
    n_groups = len(rows) // group
    for g in range(n_groups):
        sl = slice(g * group, (g + 1) * group)
        s, lab = logits[sl], labels[sl]
        rank = int((s > s[lab == 1][0]).sum())
        if rank < 10:
            hr += 1
            ndcg += 1.0 / np.log2(rank + 2)
    return hr / n_groups, ndcg / n_groups


def run_ncf(root, epochs, sub="ncf"):
    data = os.path.join(root, sub)
    meta = json.load(open(f"{data}/meta.json"))
    cfg = Config({
        "runner.model": "recall.ncf",
        "runner.train_data_dir": f"{data}/train",
        "runner.train_batch_size": 1024,
        "runner.epochs": 1,
        "runner.print_interval": 500,
        "runner.shuffle_files": True,
        "hyper_parameters.num_users": meta["num_users"],
        "hyper_parameters.num_items": meta["num_items"],
        "hyper_parameters.mf_dim": 8,
        "hyper_parameters.fc_layers": [64, 32, 16, 8],
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
        "hyper_parameters.optimizer.runtime_inject": True,
    })
    t = Trainer(cfg)
    t.init_state()
    lr = 2e-3
    best_hr = best_ndcg = 0.0
    for ep in range(epochs):
        if ep >= epochs // 2:
            lr *= 0.8
            t.set_hyperparams(learning_rate=lr)
        t.config["runner.epochs"] = 1
        t.train()
        if ep % 2 == 1 or ep == epochs - 1:
            hr, ndcg = _ncf_ranked_eval(
                t, f"{data}/test/part-0.txt",
                group=meta["test_negs"] + 1)
            print(f"  epoch {ep}: HR@10={hr:.4f} NDCG@10={ndcg:.4f}",
                  flush=True)
            best_hr, best_ndcg = max(best_hr, hr), max(best_ndcg, ndcg)
    out = {
        "model": "recall.ncf",
        "hr10": round(best_hr, 5), "ndcg10": round(best_ndcg, 5),
        "oracle_hr10": meta["oracle_hr10"],
        "oracle_ndcg10": meta["oracle_ndcg10"],
        "gap_hr10": round(meta["oracle_hr10"] - best_hr, 5),
    }
    if "refit_oracle_hr10" in meta:
        # achievable given-data ceiling: true item vectors + per-user
        # refit on exactly the train rows (see gen_ncf)
        out["refit_oracle_hr10"] = meta["refit_oracle_hr10"]
        out["refit_oracle_ndcg10"] = meta["refit_oracle_ndcg10"]
        out["gap_hr10_refit"] = round(
            meta["refit_oracle_hr10"] - best_hr, 5)
    return out


def run_dssm(root, epochs):
    data = os.path.join(root, "dssm")
    meta = json.load(open(f"{data}/meta.json"))
    t, best = _train({
        "runner.model": "match.dssm",
        "runner.train_data_dir": f"{data}/train",
        "runner.test_data_dir": f"{data}/test",
        "runner.train_batch_size": 256,
        "runner.infer_batch_size": 256,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "hyper_parameters.trigram_d": meta["trigram_d"],
        "hyper_parameters.neg_num": meta["neg_num"],
        "hyper_parameters.fc_sizes": [128, 128, 64],
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 1e-3,
    }, epochs)
    # protocol-tool leg: score the test split, write the reference's
    # ``query \t score \t label`` file, run tools/cal_pos_neg on it
    from paddlerec_tpu.tools.cal_pos_neg import cal_pos_neg

    ds = t.model_def.make_dataset(f"{data}/test", 256)
    params = jax.device_get(t.state.params)
    score_file = os.path.join(root, "dssm_scores.txt")
    qid = 0
    with open(score_file, "w") as f:
        for batch in ds:
            sp, sn = t.model_def.module.apply(
                {"params": params}, batch["query"], batch["doc_pos"],
                batch["doc_negs"])
            sp, sn = np.asarray(sp), np.asarray(sn)
            m = batch.get("mask")
            for i in range(len(sp)):
                if m is not None and m[i] == 0:
                    continue
                f.write(f"q{qid}\t{sp[i]:.6f}\t1\n")
                for j in range(sn.shape[1]):
                    f.write(f"q{qid}\t{sn[i, j]:.6f}\t0\n")
                qid += 1
    pnr = cal_pos_neg(score_file)
    # two conventions: the reference tool's PNR excludes tied pairs
    # (saturated cosines tie often), while the bayes ceiling counts a
    # tie as half — report both, compare like with like
    total = max(pnr.get("pair_num", 0), 1)
    ties_half = (pnr.get("pos_num", 0)
                 + 0.5 * pnr.get("equal_num", 0)) / total
    return {
        "model": "match.dssm",
        "pnr_auc_identity": round(best.get("auc", 0.0), 5),
        "cal_pos_neg_PNR_excl_ties": round(pnr.get("PNR", 0.0), 5),
        "pnr_ties_half": round(ties_half, 5),
        "bayes_pnr": meta["bayes_pnr"],
        "gap_pnr": round(meta["bayes_pnr"] - ties_half, 5),
    }


# ------------------------------------------------------------------ wave 2
def _run_seq_model(model, data, meta, epochs, extra_hyper):
    """One sequence-family model on the din corpus (attention-necessary
    planted signal; the committed din row pins the corpus ceilings)."""
    _, best = _train(dict({
        "runner.model": model,
        "runner.train_data_dir": f"{data}/train",
        "runner.test_data_dir": f"{data}/test",
        "runner.train_batch_size": 512,
        "runner.infer_batch_size": 512,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "runner.shuffle_files": True,
        "hyper_parameters.item_count": meta["items"],
        "hyper_parameters.cat_count": meta["cats"],
        "hyper_parameters.max_seq_len": meta["max_len"],
        "hyper_parameters.item_emb_size": 16,
        "hyper_parameters.cat_emb_size": 8,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
    }, **{f"hyper_parameters.{k}": v for k, v in extra_hyper.items()}),
        epochs)
    return best.get("auc", 0.0)


def run_bst(root, epochs):
    """Does the transformer form also clear the sum-pool ceiling on the
    attention-necessary corpus?  (reference models/rank/bst/README.md)"""
    data = os.path.join(root, "din")
    meta = json.load(open(f"{data}/meta.json"))
    auc = _run_seq_model("rank.bst", data, meta, epochs, {
        "n_head": 2, "num_blocks": 1, "ffn_dim": 64,
        "fc_sizes": [128, 64]})
    return {
        "model": "rank.bst", "test_auc": round(auc, 5),
        "bayes_auc": meta["bayes_auc"], "sumpool_auc": meta["sumpool_auc"],
        "beats_sumpool_by": round(auc - meta["sumpool_auc"], 5),
        "gap_to_bayes": round(meta["bayes_auc"] - auc, 5),
    }


def run_dien(root, epochs):
    """GRU interest-evolution form on the same corpus
    (reference models/rank/dien/README.md)."""
    data = os.path.join(root, "din")
    meta = json.load(open(f"{data}/meta.json"))
    auc = _run_seq_model("rank.dien", data, meta, epochs, {
        "gru_hidden": 32, "fc_sizes": [128, 64]})
    return {
        "model": "rank.dien", "test_auc": round(auc, 5),
        "bayes_auc": meta["bayes_auc"], "sumpool_auc": meta["sumpool_auc"],
        "beats_sumpool_by": round(auc - meta["sumpool_auc"], 5),
        "gap_to_bayes": round(meta["bayes_auc"] - auc, 5),
    }


def run_ple(root, epochs):
    """PLE on the mmoe corpus: same planted shared nonlinearity, judged
    against the same linear floor / Fisher oracle / matched probe
    (reference models/multitask/ple/README.md)."""
    data = os.path.join(root, "mmoe")
    meta = json.load(open(f"{data}/meta.json"))
    _, best = _train({
        "runner.model": "multitask.ple",
        "runner.train_data_dir": f"{data}/train",
        "runner.test_data_dir": f"{data}/test",
        "runner.train_batch_size": 512,
        "runner.infer_batch_size": 512,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "hyper_parameters.feature_size": meta["feature_size"],
        "hyper_parameters.task_num": 2,
        "hyper_parameters.exp_per_task": 3,
        "hyper_parameters.shared_num": 2,
        "hyper_parameters.expert_size": 32,
        "hyper_parameters.tower_size": 16,
        "hyper_parameters.level_number": 2,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 1e-3,
    }, epochs)
    out = {"model": "multitask.ple"}
    got = {"income": best.get("auc", 0.0),
           "marital": best.get("auc_marital", 0.0)}
    for task in ("income", "marital"):
        out[f"test_auc_{task}"] = round(got[task], 5)
        out[f"bayes_auc_{task}"] = meta[f"bayes_auc_{task}"]
        out[f"linear_auc_{task}"] = meta[f"linear_auc_{task}"]
        out[f"gap_{task}"] = round(meta[f"bayes_auc_{task}"] - got[task], 5)
    return out


def run_aitm(root, epochs):
    """AITM on the esmm corpus (same ali-ccp format + estimation-aware
    oracles; conversion observable only on clicked rows — the transfer
    the AIT module models; reference models/multitask/aitm/README.md)."""
    data = os.path.join(root, "esmm")
    meta = json.load(open(f"{data}/meta.json"))
    _, best = _train({
        "runner.model": "multitask.aitm",
        "runner.train_data_dir": f"{data}/train",
        "runner.test_data_dir": f"{data}/test",
        "runner.train_batch_size": 1024,
        "runner.infer_batch_size": 1024,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "hyper_parameters.sparse_feature_number": meta["vocab"],
        "hyper_parameters.sparse_feature_dim": 12,
        "hyper_parameters.num_field": meta["fields"],
        "hyper_parameters.max_len": 1,
        "hyper_parameters.tower_dims": [128, 64, 32],
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
    }, epochs)
    ctr, ctcvr = best.get("auc", 0.0), best.get("auc_ctcvr", 0.0)
    return {
        "model": "multitask.aitm",
        "test_auc_ctr": round(ctr, 5),
        "test_auc_ctcvr": round(ctcvr, 5),
        "bayes_auc_ctr": meta["bayes_auc_ctr"],
        "bayes_auc_ctcvr": meta["bayes_auc_ctcvr"],
        "oracle_auc_ctr": meta.get("oracle_auc_ctr"),
        "oracle_auc_ctcvr": meta.get("oracle_auc_ctcvr"),
        "gap_ctr_oracle": round(meta["oracle_auc_ctr"] - ctr, 5),
        "gap_ctcvr_oracle": round(meta["oracle_auc_ctcvr"] - ctcvr, 5),
    }


def _trigram_tokens(vec_csv):
    """dssm-corpus dense 0/1 trigram vector -> 1-based token id list."""
    return [i + 1 for i, x in enumerate(vec_csv.split(",")) if x == "1"]


def run_multiview_simnet(root, epochs, max_len=64):
    """multiview_simnet on the match corpus: the trigram SETS are
    re-expressed as token-id bags (its native input), trained with its
    in-batch rotated negatives, then scored on the corpus's explicit
    (pos, neg) pairs under both PNR conventions — comparable to the
    dssm row and the 0.916 topic-oracle bayes
    (reference models/match/multiview-simnet/README.md)."""
    import tempfile

    data = os.path.join(root, "dssm")
    meta = json.load(open(f"{data}/meta.json"))
    tmp = tempfile.mkdtemp(prefix="mvs_")
    os.makedirs(f"{tmp}/train", exist_ok=True)
    with open(f"{data}/train/part-0.txt") as src, \
            open(f"{tmp}/train/part-0.txt", "w") as dst:
        for line in src:
            cols = line.rstrip("\n").split("\t")
            q = " ".join(str(x) for x in _trigram_tokens(cols[0])[:max_len])
            t = " ".join(str(x) for x in _trigram_tokens(cols[1])[:max_len])
            dst.write(f"{q}\t{t}\n")
    t, _ = _train({
        "runner.model": "match.multiview_simnet",
        "runner.train_data_dir": f"{tmp}/train",
        "runner.train_batch_size": 256,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "hyper_parameters.sparse_feature_number": meta["trigram_d"] + 1,
        "hyper_parameters.max_len": max_len,
        "hyper_parameters.embedding_dim": 64,
        "hyper_parameters.hidden_size": 64,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 1e-3,
    }, epochs, eval_each=False)
    # protocol leg: cosine(q, pos) vs cosine(q, neg) on the corpus's
    # explicit test pairs, through tools/cal_pos_neg like the dssm row
    from paddlerec_tpu.tools.cal_pos_neg import cal_pos_neg

    params = jax.device_get(t.state.params)

    def encode_batch(lines_tok):
        n = len(lines_tok)
        ids = np.zeros((n, 1, max_len), np.int32)
        m = np.zeros((n, 1, max_len), np.float32)
        for i, toks in enumerate(lines_tok):
            toks = toks[:max_len]
            ids[i, 0, :len(toks)] = toks
            m[i, 0, :len(toks)] = 1.0
        return ids, m

    score_file = os.path.join(root, "mvs_scores.txt")
    qid = 0
    with open(f"{data}/test/part-0.txt") as f, open(score_file, "w") as out:
        lines = [ln.rstrip("\n").split("\t") for ln in f]
        for lo in range(0, len(lines), 256):
            chunk = lines[lo:lo + 256]
            qi, qm = encode_batch([_trigram_tokens(c[0]) for c in chunk])
            pi, pm = encode_batch([_trigram_tokens(c[1]) for c in chunk])
            ni, nm = encode_batch([_trigram_tokens(c[2]) for c in chunk])
            qv, pv = t.model_def.module.apply({"params": params}, qi, qm, pi, pm)
            _, nv = t.model_def.module.apply({"params": params}, qi, qm, ni, nm)
            qn = qv / np.linalg.norm(qv, axis=1, keepdims=True)
            sp = (qn * (pv / np.linalg.norm(pv, axis=1, keepdims=True))).sum(1)
            sn = (qn * (nv / np.linalg.norm(nv, axis=1, keepdims=True))).sum(1)
            for i in range(len(chunk)):
                out.write(f"q{qid}\t{float(sp[i]):.6f}\t1\n")
                out.write(f"q{qid}\t{float(sn[i]):.6f}\t0\n")
                qid += 1
    pnr = cal_pos_neg(score_file)
    total = max(pnr.get("pair_num", 0), 1)
    ties_half = (pnr.get("pos_num", 0)
                 + 0.5 * pnr.get("equal_num", 0)) / total
    return {
        "model": "match.multiview_simnet",
        "cal_pos_neg_PNR_excl_ties": round(pnr.get("PNR", 0.0), 5),
        "pnr_ties_half": round(ties_half, 5),
        "bayes_pnr": meta["bayes_pnr"],
        "gap_pnr": round(meta["bayes_pnr"] - ties_half, 5),
    }


def run_match_pyramid(root, epochs, max_len=64):
    """match_pyramid on the match corpus: the trigram token bags become
    the left/right id sequences whose dot-product interaction image
    feeds the stacked CNN; trained pointwise ((q,pos)=1 / (q,neg)=0
    rows in its native tab/comma format), then scored on the corpus's
    explicit test pairs under both PNR conventions — the same protocol
    as the dssm and multiview_simnet rows
    (reference models/match/match-pyramid/README.md)."""
    import tempfile

    data = os.path.join(root, "dssm")
    meta = json.load(open(f"{data}/meta.json"))
    tmp = tempfile.mkdtemp(prefix="mp_")
    os.makedirs(f"{tmp}/train", exist_ok=True)
    with open(f"{data}/train/part-0.txt") as src, \
            open(f"{tmp}/train/part-0.txt", "w") as dst:
        for line in src:
            cols = line.rstrip("\n").split("\t")
            q = ",".join(str(x) for x in _trigram_tokens(cols[0])[:max_len])
            p = ",".join(str(x) for x in _trigram_tokens(cols[1])[:max_len])
            n = ",".join(str(x) for x in _trigram_tokens(cols[2])[:max_len])
            dst.write(f"{q}\t{p}\t1\n{q}\t{n}\t0\n")
    t, _ = _train({
        "runner.model": "match.match_pyramid",
        "runner.train_data_dir": f"{tmp}/train",
        "runner.train_batch_size": 256,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "hyper_parameters.vocab_size": meta["trigram_d"] + 1,
        "hyper_parameters.sentence_left_size": max_len,
        "hyper_parameters.sentence_right_size": max_len,
        "hyper_parameters.emb_size": 32,
        "hyper_parameters.kernel_num": 8,
        "hyper_parameters.hidden_size": 32,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 1e-3,
    }, epochs, eval_each=False)
    from paddlerec_tpu.tools.cal_pos_neg import cal_pos_neg

    params = jax.device_get(t.state.params)

    def encode(lines_tok, n_rows):
        ids = np.zeros((n_rows, max_len), np.int32)
        for i, toks in enumerate(lines_tok):
            toks = toks[:max_len]
            ids[i, :len(toks)] = toks
        return ids

    score_file = os.path.join(root, "mp_scores.txt")
    qid = 0
    with open(f"{data}/test/part-0.txt") as f, open(score_file, "w") as out:
        lines = [ln.rstrip("\n").split("\t") for ln in f]
        for lo in range(0, len(lines), 256):
            chunk = lines[lo:lo + 256]
            n = 256  # zero-pad the tail: one compiled shape per leg
            qi = encode([_trigram_tokens(c[0]) for c in chunk], n)
            pi = encode([_trigram_tokens(c[1]) for c in chunk], n)
            ni = encode([_trigram_tokens(c[2]) for c in chunk], n)
            sp = np.asarray(
                t.model_def.module.apply({"params": params}, qi, pi))
            sn = np.asarray(
                t.model_def.module.apply({"params": params}, qi, ni))
            for i in range(len(chunk)):
                out.write(f"q{qid}\t{float(sp[i]):.6f}\t1\n")
                out.write(f"q{qid}\t{float(sn[i]):.6f}\t0\n")
                qid += 1
    pnr = cal_pos_neg(score_file)
    total = max(pnr.get("pair_num", 0), 1)
    ties_half = (pnr.get("pos_num", 0)
                 + 0.5 * pnr.get("equal_num", 0)) / total
    return {
        "model": "match.match_pyramid",
        "cal_pos_neg_PNR_excl_ties": round(pnr.get("PNR", 0.0), 5),
        "pnr_ties_half": round(ties_half, 5),
        "bayes_pnr": meta["bayes_pnr"],
        "gap_pnr": round(meta["bayes_pnr"] - ties_half, 5),
    }


def _mind_ranked_eval(t, data, meta, maxlen):
    """HR@10/NDCG@10 under the ncf ranked protocol: history = the
    user's train positives, candidates scored greedy-multi-interest
    (max over capsules — the serving-side ANN convention)."""
    from paddlerec_tpu.models.recall.mind.model import MINDNet

    train = np.loadtxt(f"{data}/train/part-0.txt", delimiter=",",
                       dtype=np.int64)
    pos = train[train[:, 2] == 1]
    hist_by_user = {}
    for u, it, _ in pos:
        hist_by_user.setdefault(int(u), []).append(int(it))
    rows = np.loadtxt(f"{data}/test/part-0.txt", delimiter=",",
                      dtype=np.int64)
    group = meta["test_negs"] + 1
    n_users = len(rows) // group
    hist = np.zeros((n_users, maxlen), np.int32)
    mask = np.zeros((n_users, maxlen), np.float32)
    cands = np.zeros((n_users, group), np.int32)
    labels = np.zeros((n_users, group), np.int64)
    for g in range(n_users):
        sl = rows[g * group:(g + 1) * group]
        u = int(sl[0, 0])
        h = hist_by_user.get(u, [])[-maxlen:]
        hist[g, :len(h)] = h
        mask[g, :len(h)] = 1.0
        cands[g] = sl[:, 1]
        labels[g] = sl[:, 2]
    params = jax.device_get(t.state.params)
    caps = np.asarray(t.model_def.module.apply(
        {"params": params}, hist, mask, method=MINDNet.user_capsules))
    emb = np.asarray(params["item_emb"]["embedding"])
    cand_vecs = emb[cands]                       # (U, G, E)
    scores = np.einsum("uke,uge->ukg", caps, cand_vecs).max(axis=1)
    hr = ndcg = 0.0
    for g in range(n_users):
        rank = int((scores[g] > scores[g][labels[g] == 1][0]).sum())
        if rank < 10:
            hr += 1
            ndcg += 1.0 / np.log2(rank + 2)
    return hr / n_users, ndcg / n_users


def run_mind(root, epochs, sub="ncf"):
    """MIND under the ncf ranked protocol: capsule routing vs the refit
    oracle on the SAME test groups (reference models/recall/mind/
    README.md).  The corpus's planted preference is single-vector, so
    this measures what multi-interest routing costs/retains when one
    interest suffices — against the same achievable refit bound."""
    import tempfile

    data = os.path.join(root, sub)
    meta = json.load(open(f"{data}/meta.json"))
    maxlen = 20
    # mind-format train file: user,item,timestamp over train POSITIVES
    tmp = tempfile.mkdtemp(prefix="mind_")
    os.makedirs(f"{tmp}/train", exist_ok=True)
    train = np.loadtxt(f"{data}/train/part-0.txt", delimiter=",",
                       dtype=np.int64)
    pos = train[train[:, 2] == 1]
    with open(f"{tmp}/train/part-0.txt", "w") as f:
        seq = {}
        for u, it, _ in pos:
            ts = seq.get(int(u), 0)
            f.write(f"{u},{it},{ts}\n")
            seq[int(u)] = ts + 1
    cfg = Config({
        "runner.model": "recall.mind",
        "runner.train_data_dir": f"{tmp}/train",
        "runner.train_batch_size": 512,
        "runner.epochs": 1,
        "runner.print_interval": 500,
        "hyper_parameters.item_count": meta["num_items"],
        "hyper_parameters.embedding_dim": 16,
        "hyper_parameters.interest_num": 4,
        "hyper_parameters.neg_samples": 64,
        "hyper_parameters.maxlen": maxlen,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
        "hyper_parameters.optimizer.runtime_inject": True,
    })
    t = Trainer(cfg)
    t.init_state()
    lr = 2e-3
    best_hr = best_ndcg = 0.0
    for ep in range(epochs):
        if ep >= epochs // 2:
            lr *= 0.8
            t.set_hyperparams(learning_rate=lr)
        t.config["runner.epochs"] = 1
        t.train()
        if ep % 2 == 1 or ep == epochs - 1:
            hr, ndcg = _mind_ranked_eval(t, data, meta, maxlen)
            print(f"  epoch {ep}: HR@10={hr:.4f} NDCG@10={ndcg:.4f}",
                  flush=True)
            best_hr, best_ndcg = max(best_hr, hr), max(best_ndcg, ndcg)
    return {
        "model": "recall.mind",
        "hr10": round(best_hr, 5), "ndcg10": round(best_ndcg, 5),
        "oracle_hr10": meta["oracle_hr10"],
        "oracle_ndcg10": meta["oracle_ndcg10"],
        "refit_oracle_hr10": meta["refit_oracle_hr10"],
        "refit_oracle_ndcg10": meta["refit_oracle_ndcg10"],
        "gap_hr10_refit": round(meta["refit_oracle_hr10"] - best_hr, 5),
    }


def _convert_din_to_dsin(data, out, sess_count=4, sess_len=10):
    """din corpus → DSIN native text (model.py DSINDataset): sessions are
    consecutive length-10 windows of the history (the corpus has no
    session boundaries; windowing is the sessionization), all cate/brand
    ids shifted +1 because id 0 is DSIN's in-session pad."""
    if os.path.exists(out):
        return
    os.makedirs(f"{out}/train", exist_ok=True)
    os.makedirs(f"{out}/test", exist_ok=True)
    for split in ("train", "test"):
        with open(f"{data}/{split}/part-0.txt") as fin, \
                open(f"{out}/{split}/part-0.txt", "w") as fout:
            for line in fin:
                h, c, tgt, tgt_cat, y = line.rstrip("\n").split(";")
                items = [int(v) + 1 for v in h.split()][: sess_count * sess_len]
                cats = [int(v) + 1 for v in c.split()][: sess_count * sess_len]
                sess = [0] * (2 * sess_count * sess_len)
                for j, (it, ct) in enumerate(zip(items, cats)):
                    s, pos = divmod(j, sess_len)
                    sess[(2 * s) * sess_len + pos] = ct       # cate row
                    sess[(2 * s + 1) * sess_len + pos] = it   # brand row
                n_sess = (len(items) + sess_len - 1) // sess_len
                sparse = [0] * 15
                sparse[13] = int(tgt_cat) + 1   # cate field = target cat
                sparse[14] = int(tgt) + 1       # brand field = target item
                fout.write(
                    f"{y};{','.join(map(str, sparse))};0.0;"
                    f"{','.join(map(str, sess))};{n_sess}\n")


def run_dsin(root, epochs):
    """Sessionized form on the attention-necessary corpus: the in-session
    transformer is target-blind and pools by masked mean, so per-event
    attention degrades to per-SESSION attention — how much of the gap to
    the event-attention probe does that cost?
    (reference models/rank/dsin/README.md)"""
    data = os.path.join(root, "din")
    meta = json.load(open(f"{data}/meta.json"))
    fmt = os.path.join(root, "dsin_fmt")
    _convert_din_to_dsin(data, fmt)
    vocab1 = {f"hyper_parameters.{k}_size": 1 for k in (
        "user", "adgroup", "pid", "cms_segid", "cms_group", "final_gender",
        "age_level", "pvalue_level", "shopping_level", "occupation",
        "new_user_class_level", "campaign", "customer")}
    _, best = _train(dict({
        "runner.model": "rank.dsin",
        "runner.train_data_dir": f"{fmt}/train",
        "runner.test_data_dir": f"{fmt}/test",
        "runner.train_batch_size": 512,
        "runner.infer_batch_size": 512,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "runner.shuffle_files": True,
        "hyper_parameters.cate_size": meta["cats"] + 1,
        "hyper_parameters.brand_size": meta["items"] + 1,
        "hyper_parameters.sess_count": 4,
        "hyper_parameters.sess_max_length": 10,
        "hyper_parameters.feat_embed_size": 8,
        "hyper_parameters.att_embedding_size": 8,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
    }, **vocab1), epochs)
    auc = best.get("auc", 0.0)
    return {
        "model": "rank.dsin", "test_auc": round(auc, 5),
        "bayes_auc": meta["bayes_auc"], "sumpool_auc": meta["sumpool_auc"],
        "beats_sumpool_by": round(auc - meta["sumpool_auc"], 5),
        "gap_to_bayes": round(meta["bayes_auc"] - auc, 5),
    }


def _convert_din_to_dmr(data, out, T=40):
    """din corpus → DMR alimama text (model.py DMRDataset): histories
    right-aligned (DMR reads position T-1 as the most recent event),
    btag=1 for real events, match_mask = history cate equals the target
    cate (the reference's semantics); ids +1, 0 = pad."""
    if os.path.exists(out):
        return
    os.makedirs(f"{out}/train", exist_ok=True)
    os.makedirs(f"{out}/test", exist_ok=True)
    for split in ("train", "test"):
        with open(f"{data}/{split}/part-0.txt") as fin, \
                open(f"{out}/{split}/part-0.txt", "w") as fout:
            for line in fin:
                h, c, tgt, tgt_cat, y = line.rstrip("\n").split(";")
                items = [int(v) + 1 for v in h.split()][-T:]
                cats = [int(v) + 1 for v in c.split()][-T:]
                pad = T - len(items)
                btag = [0] * pad + [1] * len(items)
                cate = [0] * pad + cats
                brand = [0] * pad + items
                mask = [0] * pad + [1] * len(items)
                tcat = int(tgt_cat) + 1
                match = [0] * pad + [int(cc == tcat) for cc in cats]
                scalars = [0] * 17
                scalars[10] = tcat           # cate_id
                scalars[13] = int(tgt) + 1   # brand
                scalars[16] = int(y)         # label
                fout.write(",".join(map(
                    str, btag + cate + brand + mask + match + scalars))
                    + "\n")


def run_dmr(root, epochs):
    """DMR's item-to-item attention is exactly the planted form (target
    query over history events); its user-to-item match head rides the
    same corpus.  (reference models/rank/dmr/README.md)"""
    data = os.path.join(root, "din")
    meta = json.load(open(f"{data}/meta.json"))
    fmt = os.path.join(root, "dmr_fmt")
    _convert_din_to_dmr(data, fmt, T=meta["max_len"])
    vocab1 = {f"hyper_parameters.{k}_size": 1 for k in (
        "user", "cms_segid", "cms_group_id", "final_gender_code",
        "age_level", "pvalue_level", "shopping_level", "occupation",
        "new_user_class_level", "adgroup_id", "campaign_id", "customer")}
    _, best = _train(dict({
        "runner.model": "rank.dmr",
        "runner.train_data_dir": f"{fmt}/train",
        "runner.test_data_dir": f"{fmt}/test",
        "runner.train_batch_size": 512,
        "runner.infer_batch_size": 512,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "runner.shuffle_files": True,
        "hyper_parameters.cate_size": meta["cats"] + 1,
        "hyper_parameters.brand_size": meta["items"] + 1,
        "hyper_parameters.btag_size": 2,
        "hyper_parameters.pid_size": 1,
        "hyper_parameters.history_length": meta["max_len"],
        "hyper_parameters.main_embedding_size": 16,
        "hyper_parameters.other_embedding_size": 8,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 1e-3,
    }, **vocab1), epochs)
    auc = best.get("auc", 0.0)
    return {
        "model": "rank.dmr", "test_auc": round(auc, 5),
        "bayes_auc": meta["bayes_auc"], "sumpool_auc": meta["sumpool_auc"],
        "beats_sumpool_by": round(auc - meta["sumpool_auc"], 5),
        "gap_to_bayes": round(meta["bayes_auc"] - auc, 5),
    }


def run_tagspace(root, epochs):
    """Margin-ranking tag match on the order-signal text corpus: does the
    windowed conv + max-pool text encoder beat the bag-of-words ceiling?
    Scored offline per text — sim(text, true_tag) vs sim(text, other_tag)
    through tools/cal_pos_neg — the exact PNR the corpus ceilings are
    stated in (the in-train streaming metric pools pos/neg rows globally
    and its sampled negative can collide with the positive, so it is not
    the protocol number).
    (reference models/contentunderstanding/tagspace/README.md)"""
    data = os.path.join(root, "textcls")
    meta = json.load(open(f"{data}/meta.json"))
    t, best = _train({
        "runner.model": "contentunderstanding.tagspace",
        "runner.train_data_dir": f"{data}/tagspace/train",
        "runner.test_data_dir": f"{data}/tagspace/test",
        "runner.train_batch_size": 512,
        "runner.infer_batch_size": 512,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "runner.shuffle_files": True,
        "hyper_parameters.vocab_text_size": meta["vocab"],
        "hyper_parameters.vocab_tag_size": 2,
        "hyper_parameters.neg_size": 1,
        "hyper_parameters.max_len": meta["max_len"],
        "hyper_parameters.emb_dim": 32,
        "hyper_parameters.hid_dim": 128,
        "hyper_parameters.win_size": 5,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
    }, epochs)
    from paddlerec_tpu.tools.cal_pos_neg import cal_pos_neg

    params = jax.device_get(t.state.params)
    max_len = meta["max_len"]
    score_file = os.path.join(root, "tagspace_scores.txt")
    qid = 0
    with open(f"{data}/tagspace/test/part-0.txt") as f, \
            open(score_file, "w") as out:
        rows = []
        for line in f:
            toks_s, tag_s = line.strip().split("\t")
            rows.append(([int(x) for x in toks_s.split()][:max_len],
                         int(tag_s.split()[0])))
        for lo in range(0, len(rows), 512):
            chunk = rows[lo:lo + 512]
            n = 512  # static shape: zero-pad the tail chunk
            toks = np.zeros((n, max_len), np.int32)
            m = np.zeros((n, max_len), np.float32)
            pos = np.zeros((n,), np.int32)
            neg = np.zeros((n, 1), np.int32)
            for i, (tk, tg) in enumerate(chunk):
                toks[i, :len(tk)] = tk
                m[i, :len(tk)] = 1.0
                pos[i] = tg
                neg[i, 0] = 1 - tg
            sp, sn = t.model_def.module.apply(
                {"params": params}, toks, m, pos, neg)
            sp, sn = np.asarray(sp), np.asarray(sn)[:, 0]
            for i in range(len(chunk)):
                out.write(f"q{qid}\t{float(sp[i]):.6f}\t1\n")
                out.write(f"q{qid}\t{float(sn[i]):.6f}\t0\n")
                qid += 1
    res = cal_pos_neg(score_file)
    total = max(res.get("pair_num", 0), 1)
    pnr = (res.get("pos_num", 0) + 0.5 * res.get("equal_num", 0)) / total
    return {
        "model": "contentunderstanding.tagspace", "test_pnr": round(pnr, 5),
        "pnr_excl_ties": round(res.get("PNR", 0.0), 5),
        "stream_auc": round(best.get("auc", 0.0), 5),
        "bayes_pnr": meta["bayes_pnr"],
        "unigram_nb_pnr": meta["unigram_nb_pnr"],
        "beats_unigram_by": round(pnr - meta["unigram_nb_pnr"], 5),
        "gap_to_bayes": round(meta["bayes_pnr"] - pnr, 5),
    }


def run_textcnn(root, epochs):
    """Multi-window TextCNN on the same corpus: filter sizes (1,2,3) can
    see the ±1 collocation direction the unigram oracle cannot.
    (reference models/contentunderstanding/textcnn/README.md)"""
    data = os.path.join(root, "textcls")
    meta = json.load(open(f"{data}/meta.json"))
    _, best = _train({
        "runner.model": "contentunderstanding.textcnn",
        "runner.train_data_dir": f"{data}/textcnn/train",
        "runner.test_data_dir": f"{data}/textcnn/test",
        "runner.train_batch_size": 512,
        "runner.infer_batch_size": 512,
        "runner.epochs": 1,
        "runner.print_interval": 200,
        "runner.shuffle_files": True,
        "hyper_parameters.dict_dim": meta["vocab"],
        "hyper_parameters.max_len": meta["max_len"],
        "hyper_parameters.emb_dim": 64,
        "hyper_parameters.cnn_dim": 64,
        "hyper_parameters.hid_dim": 64,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
    }, epochs)
    auc = best.get("auc", 0.0)
    return {
        "model": "contentunderstanding.textcnn", "test_auc": round(auc, 5),
        "bayes_auc": meta["bayes_auc"],
        "unigram_nb_auc": meta["unigram_nb_auc"],
        "beats_unigram_by": round(auc - meta["unigram_nb_auc"], 5),
        "gap_to_bayes": round(meta["bayes_auc"] - auc, 5),
    }


def _tdm_parse_test(test_file):
    hists, tgts = [], []
    with open(test_file) as f:
        for line in f:
            left, _, right = line.partition("|")
            hists.append([int(x) for x in left.split()])
            tgts.append(int(right.split()[0]))
    return np.asarray(hists, np.int64), np.asarray(tgts)


def _tdm_hr(md, params, hists, tgts, topk=10, beam=40, chunk=250):
    """Beam-search retrieval HR@topk over the test users."""
    import jax.numpy as jnp
    item_to_code = {int(i): int(c)
                    for i, c in zip(md.tree.item_ids, md.tree.codes)}
    hit = 0
    for c0 in range(0, len(hists), chunk):
        h = hists[c0:c0 + chunk]
        codes = np.vectorize(item_to_code.get)(h)
        got = md.retrieve(params, jnp.asarray(codes),
                          jnp.ones(h.shape, np.float32), topk=topk,
                          beam=beam)
        hit += sum(int(t in row)
                   for t, row in zip(tgts[c0:c0 + chunk], got))
    return hit / len(hists)


def _tdm_exhaustive_hr(md, params, hists, tgts, topk=10, chunk=250):
    """Score EVERY leaf with the same trained net (no tree, no beam):
    the model-quality ceiling that isolates beam/tree retrieval loss."""
    import jax
    import jax.numpy as jnp
    item_to_code = {int(i): int(c)
                    for i, c in zip(md.tree.item_ids, md.tree.codes)}
    leaf_codes = jnp.asarray(md.tree.codes)
    leaf_items = np.asarray(md.tree.item_ids)

    @jax.jit
    def score_all(p, h, m):
        logits = md.module.apply(
            {"params": p}, h, m,
            jnp.tile(leaf_codes[None], (h.shape[0], 1)))
        return jax.nn.softmax(logits, -1)[..., 1]

    hit = 0
    for c0 in range(0, len(hists), chunk):
        h = hists[c0:c0 + chunk]
        codes = jnp.asarray(np.vectorize(item_to_code.get)(h))
        probs = np.asarray(score_all(
            params, codes, jnp.ones(h.shape, np.float32)))
        top = leaf_items[np.argsort(-probs, 1)[:, :topk]]
        hit += int((top == tgts[c0:c0 + chunk, None]).any(1).sum())
    return hit / len(hists)


def run_tdm(root, epochs):
    """Tree-based retrieval certification (reference models/treebased/
    {tdm,jtm}): train TDM over a signal-blind random-category tree,
    measure beam HR@10 vs the same net scoring every leaf exhaustively
    (tree/beam loss) and vs the corpus oracles (model loss); then run the
    JTM alternation and measure how much tree re-learning recovers."""
    import jax
    from paddlerec_tpu.models.treebased.jtm import jtm_train
    from paddlerec_tpu.models.treebased.tree import TreeIndex

    data = os.path.join(root, "tdm")
    meta = json.load(open(f"{data}/meta.json"))
    items = meta["items"]
    rng = np.random.RandomState(5)
    init_tree = TreeIndex.build_by_category(
        np.arange(items, dtype=np.int64), rng.randint(0, 64, items))
    tree_path = os.path.join(root, "tdm_tree_init")
    init_tree.save(tree_path)
    hists, tgts = _tdm_parse_test(f"{data}/test/part-0.txt")

    H = meta["hist_len"]  # fea_groups must tile the corpus history
    fg = f"{H // 3},{H // 3},{H - 2 * (H // 3)}"
    cfg = {
        "runner.model": "treebased.tdm",
        "runner.train_data_dir": f"{data}/train",
        "runner.train_batch_size": 256,
        "runner.epochs": 1,
        "runner.print_interval": 500,
        "runner.shuffle_files": True,
        "hyper_parameters.tree_path": tree_path,
        "hyper_parameters.total_nodes": init_tree.total_nodes,
        "hyper_parameters.fea_groups": fg,
        "hyper_parameters.node_emb_size": 24,
        "hyper_parameters.neg_sampling_list": 4,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
    }
    t, _ = _train(cfg, epochs, eval_each=False)
    params = jax.device_get(t.state.params)
    tdm_hr = _tdm_hr(t.model_def, params, hists, tgts)
    tdm_ex = _tdm_exhaustive_hr(t.model_def, params, hists, tgts)
    print(f"  tdm: beam HR@10 {tdm_hr:.4f}, exhaustive {tdm_ex:.4f}",
          flush=True)

    # JTM alternation: train → re-learn tree → … → final fit under the
    # last tree (retrieval must score codes the params were trained on)
    jcfg = Config(dict(cfg, **{
        "runner.epochs": max(epochs // 2, 1),
        "runner.jtm_rounds": 2,
        "hyper_parameters.jtm_gap": 7,
        "hyper_parameters.jtm_sample_nums": 4,
    }))
    _, _, jt = jtm_train(jcfg, return_trainer=True)
    jt.train()
    jparams = jax.device_get(jt.state.params)
    jtm_hr = _tdm_hr(jt.model_def, jparams, hists, tgts)
    jtm_ex = _tdm_exhaustive_hr(jt.model_def, jparams, hists, tgts)
    print(f"  jtm: beam HR@10 {jtm_hr:.4f}, exhaustive {jtm_ex:.4f}",
          flush=True)
    return {
        "model": "treebased.tdm+jtm",
        "tdm_hr10": round(tdm_hr, 5),
        "tdm_exhaustive_hr10": round(tdm_ex, 5),
        "jtm_hr10": round(jtm_hr, 5),
        "jtm_exhaustive_hr10": round(jtm_ex, 5),
        "mle_oracle_hr10": meta["mle_oracle_hr10"],
        "true_oracle_hr10": meta["oracle_hr10"],
        "beam_loss_tdm": round(tdm_ex - tdm_hr, 5),
        "jtm_gain": round(jtm_hr - tdm_hr, 5),
    }


def run_ncf_multi(root, epochs):
    """Single-vector ncf on the MULTI-interest corpus: structurally
    capped by the single-vector refit bar (gen_ncf_multi)."""
    res = run_ncf(root, epochs, sub="ncf_multi")
    meta = json.load(open(os.path.join(root, "ncf_multi", "meta.json")))
    res["model"] = "recall.ncf (multi-interest corpus)"
    res["single_vec_refit_hr10"] = meta["single_vec_refit_hr10"]
    res["single_vec_refit_ndcg10"] = meta["single_vec_refit_ndcg10"]
    return res


def run_mind_multi(root, epochs):
    """MIND on the multi-interest corpus: capsule routing must BEAT the
    single-vector refit bar to certify multi-interest extraction."""
    res = run_mind(root, epochs, sub="ncf_multi")
    meta = json.load(open(os.path.join(root, "ncf_multi", "meta.json")))
    res["model"] = "recall.mind (multi-interest corpus)"
    res["single_vec_refit_hr10"] = meta["single_vec_refit_hr10"]
    res["single_vec_refit_ndcg10"] = meta["single_vec_refit_ndcg10"]
    res["beats_single_vec_by"] = round(
        res["hr10"] - meta["single_vec_refit_hr10"], 5)
    return res


RUNNERS = {"din": run_din, "mmoe": run_mmoe, "esmm": run_esmm,
           "ncf": run_ncf, "dssm": run_dssm,
           "bst": run_bst, "dien": run_dien, "ple": run_ple,
           "aitm": run_aitm, "multiview_simnet": run_multiview_simnet,
           "mind": run_mind, "dsin": run_dsin, "dmr": run_dmr,
           "tagspace": run_tagspace, "textcnn": run_textcnn,
           "tdm": run_tdm, "match_pyramid": run_match_pyramid,
           "ncf_multi": run_ncf_multi, "mind_multi": run_mind_multi}


def main():
    root = sys.argv[1]
    fams = sys.argv[2:] or list(RUNNERS)
    summary = []
    for fam in fams:
        print(f"FAMILY_START {fam}", flush=True)
        res = RUNNERS[fam](root, EPOCHS[fam])
        summary.append(res)
        print("FAMILY_RESULT " + json.dumps(res), flush=True)
    print("FAMILIES_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
