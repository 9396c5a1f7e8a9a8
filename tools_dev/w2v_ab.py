"""Uniform-vs-frequency negative sampling A/B on the planted analogy
corpus (VERDICT r3 item 5 done-criterion).

usage: python tools_dev/w2v_ab.py <corpus_dir> [epochs] [dim]
Prints one W2V_AB json line with analogy accuracy per sampling mode and
the corpus ceiling.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run(data: str, mode: str, epochs: int, dim: int, questions) -> float:
    import jax

    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.tools.analogy_eval import analogy_accuracy
    from paddlerec_tpu.train.trainer import Trainer

    meta = json.load(open(os.path.join(data, "meta.json")))
    cfg = Config({
        "runner.model": "recall.word2vec",
        "runner.train_data_dir": os.path.join(data, "train"),
        "runner.train_batch_size": 4096,
        "runner.epochs": epochs,
        "runner.print_interval": 500,
        "runner.word_count_dict_path": os.path.join(data, "word_count.txt"),
        "hyper_parameters.sparse_feature_number": meta["vocab"],
        "hyper_parameters.sparse_feature_dim": dim,
        "hyper_parameters.neg_num": 5,
        "hyper_parameters.window_size": 5,
        "hyper_parameters.neg_sampling": mode,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 2e-3,
    })
    t = Trainer(cfg)
    best = 0.0
    t.init_state()
    for _ in range(epochs):
        t.config["runner.epochs"] = 1
        t.train()
        emb = t.model_def.embedding_table(jax.device_get(t.state.params))
        acc = analogy_accuracy(np.asarray(emb), questions)
        print(f"[{mode}] analogy_acc={acc:.4f}", flush=True)
        best = max(best, acc)
    return best


def main():
    data = sys.argv[1]
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from paddlerec_tpu.tools.analogy_eval import load_questions

    meta = json.load(open(os.path.join(data, "meta.json")))
    questions = load_questions(os.path.join(data, "questions.txt"))
    out = {"ceiling_acc": meta["ceiling_acc"], "epochs": epochs, "dim": dim}
    for mode in ("frequency", "uniform"):
        out[f"acc_{mode}"] = round(run(data, mode, epochs, dim, questions), 5)
    print("W2V_AB " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
