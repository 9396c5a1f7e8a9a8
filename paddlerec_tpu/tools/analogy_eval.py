"""Word-analogy evaluation for recall.word2vec — the reference's analogy
infer protocol (models/recall/word2vec/net.py:100-110 Word2VecInferLayer
+ infer.py): for each question (a, b, c, d), target = emb_b - emb_a +
emb_c, rank ALL words by cosine against the target, take the best
candidate excluding the three question words, and count accuracy of
pred == d.  (The reference fetches top-4 for exactly this exclusion.)

usage:
  python -m paddlerec_tpu.tools.analogy_eval -m config.yaml \
      -o runner.analogy_file=questions.txt runner.infer_load_path=output

The question file holds one ``a b c d`` per line — token ids, or words
when runner.word_id_dict_path maps ``word id`` per line.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from paddlerec_tpu.core.config import (
    load_config, parse_overrides, resolve_path,
)


def load_questions(path: str, word_to_id=None) -> np.ndarray:
    rows = []
    with open(path) as f:
        for line in f:
            toks = line.split()
            if len(toks) != 4 or toks[0].startswith(":"):
                continue  # section headers in the classic eval files
            if word_to_id is not None:
                if any(t not in word_to_id for t in toks):
                    continue
                rows.append([word_to_id[t] for t in toks])
            else:
                rows.append([int(t) for t in toks])
    return np.asarray(rows, np.int64)


def analogy_accuracy(emb: np.ndarray, questions: np.ndarray,
                     batch: int = 1024) -> float:
    """Top-1 accuracy with a/b/c excluded (cosine over the full vocab)."""
    normed = emb / np.maximum(
        np.linalg.norm(emb, axis=1, keepdims=True), 1e-12
    )
    correct = 0
    for lo in range(0, len(questions), batch):
        q = questions[lo:lo + batch]
        a, b, c, d = (q[:, i] for i in range(4))
        target = emb[b] - emb[a] + emb[c]
        dist = target @ normed.T  # (B, V)
        rows = np.arange(len(q))
        for ex in (a, b, c):
            dist[rows, ex] = -np.inf
        correct += int((dist.argmax(axis=1) == d).sum())
    return correct / max(len(questions), 1)


def main(argv=None):
    ap = argparse.ArgumentParser(description="word2vec analogy eval")
    ap.add_argument("-m", "--config_yaml", required=True)
    ap.add_argument("-o", "--opt", nargs="*", default=None)
    args = ap.parse_args(argv)
    config = load_config(args.config_yaml, parse_overrides(args.opt))

    from paddlerec_tpu.core.registry import load_model_def
    from paddlerec_tpu.train import checkpoint as ckpt_lib

    model_def = load_model_def(config)
    root = resolve_path(config, "runner.infer_load_path", "output")
    tag = config.runner("infer_epoch")
    if tag is None:
        tag = ckpt_lib.last_saved_tag(root)
    params, _, _ = ckpt_lib.load_model(root, tag)
    emb = model_def.embedding_table(params)

    word_to_id = None
    dict_path = resolve_path(config, "runner.word_id_dict_path")
    if dict_path:
        word_to_id = {}
        with open(dict_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    word_to_id[parts[0]] = int(parts[1])
    qfile = resolve_path(config, "runner.analogy_file")
    if not qfile:
        raise SystemExit("runner.analogy_file is required")
    questions = load_questions(qfile, word_to_id)
    acc = analogy_accuracy(emb, questions)
    out = {"analogy_acc": round(acc, 5), "questions": int(len(questions)),
           "checkpoint": f"{root}/{tag}"}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
