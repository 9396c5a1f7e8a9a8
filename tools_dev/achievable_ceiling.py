"""Achievable-AUC ceiling for the synthetic corpus: the Bayes scorer
restricted to ids OBSERVED in training (unseen-tail effects zeroed).
No learner can use information about ids it never saw, so this bounds
what any 1-epoch model could reach, far below the oracle Bayes AUC."""
import glob, json, sys
import numpy as np

sys.path.insert(0, "/root/repo")
from paddlerec_tpu.data.binary import SlotBinFile
from paddlerec_tpu.core.metrics import auc_from_buckets

data = sys.argv[1] if len(sys.argv) > 1 else "/root/criteo_scale"
S, V = 26, 1_000_001
seed = 2023
rng = np.random.RandomState(seed)
w = (rng.randn(S, V) * 0.25).astype(np.float32)
pair_slots = [(0,1),(2,3),(4,5),(6,7),(8,9),(10,11)]
lat = (rng.randn(V, 4) * 0.35).astype(np.float32)
beta = (rng.randn(13) * 0.3).astype(np.float32)
bias = -1.1

counts = np.zeros((S, V), np.int32)
for p in sorted(glob.glob(f"{data}/train/*.bin")):
    f = SlotBinFile(p)
    ids = np.asarray(f.sparse)[:, :, 0]
    for s in range(S):
        np.add.at(counts[s], ids[:, s], 1)
print("train counts done", flush=True)
for min_count in (1, 10):
    seen = counts >= min_count
    w_m = np.where(seen, w, 0.0)
    # latents masked if unseen in EITHER pairing slot use
    seen_any = seen.any(0)
    lat_m = np.where(seen_any[:, None], lat, 0.0)
    buckets = 1 << 12
    pos = np.zeros(buckets); neg = np.zeros(buckets)
    for p in sorted(glob.glob(f"{data}/test/*.bin")):
        f = SlotBinFile(p)
        ids = np.asarray(f.sparse)[:, :, 0]
        dense = np.asarray(f.dense)
        y = np.asarray(f.labels)
        s_ = w_m[np.arange(S)[None, :], ids].sum(1)
        for a, b in pair_slots:
            s_ += (lat_m[ids[:, a]] * lat_m[ids[:, b]]).sum(1)
        s_ += dense @ beta + bias
        prob = 1/(1+np.exp(-s_))
        b_ = np.clip((prob*buckets).astype(np.int64), 0, buckets-1)
        pos += np.bincount(b_, weights=y, minlength=buckets)
        neg += np.bincount(b_, weights=1-y, minlength=buckets)
    print(json.dumps({"min_count": min_count,
                      "achievable_auc": round(float(auc_from_buckets(pos, neg)), 5)}),
          flush=True)
