"""Aux tools: profiler options, cal_pos_neg, onoff_diff, benchmark, k8s,
external sources."""

import json

import numpy as np
import pytest


def test_profiler_options_parsing():
    from paddlerec_tpu.utils.profiler import ProfilerOptions

    opts = ProfilerOptions(
        "batch_range=[5, 9]; profile_path=/tmp/x; exit_on_finished=false"
    )
    assert opts["batch_range"] == [5, 9]
    assert opts["profile_path"] == "/tmp/x"
    assert opts["exit_on_finished"] is False
    # invalid range keeps the default
    opts2 = ProfilerOptions("batch_range=[9,5]")
    assert opts2["batch_range"] == [10, 20]


def test_profiler_traces_range(tmp_path):
    import jax

    from paddlerec_tpu.utils import profiler

    profiler.reset()
    opts = f"batch_range=[1,3];profile_path={tmp_path};exit_on_finished=false"
    for _ in range(5):
        profiler.add_profiler_step(opts)
        jax.block_until_ready(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
    profiler.reset()
    # a trace directory must have been produced
    produced = list(tmp_path.rglob("*.xplane.pb")) + list(
        tmp_path.rglob("*.trace.json.gz")
    )
    assert produced, f"no trace written under {tmp_path}"


def test_cal_pos_neg(tmp_path):
    from paddlerec_tpu.tools.cal_pos_neg import cal_pos_neg

    p = tmp_path / "scores.txt"
    with open(p, "w") as f:
        # query 0: ordered correctly; query 1: one inversion + one tie
        f.write("0\t2.0\t1\n0\t1.0\t0\n")
        f.write("1\t1.0\t1\n1\t3.0\t0\n1\t1.0\t0\n")
    res = cal_pos_neg(str(p))
    assert res["pos_num"] == 1
    assert res["neg_num"] == 1
    assert res["equal_num"] == 1
    assert res["query_num"] == 2
    assert res["PNR"] == 0.5


def test_onoff_diff(tmp_path):
    from paddlerec_tpu.utils.onoff_diff import diff_report

    online = tmp_path / "online.jsonl"
    offline = tmp_path / "offline.jsonl"
    recs = [
        {"ins_id": "a", "vars": {"ctr": [0.5, 0.1]}},
        {"ins_id": "b", "vars": {"ctr": [0.9, 0.2]}},
    ]
    with open(online, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    recs[1]["vars"]["ctr"] = [0.9, 0.7]  # drift on instance b
    with open(offline, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    rep = diff_report(str(online), str(offline), threshold=1e-5)
    assert rep["num_shared"] == 2
    assert not rep["consistent"]
    assert "b" in rep["bad_instances"]
    assert abs(rep["per_var"]["ctr"]["max_diff"] - 0.5) < 1e-9
    # identical dumps are consistent
    rep2 = diff_report(str(offline), str(offline))
    assert rep2["consistent"]


def test_infer_benchmark():
    import jax.numpy as jnp

    from paddlerec_tpu.utils.benchmark import InferBenchmark

    bench = InferBenchmark(model_info={"model_name": "deepfm"},
                           data_info={"batch_size": 4})
    batches = [jnp.ones((4, 8)) for _ in range(6)]
    bench.time_fn(lambda b: (b * 2).sum(), batches)
    rep = bench.report("test")
    assert rep["perf"]["count"] == 6
    assert rep["perf"]["p50_ms"] <= rep["perf"]["p99_ms"]
    assert rep["env"]["backend"] == "cpu"


def test_k8s_env_fallback(monkeypatch):
    from paddlerec_tpu.utils import k8s

    monkeypatch.setenv("PADDLEREC_POD_IPS", "10.0.0.3,10.0.0.1,10.0.0.2")
    monkeypatch.setenv("POD_IP", "10.0.0.2")
    monkeypatch.delenv("PADDLE_TRAINER_ID", raising=False)
    monkeypatch.delenv("RANK", raising=False)
    assert k8s.pod_ips() == ["10.0.0.1", "10.0.0.2", "10.0.0.3"]
    assert k8s.my_rank() == 1
    monkeypatch.setenv("PADDLE_TRAINER_ID", "7")
    assert k8s.my_rank() == 7


def test_tfrecord_roundtrip(tmp_path):
    from paddlerec_tpu.data.external import TFRecordSource, write_tfrecord

    recs = [b"hello", b"", b"x" * 1000]
    path = tmp_path / "data.tfrecord"
    write_tfrecord(str(path), recs)
    assert list(TFRecordSource([str(path)])) == recs


def test_file_line_source(tmp_path):
    from paddlerec_tpu.data.external import FileLineSource

    p = tmp_path / "a.txt"
    p.write_text("one\ntwo\n")
    assert list(FileLineSource([str(p)])) == ["one", "two"]


def test_kafka_gated():
    from paddlerec_tpu.data.external import KafkaLineSource

    with pytest.raises(RuntimeError, match="confluent_kafka"):
        KafkaLineSource("localhost:9092", "g", ["t"])
