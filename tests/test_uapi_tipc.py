"""UAPI RankModel facade + TIPC harness."""

import os

import numpy as np
import pytest

from paddlerec_tpu.uapi import RankModel, UnsupportedAPIError


@pytest.fixture
def criteo_dir(tmp_path):
    from paddlerec_tpu.data.synthetic import write_criteo_sample

    out = tmp_path / "train"
    write_criteo_sample(str(out), num_lines=64, num_files=1, vocab=5000)
    return str(out)


SMALL = {
    "hyper_parameters.sparse_inputs_slots": 27,
    "hyper_parameters.dense_input_dim": 13,
    "hyper_parameters.sparse_feature_number": 5000,
    "hyper_parameters.sparse_feature_dim": 8,
    "hyper_parameters.fc_sizes": [32, 16],
    "runner.train_batch_size": 16,
    "runner.infer_batch_size": 16,
    "runner.epochs": 1,
}


def test_uapi_train_evaluate_export_infer(tmp_path, criteo_dir):
    model = RankModel("dnn", config=dict(SMALL))
    metrics = model.train(dataset=criteo_dir,
                          save_dir=str(tmp_path / "ckpt"))
    assert "auc" in metrics
    ev = model.evaluate(dataset=criteo_dir,
                        weight_path=str(tmp_path / "ckpt" / "0"))
    assert 0.0 <= ev["auc"] <= 1.0
    export_dir = str(tmp_path / "export")
    model.export(str(tmp_path / "ckpt" / "0"), export_dir)
    assert os.path.exists(os.path.join(export_dir, "config.json"))
    out = model.infer(export_dir, criteo_dir, str(tmp_path / "infer"))
    preds = [float(x) for x in open(out)]
    assert len(preds) == 64
    assert all(0.0 <= p <= 1.0 for p in preds)


def test_uapi_unknown_model():
    with pytest.raises(ValueError, match="unknown model"):
        RankModel("not_a_model")


def test_uapi_precheck():
    model = RankModel("dnn", config=dict(SMALL))
    with pytest.raises(UnsupportedAPIError, match="train_data_dir"):
        model.train()


def test_uapi_compression_quantizes_and_predicts(tmp_path, criteo_dir):
    """compression(): int8 table quantization of the exported artifact;
    the compressed artifact predicts with near-identical scores
    (reference uapi ships PaddleSlim auto-compression)."""
    import json
    import os

    import numpy as np

    model = RankModel("dnn", config=dict(
        SMALL, **{"runner.train_data_dir": str(criteo_dir),
                  "hyper_parameters.sparse_feature_number": 5000}
    ))
    save = tmp_path / "trained"
    model.train(save_dir=str(save))
    comp = model.compression(str(save / "0"), str(tmp_path / "small"))
    assert os.path.exists(os.path.join(comp, "quantized.npz"))

    # uncompressed vs compressed artifact predictions agree closely
    exp = tmp_path / "plain"
    model.export(str(save / "0"), str(exp))
    out_a = model.infer(str(exp), str(criteo_dir),
                        str(tmp_path / "ia"), batch_size=16)
    out_b = model.infer(str(comp), str(criteo_dir),
                        str(tmp_path / "ib"), batch_size=16)
    def preds(path):
        out = []
        for l in open(path):
            rec = json.loads(l)
            out.append(rec["prediction"] if isinstance(rec, dict) else rec)
        return out

    pa, pb = preds(out_a), preds(out_b)
    np.testing.assert_allclose(pa, pb, atol=0.02)


def test_tipc_parse_and_run(tmp_path, criteo_dir):
    from paddlerec_tpu.tools.tipc import parse_config_txt, run_mode

    cfg_txt = tmp_path / "train_infer_python.txt"
    cfg_txt.write_text(
        "model_name:dnn\n"
        "runner.model:rank.dnn\n"
        f"runner.train_data_dir:{criteo_dir}\n"
        f"runner.test_data_dir:{criteo_dir}\n"
        "runner.epochs:lite_train_lite_infer=1|whole_train_whole_infer=4\n"
        "runner.train_batch_size:16\n"
        "runner.infer_batch_size:16\n"
        "hyper_parameters.sparse_inputs_slots:27\n"
        "hyper_parameters.dense_input_dim:13\n"
        "hyper_parameters.sparse_feature_number:5000\n"
        "hyper_parameters.sparse_feature_dim:8\n"
        "hyper_parameters.fc_sizes:[32,16]\n"
        "skip_me:null\n"
    )
    spec = parse_config_txt(str(cfg_txt), "lite_train_lite_infer")
    assert spec["runner.epochs"] == "1"
    assert "skip_me" not in spec
    spec_whole = parse_config_txt(str(cfg_txt), "whole_train_whole_infer")
    assert spec_whole["runner.epochs"] == "4"

    ok = run_mode(str(cfg_txt), "lite_train_lite_infer",
                  output_dir=str(tmp_path / "out"))
    assert ok
    log = (
        tmp_path / "out" / "results_python_lite_train_lite_infer.log"
    ).read_text()
    assert log.count("Run successfully") == 3


def test_tipc_benchmark_train_mode(tmp_path):
    """benchmark_train: the perf-CI matrix mode (reference
    test_tipc/benchmark_train.sh) — records ips per batch/device cell
    and diffs round-over-round."""
    import json
    import os

    from paddlerec_tpu.tools.tipc import run_benchmark

    cfg = tmp_path / "bench.txt"
    data = tmp_path / "data"
    from paddlerec_tpu.data.synthetic import write_criteo_sample

    write_criteo_sample(str(data), num_lines=256, num_files=1, vocab=1000)
    cfg.write_text(
        "model_name:dnn\n"
        "runner.model:rank.dnn\n"
        f"runner.train_data_dir:{data}\n"
        "hyper_parameters.sparse_inputs_slots:27\n"
        "hyper_parameters.dense_input_dim:13\n"
        "hyper_parameters.sparse_feature_number:1000\n"
        "hyper_parameters.sparse_feature_dim:8\n"
        "hyper_parameters.fc_sizes:[16]\n"
        "benchmark.batch_sizes:32|64\n"
        "benchmark.device_nums:1|2\n"
        "benchmark.steps:4\n"
    )
    out = tmp_path / "out"
    # functional check, not a baseline: allow virtual devices to exceed
    # physical cores (run_benchmark skips such cells for real baselines)
    os.environ["TIPC_OVERSUBSCRIBE_OK"] = "1"
    os.environ["TIPC_ASSUME_CORES"] = "8"  # gate must arm on 1-core CI
    try:
        assert run_benchmark(str(cfg), str(out), record_dir=str(out))
    finally:
        os.environ.pop("TIPC_OVERSUBSCRIBE_OK", None)
        os.environ.pop("TIPC_ASSUME_CORES", None)
    # record name carries the backend tag (.cpu.json on a cpu backend)
    rec_path = next(out.glob("benchmark_train_dnn*.json"))
    rec = json.load(open(rec_path))
    cells = {(r["batch"], r["devices"]) for r in rec["results"]}
    assert (32, 1) in cells and (64, 2) in cells, cells
    assert all(r["ips"] > 0 for r in rec["results"])
    # The regression gate must be exercised deterministically: live
    # re-timings on a loaded CI host are noise, so rewrite the committed
    # record instead.  A floor record can never trip the >20% gate; an
    # inflated record must always trip it.
    floor = dict(rec)
    floor["results"] = [dict(r, ips=r["ips"] * 0.01) for r in rec["results"]]
    rec_path.write_text(json.dumps(floor))
    os.environ["TIPC_OVERSUBSCRIBE_OK"] = "1"
    os.environ["TIPC_ASSUME_CORES"] = "8"  # gate must arm on 1-core CI
    try:
        assert run_benchmark(str(cfg), str(out), record_dir=str(out))
        inflated = dict(rec)
        inflated["results"] = [
            dict(r, ips=r["ips"] * 100.0) for r in rec["results"]
        ]
        rec_path.write_text(json.dumps(inflated))
        assert not run_benchmark(str(cfg), str(out), record_dir=str(out))
    finally:
        os.environ.pop("TIPC_OVERSUBSCRIBE_OK", None)
        os.environ.pop("TIPC_ASSUME_CORES", None)


def test_benchmark_regression_keeps_baseline(tmp_path):
    """A regressed run must NOT overwrite the tracked baseline record
    (otherwise the >20% gate ratchets down and fires exactly once); the
    run artifact with the findings lands in output_dir instead."""
    import json
    import os

    from paddlerec_tpu.tools.tipc import run_benchmark

    cfg = tmp_path / "bench.txt"
    data = tmp_path / "data"
    from paddlerec_tpu.data.synthetic import write_criteo_sample

    write_criteo_sample(str(data), num_lines=128, num_files=1, vocab=1000)
    cfg.write_text(
        "model_name:dnn\n"
        "runner.model:rank.dnn\n"
        f"runner.train_data_dir:{data}\n"
        "hyper_parameters.sparse_inputs_slots:27\n"
        "hyper_parameters.dense_input_dim:13\n"
        "hyper_parameters.sparse_feature_number:1000\n"
        "hyper_parameters.sparse_feature_dim:8\n"
        "hyper_parameters.fc_sizes:[16]\n"
        "benchmark.batch_sizes:32\n"
        "benchmark.device_nums:1\n"
        "benchmark.steps:4\n"
    )
    out = tmp_path / "out"
    records = tmp_path / "records"
    os.makedirs(records, exist_ok=True)
    os.environ["TIPC_OVERSUBSCRIBE_OK"] = "1"
    os.environ["TIPC_ASSUME_CORES"] = "8"  # gate must arm on 1-core CI
    try:
        # seed an inflated baseline: the live run must regress against it
        assert run_benchmark(str(cfg), str(out), record_dir=str(records))
        # record name carries the backend tag (.cpu.json on cpu)
        rec_path = next(records.glob("benchmark_train_dnn*.json"))
        baseline = json.load(open(rec_path))
        inflated = dict(baseline)
        inflated["results"] = [
            dict(r, ips=r["ips"] * 100.0) for r in baseline["results"]
        ]
        rec_path.write_text(json.dumps(inflated))
        assert not run_benchmark(str(cfg), str(out), record_dir=str(records))
    finally:
        os.environ.pop("TIPC_OVERSUBSCRIBE_OK", None)
        os.environ.pop("TIPC_ASSUME_CORES", None)
    # tracked baseline untouched by the failing run
    assert json.load(open(rec_path)) == inflated
    # ...but the run artifact (with the regression findings) exists
    run_rec = json.load(open(next(out.glob("benchmark_train_dnn*.json"))))
    assert run_rec["regressions"], run_rec


def test_benchmark_summary_empty_dir_fails(tmp_path):
    """A summary over a dir with no records must exit non-zero — a gate
    that inspected no data must not read as green."""
    from paddlerec_tpu.tools.tipc_benchmark_summary import main

    assert main([str(tmp_path)]) == 1


def test_benchmark_rebaseline_and_empty_run_guard(tmp_path):
    """--rebaseline accepts a regressed run as the new baseline (the
    record keeps the re-baselined cell list); an all-cells-failed run
    must never clobber a baseline that has measurements."""
    import json
    import os

    from paddlerec_tpu.tools.tipc import run_benchmark

    cfg = tmp_path / "bench.txt"
    data = tmp_path / "data"
    from paddlerec_tpu.data.synthetic import write_criteo_sample

    write_criteo_sample(str(data), num_lines=128, num_files=1, vocab=1000)
    cfg.write_text(
        "model_name:dnn\n"
        "runner.model:rank.dnn\n"
        f"runner.train_data_dir:{data}\n"
        "hyper_parameters.sparse_inputs_slots:27\n"
        "hyper_parameters.dense_input_dim:13\n"
        "hyper_parameters.sparse_feature_number:1000\n"
        "hyper_parameters.sparse_feature_dim:8\n"
        "hyper_parameters.fc_sizes:[16]\n"
        "benchmark.batch_sizes:32\n"
        "benchmark.device_nums:1\n"
        "benchmark.steps:4\n"
    )
    out = tmp_path / "out"
    os.environ["TIPC_ASSUME_CORES"] = "8"  # gate must arm on 1-core CI
    try:
        assert run_benchmark(str(cfg), str(out), record_dir=str(out))
        # record name carries the backend tag (.cpu.json on a cpu backend)
        rec_path = next(out.glob("benchmark_train_dnn*.json"))
        rec = json.load(open(rec_path))

        # inflate the baseline so the next run regresses, then rebaseline
        inflated = dict(rec)
        inflated["results"] = [dict(r, ips=r["ips"] * 100.0)
                               for r in rec["results"]]
        rec_path.write_text(json.dumps(inflated))
        assert run_benchmark(str(cfg), str(out), record_dir=str(out),
                             rebaseline=True)
        new = json.load(open(rec_path))
        assert new["rebaselined"], "re-baselined cells must be recorded"
        assert not new["regressions"]
        assert new["results"][0]["ips"] < inflated["results"][0]["ips"]

        # all-cells-failed run: missing data dir; baseline must stay
        cfg.write_text(
            cfg.read_text().replace(str(data), str(data) + "_gone"))
        before = rec_path.read_text()
        assert not run_benchmark(str(cfg), str(out), record_dir=str(out))
        assert rec_path.read_text() == before
    finally:
        os.environ.pop("TIPC_ASSUME_CORES", None)
