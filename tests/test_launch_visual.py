"""Multi-process launcher + scalar telemetry writer."""

import json
import subprocess
import sys


def test_launch_spawns_ranked_processes(tmp_path):
    script = tmp_path / "probe.py"
    script.write_text(
        "import os, sys\n"
        "print(os.environ['JAX_PROCESS_ID'], os.environ['JAX_NUM_PROCESSES'],\n"
        "      os.environ['PADDLE_TRAINER_ID'])\n"
    )
    from paddlerec_tpu.tools.launch import launch

    out = tmp_path / "out"
    rc = launch(2, 0, [sys.executable, str(script)])
    assert rc == 0


def test_launch_cli_requires_command():
    from paddlerec_tpu.tools import launch

    r = subprocess.run(
        [sys.executable, "-m", "paddlerec_tpu.tools.launch", "--nproc", "2"],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "no command" in r.stderr


def test_scalar_writer(tmp_path):
    from paddlerec_tpu.utils.visual import ScalarWriter

    w = ScalarWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, 1)
    w.add_scalars({"train/loss": 0.4, "train/ips": 1000.0}, 2)
    w.close()
    recs = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert len(recs) == 3
    assert recs[0]["tag"] == "train/loss" and recs[0]["step"] == 1
