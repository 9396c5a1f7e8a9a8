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


def test_launch_two_process_jax_cluster(tmp_path):
    """Two launched processes form one jax.distributed cluster and agree
    on a global psum (the collective-DP control path, SURVEY §2.5 P1)."""
    script = tmp_path / "dist_probe.py"
    script.write_text(
        "import os, jax\n"
        # the axon TPU plugin hijacks JAX_PLATFORMS env vars; force the
        # CPU platform through jax.config like tests/conftest.py does
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 2)\n"
        "jax.distributed.initialize(\n"
        "    coordinator_address=os.environ['JAX_COORDINATOR_ADDRESS'],\n"
        "    num_processes=int(os.environ['JAX_NUM_PROCESSES']),\n"
        "    process_id=int(os.environ['JAX_PROCESS_ID']))\n"
        "assert jax.process_count() == 2, jax.process_count()\n"
        "assert len(jax.devices()) == 4, len(jax.devices())\n"
        "import jax.numpy as jnp\n"
        "import numpy as np\n"
        "from jax.sharding import Mesh, PartitionSpec as P, NamedSharding\n"
        "from jax.experimental import multihost_utils\n"
        "mesh = Mesh(np.array(jax.devices()).reshape(4,), ('dp',))\n"
        "x = jnp.ones((2,))  # local shard per process\n"
        "g = multihost_utils.host_local_array_to_global_array(x, mesh, P('dp'))\n"
        "total = jax.jit(lambda a: a.sum(),\n"
        "                in_shardings=NamedSharding(mesh, P('dp')),\n"
        "                out_shardings=NamedSharding(mesh, P()))(g)\n"
        "assert float(total) == 4.0, float(total)\n"
        "print('rank', jax.process_index(), 'psum OK')\n"
    )
    import socket

    from paddlerec_tpu.tools.launch import launch

    with socket.socket() as s:  # grab a free ephemeral port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    rc = launch(2, 2, [sys.executable, str(script)], coordinator_port=port)
    assert rc == 0
