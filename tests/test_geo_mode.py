"""runner.sync_mode: geo — k-step local SGD wired into the CLI surface
(VERDICT r1 item 3; reference PS-geo, program_helper.py:44-51).

Two launched processes train on UNEVEN file shards with zero inter-host
traffic inside each k-step round, rendezvousing every k steps to average
parameters.  Unlike sync dp (which stops at the shortest shard), geo
workers train ALL their local batches.
"""

import socket
import sys
import textwrap

import numpy as np

from tests.test_multihost_sparse import _write_slot_file

WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, os.environ.get('PADDLEREC_REPO', '.'))
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 1)
    jax.distributed.initialize(
        coordinator_address=os.environ['JAX_COORDINATOR_ADDRESS'],
        num_processes=int(os.environ['JAX_NUM_PROCESSES']),
        process_id=int(os.environ['JAX_PROCESS_ID']))
    import numpy as np
    from jax.experimental import multihost_utils
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.train.trainer import Trainer

    data_dir = sys.argv[1]
    cfg = Config({
        'runner.model': 'rank.dnn',
        'runner.train_data_dir': data_dir,
        'runner.train_batch_size': 32,
        'runner.epochs': 1,
        'runner.print_interval': 100,
        'runner.sync_mode': 'geo',
        'runner.geo_k_steps': 2,
        'hyper_parameters.sparse_inputs_slots': 9,
        'hyper_parameters.sparse_feature_number': 1000000,
        'hyper_parameters.sparse_feature_dim': 8,
        'hyper_parameters.dense_input_dim': 4,
        'hyper_parameters.fc_sizes': [16, 8],
        'hyper_parameters.optimizer.learning_rate': 0.01,
    })
    t = Trainer(cfg)
    assert t._geo_local, 'geo mode must engage with >1 process'
    # local mesh: each worker jits over its OWN devices only
    assert t.mesh.devices.size == len(jax.local_devices())
    metrics = t.train()
    # geo trains every local batch: 160 + 64 rows = 224 total across
    # workers (sync dp would stop both at 2*64=128)
    assert metrics['total_ins'] == 224.0, metrics
    # after the final rendezvous all workers hold the averaged params
    leaves = jax.tree_util.tree_leaves(jax.device_get(t.state.params))
    checksum = np.float64(sum(np.float64(np.sum(x)) for x in leaves))
    all_sums = multihost_utils.process_allgather(np.asarray([checksum]))
    assert np.allclose(all_sums, all_sums[0], rtol=1e-6), all_sums
    # delta-push rendezvous: traffic ∝ TOUCHED rows, never the whole
    # 10^6-id table (VERDICT r2 item 3 done-criterion)
    table_bytes = sum(b.nbytes for b in t._geo_base['tables'].values())
    assert table_bytes > 8_000_000, table_bytes  # the table IS big
    assert 0 < t._geo_max_sync_bytes < table_bytes / 50, (
        t._geo_max_sync_bytes, table_bytes)
    print('rank', jax.process_index(), 'geo OK',
          t._geo_max_sync_bytes, table_bytes)
    """
)


def test_two_process_geo_train(tmp_path):
    import os

    import paddlerec_tpu

    from paddlerec_tpu.tools.launch import launch

    os.environ["PADDLEREC_REPO"] = os.path.dirname(
        os.path.dirname(os.path.abspath(paddlerec_tpu.__file__))
    )
    data = tmp_path / "data"
    data.mkdir()
    # round-robin shards: proc0 -> f0+f2 (96+64), proc1 -> f1 (64)
    _write_slot_file(data / "part-0", 96, 8, 4, 1000000, seed=1)
    _write_slot_file(data / "part-1", 64, 8, 4, 1000000, seed=2)
    _write_slot_file(data / "part-2", 64, 8, 4, 1000000, seed=3)
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    rc = launch(
        2, 1, [sys.executable, str(script), str(data)],
        coordinator_port=port,
    )
    assert rc == 0
