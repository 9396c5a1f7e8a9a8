"""FL-PS federated training (SURVEY §2.5 P8; VERDICT r2 item 7).

Two launched processes = two federated clients with PRIVATE, uneven
data shards.  Each round the deterministic coordinator selects clients,
they train local epochs with zero cross-client traffic, and the
rendezvous aggregates with example-count-weighted FedAvg — the
reference's FLClient example-count contract
(tools/static_fl_trainer.py:138-146) and coordinator strategy
(fleet.make_fl_strategy, :150-153).
"""

import socket
import sys
import textwrap

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
    from paddlerec_tpu.train.fl import FLTrainer

    data_dir = sys.argv[1]
    cfg = Config({
        'runner.model': 'rank.dnn',
        'runner.train_data_dir': data_dir,
        'runner.train_batch_size': 32,
        'runner.fl_rounds': 3,
        'runner.fl_local_epochs': 2,
        'runner.sync_mode': 'fl',
        'runner.print_interval': 100,
        'hyper_parameters.sparse_inputs_slots': 9,
        'hyper_parameters.sparse_feature_number': 4096,
        'hyper_parameters.sparse_feature_dim': 8,
        'hyper_parameters.dense_input_dim': 4,
        'hyper_parameters.fc_sizes': [16, 8],
        'hyper_parameters.optimizer.learning_rate': 0.01,
    })
    t = FLTrainer(cfg)
    assert t._geo_local, 'fl must ride the geo substrate'
    metrics = t.train()
    assert metrics['rounds'] == 3.0, metrics
    # clients trained UNEVEN shards (96+64 vs 64 rows) every round:
    # epoch metrics cover all clients' data
    assert metrics['total_ins'] == 2 * (160 + 64), metrics
    # FedAvg left every client with identical params
    leaves = jax.tree_util.tree_leaves(jax.device_get(t.state.params))
    checksum = np.float64(sum(np.float64(np.sum(x)) for x in leaves))
    all_sums = multihost_utils.process_allgather(np.asarray([checksum]))
    assert np.allclose(all_sums, all_sums[0], rtol=1e-6), all_sums
    print('rank', jax.process_index(), 'fl OK')
    """
)


def test_two_process_fedavg(tmp_path):
    import os

    import paddlerec_tpu

    from paddlerec_tpu.tools.launch import launch

    os.environ["PADDLEREC_REPO"] = os.path.dirname(
        os.path.dirname(os.path.abspath(paddlerec_tpu.__file__))
    )
    data = tmp_path / "data"
    data.mkdir()
    # round-robin shards: client0 -> f0+f2 (96+64), client1 -> f1 (64)
    _write_slot_file(data / "part-0", 96, 8, 4, 4096, seed=1)
    _write_slot_file(data / "part-1", 64, 8, 4, 4096, seed=2)
    _write_slot_file(data / "part-2", 64, 8, 4, 4096, seed=3)
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


def test_coordinator_selection_is_deterministic():
    """Every process must compute the SAME round plan (no strategy
    RPC): the selection is a pure function of (seed, round)."""
    import numpy as np

    seed, fraction, nproc = 2023, 0.5, 4
    for rnd in range(20):
        rng = np.random.RandomState(seed * 9973 + rnd)
        draws = rng.rand(nproc)
        chosen = draws < fraction
        if not chosen.any():
            chosen[int(np.argmin(draws))] = True
        rng2 = np.random.RandomState(seed * 9973 + rnd)
        draws2 = rng2.rand(nproc)
        chosen2 = draws2 < fraction
        if not chosen2.any():
            chosen2[int(np.argmin(draws2))] = True
        assert (chosen == chosen2).all()
        assert chosen.any()
