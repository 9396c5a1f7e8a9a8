"""Multi-host feature-lifecycle soundness (round-3 review findings).

A real 2-process run of the online lifecycle collectives: per-host
observations merge into ONE global stats view (sparse exchange), the
published delta covers the union of touched rows written by a single
process, and shrink() evicts the same rows everywhere — replicated
tables stay bit-identical after eviction.
"""

import socket
import sys
import textwrap

WORKER = textwrap.dedent(
    """
    import json, os, sys
    sys.path.insert(0, os.environ.get('PADDLEREC_REPO', '.'))
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 2)
    jax.distributed.initialize(
        coordinator_address=os.environ['JAX_COORDINATOR_ADDRESS'],
        num_processes=int(os.environ['JAX_NUM_PROCESSES']),
        process_id=int(os.environ['JAX_PROCESS_ID']))
    assert jax.process_count() == 2
    r = jax.process_index()
    import numpy as np
    from jax.experimental import multihost_utils
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.train.online import OnlineTrainer

    out = sys.argv[1]
    cfg = Config({
        'runner.model': 'rank.dnn',
        'runner.train_data_dir': out,   # unused: no pass is trained
        'runner.model_save_path': os.path.join(out, 'model'),
        'runner.train_batch_size': 32,
        'hyper_parameters.sparse_inputs_slots': 9,
        'hyper_parameters.sparse_feature_number': 4096,
        'hyper_parameters.sparse_feature_dim': 8,
        'hyper_parameters.dense_input_dim': 4,
        'hyper_parameters.fc_sizes': [16, 8],
        # every once-seen row falls under the decayed threshold at
        # end_day; 5x-seen rows survive
        'table_parameters.delete_threshold': 0.99,
    })
    t = OnlineTrainer(cfg)
    t.init_state()
    assert t._ensure_tracking()
    name, leaf = t._embedding_entries()[0]
    st = t.stats[name]

    # host r observes: shared row 2 (both hosts), private hot row 10+r
    # (5 shows, survives), private cold row 20+r (1 show, evicted)
    st.observe(np.array([2]))
    for _ in range(5):
        st.observe(np.array([10 + r]))
    st.observe(np.array([20 + r]))
    t._touched[name][[2, 10 + r, 20 + r]] = True

    # --- global stats merge: identical on both hosts, shows additive
    t._merge_stats_global()
    assert st.show[2] == 2.0, st.show[2]          # both hosts observed
    assert st.show[10] == 5.0 and st.show[11] == 5.0
    assert st.show[20] == 1.0 and st.show[21] == 1.0
    digest = np.float64(st.show.sum() + st.seen.sum()
                        + st.unseen_days.sum())
    digests = multihost_utils.process_allgather(np.asarray([digest]))
    assert np.allclose(digests, digests[0]), digests

    # --- delta: union of touched rows, written by one process
    path = t.save_delta(os.path.join(out, 'model'), 'delta_t')
    multihost_utils.sync_global_devices('delta_written')
    meta = json.load(open(os.path.join(path, 'delta_meta.json')))
    assert meta['rows_touched'] == 5, meta   # {2, 10, 11, 20, 21}
    # touched masks reset everywhere after publish
    assert not t._touched[name].any()

    # --- shrink: same evict set everywhere; tables stay bit-identical
    # decayed shows: row 2 -> 1.96, rows 10/11 -> 4.9 (survive);
    # rows 20/21 -> 0.98 < threshold 0.99 (evicted on BOTH hosts,
    # though each host observed only its own)
    evicted = t.shrink()
    assert evicted == 2, evicted
    # re-fetch: eviction rebuilds the param arrays
    leaf = dict(t._embedding_entries())[name]
    table = np.asarray(jax.device_get(leaf), np.float32)
    csum = np.float64(np.abs(table).sum())
    csums = multihost_utils.process_allgather(np.asarray([csum]))
    assert np.allclose(csums, csums[0]), csums
    # evicted rows zeroed, surviving hot rows intact
    assert np.abs(table[20]).sum() == 0 and np.abs(table[21]).sum() == 0
    assert np.abs(table[10]).sum() > 0 and np.abs(table[11]).sum() > 0
    print('rank', r, 'multihost lifecycle OK')
    """
)


def test_two_process_lifecycle_merge_delta_shrink(tmp_path):
    import os

    import paddlerec_tpu
    from paddlerec_tpu.tools.launch import launch

    os.environ["PADDLEREC_REPO"] = os.path.dirname(
        os.path.dirname(os.path.abspath(paddlerec_tpu.__file__))
    )
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    rc = launch(
        2, 2, [sys.executable, str(script), str(tmp_path)],
        coordinator_port=port,
    )
    assert rc == 0
