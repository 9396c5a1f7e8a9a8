"""Test env: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY §4's implication — distributed paths are tested on one host
via XLA's host-platform device-count flag, per the driver contract.
"""

import os

# The axon TPU plugin overrides JAX_PLATFORMS env vars in-process, so we
# must force the CPU platform through jax.config *before* backend init.
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache makes repeat test runs much faster
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_paddlerec_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def tmp_sample_data(tmp_path):
    from paddlerec_tpu.data.synthetic import write_criteo_sample

    data_dir = tmp_path / "train"
    write_criteo_sample(str(data_dir), num_lines=256, num_files=4, vocab=10000)
    return str(data_dir)


def small_config(tmp_path, model="rank.deepfm", **extra):
    """A tiny in-memory config for smoke tests."""
    from paddlerec_tpu.core.config import Config

    flat = {
        "runner.model": model,
        "runner.train_data_dir": str(tmp_path / "train"),
        "runner.test_data_dir": str(tmp_path / "train"),
        "runner.train_batch_size": 32,
        "runner.infer_batch_size": 32,
        "runner.epochs": 1,
        "runner.print_interval": 100,
        "runner.use_auc": True,
        "runner.seed": 0,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.sparse_feature_number": 10000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.fc_sizes": [64, 32],
        "config_dir": str(tmp_path),
    }
    flat.update(extra)
    return Config(flat)
