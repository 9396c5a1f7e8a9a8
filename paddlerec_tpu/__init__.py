"""paddlerec_tpu — a TPU-native recommender framework.

A ground-up rebuild of the capability set of PaddlePaddle/PaddleRec
(config-driven recommender model zoo + distributed trainers) designed for
TPU hardware: JAX/XLA for the compute path, pjit/shard_map over a device
mesh for parallelism, Pallas kernels for the hot embedding ops, and a
host-side streaming input pipeline.

Key differences from the reference (deliberate, TPU-first):
  * One jitted functional train step replaces the reference's
    dygraph/static duality (reference: tools/trainer.py vs
    tools/static_trainer.py).
  * The parameter-server fleet (reference: tools/static_ps_trainer.py)
    is replaced by synchronous SPMD: embedding tables are row-sharded
    across the mesh in HBM and exchanged with XLA collectives.
  * Metrics use the same histogram-bucket AUC math as the reference
    (tools/utils/static_ps/metric_helper.py) so distributed AUC is exact
    under psum.
"""

__version__ = "0.1.0"
