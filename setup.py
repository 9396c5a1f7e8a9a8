"""Packaging (reference setup.py:22-50 packages `paddlerec`)."""

from setuptools import find_packages, setup

setup(
    name="paddlerec_tpu",
    version="0.1.0",
    description=(
        "TPU-native recommender framework: config-driven model zoo, "
        "SPMD sharded-embedding training, online learning, serving tools"
    ),
    packages=find_packages(include=["paddlerec_tpu", "paddlerec_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "pyyaml",
    ],
    extras_require={
        "kafka": ["confluent-kafka"],
        "odps": ["pyodps"],
        "k8s": ["kubernetes"],
    },
    entry_points={
        "console_scripts": [
            "paddlerec-tpu-train=paddlerec_tpu.tools.train:main",
            "paddlerec-tpu-infer=paddlerec_tpu.tools.infer:main",
        ]
    },
)
