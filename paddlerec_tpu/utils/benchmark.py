"""Inference benchmark reporter.

Parity target: reference tools/utils/benchmark_utils.py:29-281
(PaddleInferBenchmark) — a structured report of environment, model info,
data info and performance (latency percentiles, QPS), logged in the same
section layout.  GPU util fields are replaced by the JAX device list.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional


class InferBenchmark:
    def __init__(
        self,
        config: Optional[Dict] = None,
        model_info: Optional[Dict] = None,
        data_info: Optional[Dict] = None,
        perf_info: Optional[Dict] = None,
    ):
        self.config = config or {}
        self.model_info = model_info or {}
        self.data_info = data_info or {}
        perf_info = perf_info or {}
        self.latencies: List[float] = list(perf_info.get("latencies", []))
        self.logger = logging.getLogger("paddlerec_tpu.benchmark")
        if not self.logger.handlers:
            h = logging.StreamHandler()
            h.setFormatter(logging.Formatter("%(message)s"))
            self.logger.addHandler(h)
            self.logger.setLevel(logging.INFO)

    # -- measurement ----------------------------------------------------------
    def time_fn(self, fn, batches, warmup: int = 3):
        """Run fn over batches, recording per-call wall latency (s).

        ``batches`` is materialized once so generators are not partially
        consumed; warmup replays the first batches without timing them."""
        import jax

        batches = list(batches)
        for b in batches[:warmup]:
            jax.block_until_ready(fn(b))
        for b in batches:
            t0 = time.perf_counter()
            jax.block_until_ready(fn(b))
            self.latencies.append(time.perf_counter() - t0)
        return self

    def stats(self) -> Dict[str, float]:
        if not self.latencies:
            return {}
        xs = sorted(self.latencies)
        n = len(xs)

        def pct(p):
            return xs[min(int(n * p), n - 1)] * 1000.0

        return {
            "count": n,
            "avg_ms": sum(xs) / n * 1000.0,
            "p50_ms": pct(0.50),
            "p90_ms": pct(0.90),
            "p99_ms": pct(0.99),
            "max_ms": xs[-1] * 1000.0,
            "qps": n / max(sum(xs), 1e-9),
        }

    # -- report (benchmark_utils.py:129-275 layout) ----------------------------
    def report(self, identifier: Optional[str] = None) -> Dict:
        import jax

        identifier = f"[{identifier}]" if identifier else ""
        env = {
            "devices": [str(d) for d in jax.devices()],
            "backend": jax.default_backend(),
            "process_count": jax.process_count(),
            "pid": os.getpid(),
        }
        s = self.stats()
        log = self.logger.info
        log(f"{identifier} ---------------------- Env info ----------------------")
        for k, v in env.items():
            log(f"{identifier} {k}: {v}")
        log(f"{identifier} ---------------------- Model info ----------------------")
        for k, v in self.model_info.items():
            log(f"{identifier} {k}: {v}")
        log(f"{identifier} ---------------------- Data info ----------------------")
        for k, v in self.data_info.items():
            log(f"{identifier} {k}: {v}")
        log(f"{identifier} ---------------------- Perf info ----------------------")
        for k, v in s.items():
            log(f"{identifier} {k}: {v:.4f}" if isinstance(v, float)
                else f"{identifier} {k}: {v}")
        return {"env": env, "model": self.model_info,
                "data": self.data_info, "perf": s}

    def __call__(self, identifier=None):
        return self.report(identifier)
