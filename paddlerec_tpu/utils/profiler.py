"""Step-range profiler hook.

Parity target: reference tools/profiler.py:26-110 — a
``"key=value;key=value"`` option string selects a [start, stop) batch
range; profiling starts at batch_range[0], stops (and optionally exits)
at batch_range[1].  The paddle op profiler is replaced by
``jax.profiler`` traces (XPlane/Perfetto, viewable in TensorBoard or
xprof) written to ``profile_path``.
"""

from __future__ import annotations

import sys
from typing import Optional

import jax

_profiler_step_id = 0
_profiler_options: Optional["ProfilerOptions"] = None
_active = False


class ProfilerOptions:
    """Parse "batch_range=[50,60];profile_path=/tmp/p;exit_on_finished=true"
    (same grammar as tools/profiler.py:46-80; paddle-only keys like
    ``state``/``tracer_option`` are accepted and ignored)."""

    def __init__(self, options_str: str):
        self._options = {
            "batch_range": [10, 20],
            "state": "All",
            "sorted_key": "total",
            "tracer_option": "Default",
            "profile_path": "/tmp/paddlerec_tpu_profile",
            "exit_on_finished": True,
        }
        for kv in options_str.replace(" ", "").split(";"):
            if not kv:
                continue
            key, _, value = kv.partition("=")
            if key == "batch_range":
                vals = [int(v) for v in
                        value.replace("[", "").replace("]", "").split(",")]
                if len(vals) >= 2 and vals[0] >= 0 and vals[1] > vals[0]:
                    self._options[key] = vals[:2]
            elif key == "exit_on_finished":
                self._options[key] = value.lower() in ("yes", "true", "t", "1")
            elif key in self._options:
                self._options[key] = value

    def __getitem__(self, name):
        return self._options[name]


def reset():
    global _profiler_step_id, _profiler_options, _active
    if _active:
        jax.profiler.stop_trace()
    _profiler_step_id = 0
    _profiler_options = None
    _active = False


def add_profiler_step(options_str: Optional[str] = None) -> None:
    """Call once per batch (the trainer does); starts/stops the trace when
    the step counter crosses the configured range."""
    global _profiler_step_id, _profiler_options, _active
    if not options_str:
        return
    if _profiler_options is None:
        _profiler_options = ProfilerOptions(options_str)
    lo, hi = _profiler_options["batch_range"]
    if _profiler_step_id == lo and not _active:
        jax.profiler.start_trace(_profiler_options["profile_path"])
        _active = True
    elif _profiler_step_id == hi and _active:
        jax.profiler.stop_trace()
        _active = False
        if _profiler_options["exit_on_finished"]:
            sys.exit(0)
    _profiler_step_id += 1
