"""UAPI: the high-level model facade.

Parity target: reference uapi_rec/base/model.py:45-410 + uapi_rec/rank/ —
``RankModel(model_name)`` exposing train / evaluate / predict / export /
infer with per-API prechecks.  The reference builds CLI strings and
shells out to tools/*.py (uapi_rec/base/runner.py:26-120); here the same
tools are invoked in-process (one runtime, no subprocess tax), with the
same config-override semantics as `-o key=value`.
"""

from paddlerec_tpu.uapi.model import RankModel, UnsupportedAPIError

__all__ = ["RankModel", "UnsupportedAPIError"]
