"""tpuseg.ops.pallas — TPU Pallas kernels.

Dispatch policy: callers that take ``use_pallas=None`` resolve the default
via :func:`pallas_enabled` (backend == "tpu" unless overridden) and pass
:func:`pallas_interpret` into the kernels. :func:`pallas_override` forces
both — e.g. ``pallas_override(use_pallas=True, interpret=True)`` runs the
real kernel code paths through the Pallas interpreter on CPU, which is how
the multi-chip dryrun exercises pallas_call under SPMD partitioning
without TPU hardware (see __graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import contextlib

_OVERRIDE = {"use_pallas": None, "interpret": False}


def pallas_enabled(default: bool) -> bool:
    o = _OVERRIDE["use_pallas"]
    return default if o is None else o


def pallas_interpret() -> bool:
    return _OVERRIDE["interpret"]


@contextlib.contextmanager
def pallas_override(use_pallas: bool | None = None, interpret: bool = False):
    prev = dict(_OVERRIDE)
    _OVERRIDE["use_pallas"] = use_pallas
    _OVERRIDE["interpret"] = interpret
    try:
        yield
    finally:
        _OVERRIDE.update(prev)
