"""Debug instrumentation flags.

The reference wires a ``debug`` cargo feature through ``spam_csr`` into
``linprobe`` to record probe-length histograms and per-phase row_nz dumps
(``linprobe/src/map.rs:17-18``, ``spam_csr/src/mul_hash.rs:18-25``). Here the
equivalent is a runtime flag (env var ``SPMX_DEBUG=1`` or
:func:`set_debug`) plus a process-global histogram store the benches and tests
can read back.
"""

from __future__ import annotations

import os
from typing import Dict

__all__ = ["debug_enabled", "set_debug", "record_histogram", "get_histograms", "clear_histograms"]

_DEBUG = os.environ.get("SPMX_DEBUG", "0") not in ("", "0", "false", "False")
_HISTOGRAMS: Dict[str, Dict[int, int]] = {}


def debug_enabled() -> bool:
    return _DEBUG


def set_debug(on: bool) -> None:
    global _DEBUG
    _DEBUG = bool(on)


def record_histogram(name: str, hist: Dict[int, int]) -> None:
    agg = _HISTOGRAMS.setdefault(name, {})
    for k, v in hist.items():
        agg[k] = agg.get(k, 0) + v


def get_histograms() -> Dict[str, Dict[int, int]]:
    return {k: dict(v) for k, v in _HISTOGRAMS.items()}


def clear_histograms() -> None:
    _HISTOGRAMS.clear()
