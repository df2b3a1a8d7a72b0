"""Parallel print streams: pout/perr/plog + printp (SURVEY.md U4,
src/utilities/RayUtilities.{h,cpp}).

In the reference, rank 0 prints to stdout and every rank can log; here the
"rank" is the JAX process index (single-host runs are always rank 0). ``plog``
tees to an optional log file.
"""

from __future__ import annotations

import sys
from typing import IO, Optional

__all__ = ["pout", "perr", "plog", "printp", "set_log_file", "rank", "stringf"]

_log_file: Optional[IO] = None


def rank() -> int:
    """Process index (MPI_rank analogue; 0 on single-host runs)."""
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


class _Stream:
    """Rank-gated output stream (pout prints only on rank 0, like the
    reference's rank-0-only benchmark output, CreateImage.cpp:86)."""

    def __init__(self, target, rank0_only: bool, log_too: bool):
        self._target = target
        self._rank0_only = rank0_only
        self._log_too = log_too

    def write(self, text: str) -> None:
        if not self._rank0_only or rank() == 0:
            stream = getattr(sys, self._target)
            stream.write(text)
            stream.flush()
        if self._log_too and _log_file is not None:
            _log_file.write(text)
            _log_file.flush()

    def flush(self) -> None:
        getattr(sys, self._target).flush()


pout = _Stream("stdout", rank0_only=True, log_too=True)
perr = _Stream("stderr", rank0_only=False, log_too=True)


class _Log:
    def write(self, text: str) -> None:
        if _log_file is not None:
            _log_file.write(text)
            _log_file.flush()

    def flush(self) -> None:
        if _log_file is not None:
            _log_file.flush()


plog = _Log()


def set_log_file(f: Optional[IO]) -> None:
    global _log_file
    _log_file = f


def printp(fmt: str, *args) -> int:
    """printf-style print to pout (Utilities::printp)."""
    text = fmt % args if args else fmt
    pout.write(text)
    return len(text)


def stringf(fmt: str, *args) -> str:
    """sprintf returning a string (Utilities::stringf)."""
    return fmt % args if args else fmt
