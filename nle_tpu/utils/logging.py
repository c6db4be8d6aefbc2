"""Observability: stage logging, timings, and structured diagnostics.

The reference reports stage progress with bare std::cout lines
("Computing kernel", "Nystrom approximation", "Sinkhorn", "Orthogonalize" —
src/filter.cpp:483,488,493,498) and eigensolver trouble with a cerr warning
that does not abort (src/filter.cpp:180-183). This module reproduces that
contract on Python logging, adds per-stage wall-clock, and surfaces
numerical diagnostics (rank truncation, conditioning) as warnings.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("nle_tpu")


@contextlib.contextmanager
def stage(name: str):
    """Log a pipeline stage with wall-clock (reference's progress prints)."""
    logger.info("%s", name)
    t0 = time.perf_counter()
    yield
    logger.debug("%s took %.1f ms", name, (time.perf_counter() - t0) * 1e3)


# Dedup per (p, m, eps) per process: the pipelined/serving paths retrain
# per frame and would otherwise repeat the identical line dozens of times
# per run. Deliberately NOT keyed on image identity — a different image
# that truncates to the same numbers would produce the byte-identical
# warning line, which tells a log reader nothing new.
_seen_truncations: set = set()


def warn_truncation(p: int, m: int, eps: float) -> None:
    if m < p and (p, m, eps) not in _seen_truncations:
        _seen_truncations.add((p, m, eps))
        logger.warning(
            "Nystrom spectrum truncated: kept %d of %d eigenvalues above "
            "eps=%g; the balanced block boundary moves to m=%d "
            "(reference src/filter.cpp:247 semantics).", m, p, eps, m,
        )


def warn_rank_deficient(name: str, kept: int, requested: int) -> None:
    if kept < requested:
        # Mirrors the reference's non-fatal solver warning
        # (src/filter.cpp:180-183): report and keep going.
        logger.warning(
            "%s produced %d eigenpairs above threshold (requested %d). "
            "Results might be inaccurate.", name, kept, requested,
        )
