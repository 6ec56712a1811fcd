"""Structured per-stage timing + RTF metrics.

The reference logs ad-hoc stopwatch lines with the prefix `耗时统计 -`
("timing stat") at every stage and computes TTS RTF per segment/job
(reference: voice-service/README.md:292-302; tts_service.py:632-648,889-891,
925-936). Here those are first-class: `StageTimer` collects a structured dict
equivalent to the reference's `_detailed_timing`, and `RTFMeter` accumulates
real-time factors. `jax.block_until_ready` is used at stage boundaries so
device time is attributed to the stage that spent it.
"""
from __future__ import annotations

import logging
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

logger = logging.getLogger("toolbox.metrics")

TIMING_PREFIX = "耗时统计 -"  # keep the reference's greppable convention


def timing_log(step: str, ms: float) -> None:
    logger.info("%s %s: %.2f ms", TIMING_PREFIX, step, ms)


def _wait_device(x: Any) -> None:
    """Force completion of a device computation by fetching one element of
    each array leaf (works under axon, where block_until_ready is a no-op)."""
    try:
        import jax
        import numpy as _np
        for leaf in jax.tree.leaves(x):
            if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
                _np.asarray(leaf.ravel()[:1])
    except Exception:  # timing must never break the serving path
        logger.debug("stage wait failed", exc_info=True)


@dataclass
class StageTimer:
    """Collects named stage durations into a structured timing dict."""

    stages: Dict[str, float] = field(default_factory=dict)
    _t0: float = field(default_factory=time.perf_counter)

    @contextmanager
    def stage(self, name: str, block_on: Any = None):
        """Time a stage. Yields a LIST the body can append device arrays to
        (outputs that don't exist at context entry — round-2 review finding:
        a parameter evaluated at entry can never name them); at exit, one
        element of each pending array is fetched to host so device time is
        attributed to the stage that spent it. A tiny fetch is used rather
        than jax.block_until_ready because the latter does not synchronize
        on this project's axon runtime (CLAUDE.md env rules)."""
        t = time.perf_counter()
        pending: list = [] if block_on is None else [block_on]
        try:
            yield pending
        finally:
            for x in pending:
                _wait_device(x)
            ms = (time.perf_counter() - t) * 1000.0
            self.stages[name] = self.stages.get(name, 0.0) + ms
            timing_log(name, ms)

    def total_ms(self) -> float:
        return (time.perf_counter() - self._t0) * 1000.0

    def detailed(self) -> Dict[str, Any]:
        return {"total_ms": self.total_ms(), "stages_ms": dict(self.stages)}


@dataclass
class RTFMeter:
    """Real-time factor: processing_seconds / audio_seconds (lower is better)."""

    items: List[Dict[str, float]] = field(default_factory=list)

    def record(self, proc_s: float, audio_s: float, label: str = "") -> float:
        rtf = proc_s / max(audio_s, 1e-9)
        self.items.append(
            {"label": label, "proc_s": proc_s, "audio_s": audio_s, "rtf": rtf}
        )
        if rtf > 1.0:
            # mirrors the reference's CPU-fallback alarm (tts_service.py:636-648)
            logger.warning("RTF %.2f > 1.0 for %s — slower than real time", rtf, label)
        return rtf

    @property
    def overall(self) -> Optional[float]:
        if not self.items:
            return None
        proc = sum(i["proc_s"] for i in self.items)
        audio = sum(i["audio_s"] for i in self.items)
        return proc / max(audio, 1e-9)

    def detailed(self) -> Dict[str, Any]:
        return {"overall_rtf": self.overall, "items": list(self.items)}
