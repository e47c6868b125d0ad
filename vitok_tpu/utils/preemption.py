"""Preemption-aware training: save-on-signal + graceful exit.

The reference has no failure handling at all — it relies on periodic DCP
checkpoints plus manual restart (SURVEY.md §5.3). TPU pods get preempted
(spot/maintenance events deliver SIGTERM); this hook guarantees a final
checkpoint instead of losing up to ``save_freq`` steps.

Usage in a training loop:

    guard = PreemptionGuard()
    for step in ...:
        state, metrics = train_step(...)
        if guard.should_stop:
            save_checkpoint(state, ckpt_dir)
            break
"""

from __future__ import annotations

import signal
import threading
from typing import Callable, Iterable, Optional


class PreemptionGuard:
    """Latches SIGTERM/SIGINT into a flag the training loop polls.

    Polling (rather than saving inside the signal handler) keeps checkpoint
    writes off the async signal path and coordinated across hosts: every
    process sees its own signal, and the loop saves at a step boundary.
    """

    def __init__(
        self,
        signals: Iterable[int] = (signal.SIGTERM, signal.SIGINT),
        on_preempt: Optional[Callable[[], None]] = None,
    ):
        self._stop = threading.Event()
        self._on_preempt = on_preempt
        self._prev = {}
        for sig in signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):
                pass  # non-main thread or unsupported signal

    def _handler(self, signum, frame):
        self._stop.set()
        if self._on_preempt is not None:
            self._on_preempt()

    @property
    def should_stop(self) -> bool:
        return self._stop.is_set()

    def restore(self) -> None:
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass


__all__ = ["PreemptionGuard"]
