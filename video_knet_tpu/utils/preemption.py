"""Preemption / failure handling (SURVEY.md §5.3 TPU plan).

The reference has no elastic recovery (manual --resume-from only). TPU pods get
preempted; this installs SIGTERM/SIGINT handlers that set a flag the train loop
polls, so the current step finishes, a checkpoint is written, and the process
exits cleanly for the scheduler to restart with --resume-from.
"""

from __future__ import annotations

import signal
import sys


class PreemptionGuard:
    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.requested = False
        self._prev = {}
        for s in signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except (ValueError, OSError):  # non-main thread / unsupported
                pass

    def _handler(self, signum, frame):
        if self.requested:  # second signal: exit immediately
            sys.exit(128 + signum)
        print(f"signal {signum}: finishing step, checkpointing, exiting", flush=True)
        self.requested = True

    def restore(self):
        for s, h in self._prev.items():
            signal.signal(s, h)
