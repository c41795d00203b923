"""Background-prefetching data loader (host side).

Replaces the reference's torchdata StatefulDataLoader (finetrainers
data/dataloader.py:24-47): a worker-thread pipeline that decodes/preprocesses
samples ahead of the accelerator and exposes checkpointable state (the
underlying dataset's sample index).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional


class PrefetchingDataLoader:
    _SENTINEL = object()

    def __init__(self, dataset, prefetch: int = 4):
        self.dataset = dataset
        self.prefetch = prefetch
        self._queue: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None
        self._error = None

    def _worker(self):
        try:
            for sample in self.dataset:
                # snapshot dataset state right after it produced this sample so
                # the consumer-side state_dict reflects CONSUMED samples, not
                # the prefetch position (torchdata StatefulDataLoader contract)
                state = self.dataset.state_dict() if hasattr(self.dataset, "state_dict") else None
                self._queue.put((sample, state))
        except Exception as e:  # surface errors on the consumer side
            self._error = e
        finally:
            self._queue.put(self._SENTINEL)

    def __iter__(self) -> Iterator[Any]:
        self._queue = queue.Queue(maxsize=self.prefetch)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        self._consumed_state = getattr(self, "_consumed_state", None)
        while True:
            item = self._queue.get()
            if item is self._SENTINEL:
                if self._error is not None:
                    raise self._error
                return
            sample, state = item
            if state is not None:
                self._consumed_state = state
            yield sample

    # checkpointable state: dataset state as of the last CONSUMED sample
    def state_dict(self) -> Dict[str, Any]:
        state = getattr(self, "_consumed_state", None)
        if state is not None:
            return {"dataset": state}
        if hasattr(self.dataset, "state_dict"):
            return {"dataset": self.dataset.state_dict()}
        return {}

    def load_state_dict(self, state: Dict[str, Any]):
        if "dataset" in state and hasattr(self.dataset, "load_state_dict"):
            self.dataset.load_state_dict(state["dataset"])
