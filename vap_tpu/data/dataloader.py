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
                self._queue.put(sample)
        except Exception as e:  # surface errors on the consumer side
            self._error = e
        finally:
            self._queue.put(self._SENTINEL)

    def __iter__(self) -> Iterator[Any]:
        self._queue = queue.Queue(maxsize=self.prefetch)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        while True:
            item = self._queue.get()
            if item is self._SENTINEL:
                if self._error is not None:
                    raise self._error
                return
            yield item

    # checkpointable state (dataset-level sample index)
    def state_dict(self) -> Dict[str, Any]:
        if hasattr(self.dataset, "state_dict"):
            return {"dataset": self.dataset.state_dict()}
        return {}

    def load_state_dict(self, state: Dict[str, Any]):
        if "dataset" in state and hasattr(self.dataset, "load_state_dict"):
            self.dataset.load_state_dict(state["dataset"])
