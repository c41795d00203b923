from .logging import get_logger
from .timing import Timer
from .trackers import DummyTracker, SequentialTracker, WandbTracker, initialize_trackers
from .determinism import enable_determinism
