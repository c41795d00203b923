"""Trackers, timers, logging, precomputation."""

import time

import numpy as np

from vap_tpu.data.precomputation import InMemoryPreprocessor, PrecomputedPreprocessor
from vap_tpu.utils.logging import get_logger
from vap_tpu.utils.timing import Timer
from vap_tpu.utils.trackers import DummyTracker, SequentialTracker, initialize_trackers


def test_timer_accumulates():
    t = Timer()
    with t.track("a"):
        time.sleep(0.01)
    with t.track("a"):
        time.sleep(0.01)
    with t.track("b"):
        pass
    means = t.means()
    assert means["a"] >= 0.009
    assert "b" in means
    t.reset()
    assert not t.means()


def test_tracker_merges_timings():
    tr = DummyTracker()
    with tr.timed("timing/forward"):
        time.sleep(0.005)
    tr.log({"loss": 1.0}, step=1)
    entry = tr.history[0]
    assert entry["loss"] == 1.0
    assert entry["timing/forward"] > 0
    assert entry["step"] == 1


def test_sequential_tracker():
    tr = initialize_trackers(["dummy", "dummy"])
    assert isinstance(tr, SequentialTracker)
    tr.log({"x": 1})
    assert all(t.history for t in tr.trackers)


def test_log_freq_dedup(capsys):
    logger = get_logger("vap_tpu.test_freq")
    for _ in range(10):
        logger.log_freq.info("hello", frequency=5)
    # 10 occurrences at frequency 5 -> 2 emissions
    err = capsys.readouterr().err
    assert err.count("hello") == 2


def test_precompute_roundtrip(tmp_path):
    samples = [{"x": i} for i in range(4)]

    def cond(s):
        return {"embeds": np.full((1, 3), s["x"], np.float32), "caption": f"c{s['x']}"}

    def lat(s):
        return {"latents": np.full((1, 2, 2), s["x"], np.float32)}

    pre = PrecomputedPreprocessor(str(tmp_path), rank=0)
    assert not pre.is_cached()
    n = pre.precompute(iter(samples), cond, lat)
    assert n == 4
    assert pre.is_cached()
    items = list(pre)
    assert len(items) == 4
    c0, l0 = items[0]
    assert c0["caption"] == "c0"
    np.testing.assert_array_equal(l0["latents"], np.zeros((1, 2, 2)))

    mem = InMemoryPreprocessor(iter(samples), cond, lat, num_items=2)
    buf = mem.consume()
    assert len(buf) == 2
