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


def test_precompute_cross_rank_manifest(tmp_path):
    """Reuse validation (reference PrecomputedDistributedDataPreprocessor
    semantics): a corrupted or incomplete shard on ANY rank forces
    re-precompute instead of silent reuse."""
    import os

    samples = [{"x": i} for i in range(3)]
    cond = lambda s: {"embeds": np.full((1, 2), s["x"], np.float32)}
    lat = lambda s: {"latents": np.full((1, 2), s["x"], np.float32)}
    sig = {"buckets": [[9, 32, 32]]}

    pres = [PrecomputedPreprocessor(str(tmp_path), rank=r, world_size=2,
                                    signature=sig) for r in (0, 1)]
    assert not pres[0].is_cached()
    for p in pres:
        p.precompute(iter(samples), cond, lat)
    assert pres[0].is_cached() and pres[1].is_cached()

    # corrupt rank 1: delete one latent shard -> every rank refuses reuse
    victim = sorted(f for f in os.listdir(pres[1].dir) if f.startswith("lat_"))[0]
    os.remove(os.path.join(pres[1].dir, victim))
    assert not pres[0].is_cached()
    assert not pres[1].is_cached()
    # re-precompute on the damaged rank restores reuse for all
    pres[1].precompute(iter(samples), cond, lat)
    assert pres[0].is_cached()

    # signature change (different buckets) -> not cached, and the fresh pass
    # wipes stale files so replay can't mix configurations
    changed = PrecomputedPreprocessor(str(tmp_path), rank=0, world_size=2,
                                      signature={"buckets": [[5, 16, 16]]})
    assert not changed.is_cached()
    changed.precompute(iter(samples[:2]), cond, lat)
    assert len(changed) == 2  # old count was 3; stale shards gone


def test_precompute_incomplete_manifest_not_reused(tmp_path):
    """Files present but no manifest (a killed precompute pass) != cached."""
    samples = [{"x": 0}]
    cond = lambda s: {"e": np.zeros((1,), np.float32)}
    lat = lambda s: {"l": np.zeros((1,), np.float32)}
    pre = PrecomputedPreprocessor(str(tmp_path), rank=0)
    pre.precompute(iter(samples), cond, lat)
    import os

    os.remove(os.path.join(pre.dir, pre.MANIFEST))
    assert not pre.is_cached()


def test_precompute_world_size_shrink_not_reused(tmp_path):
    """A cache produced at world_size=4 must NOT be reused at world_size=2:
    the missing ranks' shards would be silently dropped."""
    samples = [{"x": i} for i in range(2)]
    cond = lambda s: {"e": np.zeros((1,), np.float32)}
    lat = lambda s: {"l": np.zeros((1,), np.float32)}
    for r in range(4):
        PrecomputedPreprocessor(str(tmp_path), rank=r, world_size=4).precompute(
            iter(samples), cond, lat)
    assert PrecomputedPreprocessor(str(tmp_path), rank=0, world_size=4).is_cached()
    assert not PrecomputedPreprocessor(str(tmp_path), rank=0, world_size=2).is_cached()
