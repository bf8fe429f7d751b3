"""Loader prefetch/overlap proof (VERDICT r3 item 5).

Two claims, measured rather than assumed:
  1. The DataLoader's thread pipeline actually overlaps item production
     with consumption — wall clock approaches max(producer, consumer),
     not their sum.
  2. The overlap model (data/overlap.py, same accounting as the Trainer's
     `data` meter) correctly classifies a fast-producer/slow-consumer run
     as NOT input-bound and a slow-producer/fast-consumer run as
     input-bound.

Sleeps release the GIL just like dispatched XLA steps, so these hold even
on this 1-core host.
"""

import time

import numpy as np

from rnd_semantic_segmentation_tpu.data import DataLoader
from rnd_semantic_segmentation_tpu.data.overlap import measure_overlap


class SleepDataset:
    """Each item costs ``item_s`` of (GIL-released) latency."""

    def __init__(self, n=16, item_s=0.03):
        self.n = n
        self.item_s = item_s

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.item_s)
        return (np.zeros((8, 8, 3), np.float32),
                np.zeros((8, 8), np.int32), str(i))


def _loader(ds, workers=2, bs=2):
    return DataLoader(ds, batch_size=bs, shuffle=False, drop_last=True,
                      num_workers=workers)


def test_producer_consumer_overlap():
    # Empirical serial baseline (producer alone, then consumer cost added
    # arithmetically) absorbs host-load noise on this 1-core machine;
    # retry because it is still a wall-clock race under a loaded suite.
    ds = SleepDataset(n=16, item_s=0.03)
    consume = 8 * 0.03  # 8 batches x 30ms consumer step
    last = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in _loader(ds):
            pass
        produce = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in _loader(ds):
            time.sleep(0.03)
        wall = time.perf_counter() - t0

        serial = produce + consume
        last = f"wall {wall:.3f}s vs serial {serial:.3f}s"
        if wall < 0.85 * serial:
            return
    raise AssertionError(f"no producer/consumer overlap: {last}")


def test_overlap_model_not_input_bound_when_producer_fast():
    # producer: 2 workers x 5ms items, batch 2 -> ~200 img/s sustained;
    # consumer: 25 img/s.  Chip never starves.
    ds = SleepDataset(n=32, item_s=0.005)
    r = measure_overlap(_loader(ds), device_rate_img_per_sec=25)
    assert r["input_bound"] is False, r
    assert r["device_idle_fraction"] < 0.05, r


def test_overlap_model_input_bound_when_producer_slow():
    # producer: 2 workers x 60ms items -> ~33 img/s; consumer wants 400
    # img/s.  Chip starves and the model must say so, with the idle
    # fraction matching the rate gap (~>0.5).
    ds = SleepDataset(n=32, item_s=0.06)
    r = measure_overlap(_loader(ds), device_rate_img_per_sec=400)
    assert r["input_bound"] is True, r
    assert r["device_idle_fraction"] > 0.5, r
    # achieved rate is capped by the producer, not the consumer budget
    assert r["achieved_img_per_sec"] < 100, r


def test_measure_overlap_warmup_zero_is_sane():
    """Regression: warmup_batches=0 must measure wall time from the start of
    the run (a latent bug left the steady-state clock unset and every metric
    collapsed to a ~0 denominator → astronomically wrong rates)."""
    ds = SleepDataset(n=8, item_s=0.005)
    res = measure_overlap(_loader(ds), device_rate_img_per_sec=400.0,
                          warmup_batches=0, max_batches=4)
    assert res["batches"] == 4
    # 4 batches x 2 imgs: wall must cover at least the device-step sleeps
    assert res["wall_s"] >= 4 * (2 / 400.0) * 0.5
    # rate bounded by physics: 8 images over >= ~40ms of real time
    assert 0 < res["achieved_img_per_sec"] < 8 / (4 * 2 / 400.0) * 2
