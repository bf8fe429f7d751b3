"""Process-worker loader (DATA_PIPE.WORKER_PROCESSES) — torch num_workers
process semantics on top of the same DataLoader surface.

The contract under test: for a deterministic dataset, the process path
yields byte-identical batches in identical order to the thread path (same
shuffle function of (seed, epoch)); workers persist across epochs; worker
exceptions propagate with their traceback; abandoned iterators don't leak
stale batches into the next epoch; close() reaps every child process.
Reference worker semantics: /root/reference/train_src.py:16-25
(torch DataLoader num_workers=4).
"""

import multiprocessing

import numpy as np
import pytest

from rnd_semantic_segmentation_tpu.data.datasets import SyntheticDataset
from rnd_semantic_segmentation_tpu.data.loader import DataLoader


def _ds(n=13, size=(16, 16)):
    # transform=None keeps __getitem__ a pure function of the index
    return SyntheticDataset(size=size, num_classes=3, transform=None,
                            seed=0, length=n)


def _epoch(loader, epoch):
    loader.set_epoch(epoch)
    return [(b["image"].copy(), b["label"].copy(), list(b["name"]))
            for b in loader]


def _assert_epochs_equal(got, want):
    assert len(got) == len(want)
    for (gi, gl, gn), (wi, wl, wn) in zip(got, want):
        np.testing.assert_array_equal(gi, wi)
        np.testing.assert_array_equal(gl, wl)
        assert gn == wn


class _PoisonDataset(SyntheticDataset):
    """Raises inside the worker for one index."""

    def __getitem__(self, index):
        if index == 5:
            raise ValueError("poison index 5")
        return super().__getitem__(index)


def test_matches_thread_loader_shuffled():
    ds = _ds()
    kw = dict(batch_size=4, shuffle=True, drop_last=True, seed=7)
    thread = DataLoader(ds, num_workers=2, **kw)
    proc = DataLoader(ds, worker_processes=2, **kw)
    try:
        for epoch in (0, 1):  # also proves the pool survives epochs
            _assert_epochs_equal(_epoch(proc, epoch), _epoch(thread, epoch))
    finally:
        proc.close()


def test_matches_thread_loader_tail_batch():
    ds = _ds(n=10)
    kw = dict(batch_size=4, shuffle=False, drop_last=False)
    thread = DataLoader(ds, num_workers=2, **kw)
    proc = DataLoader(ds, worker_processes=3, **kw)
    try:
        got, want = _epoch(proc, 0), _epoch(thread, 0)
        _assert_epochs_equal(got, want)
        assert got[-1][0].shape[0] == 2  # 10 = 4+4+2
    finally:
        proc.close()


def test_process_shard_matches_thread_path():
    ds = _ds(n=16)
    kw = dict(batch_size=4, shuffle=True, drop_last=True, seed=3,
              process_shard=True, process_count=2)
    for rank in (0, 1):
        thread = DataLoader(ds, process_index=rank, **kw)
        proc = DataLoader(ds, process_index=rank, worker_processes=2, **kw)
        try:
            _assert_epochs_equal(_epoch(proc, 0), _epoch(thread, 0))
        finally:
            proc.close()


def test_worker_exception_propagates():
    loader = DataLoader(_PoisonDataset(size=(16, 16), num_classes=3,
                                       transform=None, seed=0, length=13),
                        batch_size=4, shuffle=False, drop_last=True,
                        worker_processes=2)
    try:
        with pytest.raises(RuntimeError, match="poison index 5"):
            list(loader)
    finally:
        loader.close()


def test_abandoned_iterator_does_not_poison_next_epoch():
    ds = _ds(n=16)
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                        seed=11, worker_processes=2)
    thread = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                        seed=11, num_workers=2)
    try:
        loader.set_epoch(0)
        next(iter(loader))  # abandon mid-epoch with batches in flight
        _assert_epochs_equal(_epoch(loader, 1), _epoch(thread, 1))
    finally:
        loader.close()


def test_close_reaps_children():
    before = {p.pid for p in multiprocessing.active_children()}
    loader = DataLoader(_ds(), batch_size=4, shuffle=False, drop_last=True,
                        worker_processes=2)
    list(loader)
    spawned = [p for p in multiprocessing.active_children()
               if p.pid not in before]
    assert len(spawned) == 2
    loader.close()
    for p in spawned:
        p.join(timeout=5)
        assert not p.is_alive()
