"""Host data loader with worker threads + device prefetch.

Replaces ``torch.utils.data.DataLoader(num_workers=4, pin_memory, drop_last)``
(/root/reference/train_src.py:16-25) with a thread-pool pipeline:
decode/augment runs on host threads (PIL/numpy release the GIL for the heavy
parts), batches are stacked NHWC, and ``device_prefetch`` keeps
``cfg.DATA_PIPE.PREFETCH`` batches in flight to the device so TPU steps never
wait on the host — the double-buffered HBM feed from the north-star design.

Collate conventions preserved (core/datasets/func.py:8-46): uint8 HWC images
-> float/255; already-float images pass through; labels -> int32 [B,H,W].
"""

from __future__ import annotations

import multiprocessing
import queue
import random
import threading
import traceback
import weakref
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def preprocess_eval_image(image, transform):
    """PIL image -> model-input float32 HWC via a test transform, applying
    EXACTLY the collate rescale rule: uint8 outputs (identity pipelines)
    are divided by 255, float outputs (normalizing pipelines like aspp's
    Normalize) pass through.  A value-based heuristic (``max() > 1.5``)
    is wrong here — normalized outputs legitimately exceed 1.5 for bright
    pixels and would get destroyed by a second /255."""
    import numpy as np
    from PIL import Image as _PILImage

    dummy = _PILImage.fromarray(
        np.zeros(image.size[::-1], np.float32))
    img, _ = transform(image, dummy)
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def default_collate(samples):
    images, labels, names = zip(*samples)
    images = np.stack([np.asarray(im) for im in images], axis=0)
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 255.0
    labels = np.stack([np.asarray(l) for l in labels], axis=0)
    if labels.ndim == 4:  # [B,H,W,1] -> [B,H,W]
        labels = labels[..., 0]
    labels = labels.astype(np.int32)
    return {"image": images.astype(np.float32), "label": labels,
            "name": list(names)}


# collate registry mirroring build_collate_fn (core/datasets/build.py:5-13);
# with NHWC-native arrays the attn/pranet collates reduce to the default.
COLLATE_FNS = {"attn": default_collate, "pranet": default_collate,
               None: default_collate, "None": default_collate}


def build_collate_fn(cfg):
    return COLLATE_FNS.get(cfg.AUG.COLLATE, default_collate)


def _worker_main(dataset, collate_fn, task_q, result_q, seed, worker_id):
    """Loader worker process body: pull (serial, seq, indices) tasks, push
    (serial, seq, batch, err) results.  Runs dataset.__getitem__ + collate
    only — NO jax — so forking from a process with an initialized TPU/CPU
    backend is safe (the child never touches the inherited client).
    Global RNGs are reseeded per worker (torch worker_init semantics), so
    augmentation draws decorrelate across workers; like torch, the random
    stream is NOT reproducible across different worker counts."""
    np.random.seed((int(seed) + 7919 * (worker_id + 1)) % (2 ** 32))
    random.seed(int(seed) + 104729 * (worker_id + 1))
    while True:
        task = task_q.get()
        if task is None:
            return
        serial, seq, idxs = task
        try:
            batch = collate_fn([dataset[i] for i in idxs])
            result_q.put((serial, seq, batch, None))
        except BaseException:  # surface the full worker traceback in parent
            result_q.put((serial, seq, None, traceback.format_exc()))


class _ProcessPool:
    """Persistent fork-based loader workers — the process analog of torch
    ``DataLoader(num_workers=N)`` (/root/reference/train_src.py:16-25).

    Threads cannot parallelize the pure-Python/PIL per-item residue (the GIL;
    BENCH_HOST.json measured the thread pool flat 1→8 on this host), so hosts
    with cores to spare get real processes: the dataset is inherited by fork
    (copy-on-write — no pickling of PIL/ctypes handles), each worker owns a
    task queue (round-robin by batch seq), and one shared result queue feeds
    a reorder buffer in the parent so batch order is deterministic and
    identical to the thread loader's.  Results carry an iteration serial so
    an abandoned epoch's in-flight batches are discarded, not misdelivered.

    Fork-safety: like torch's fork-start workers, forking a process that
    already runs JAX dispatch threads can, in principle, inherit a held
    lock (malloc arena, RPC client) and hang the child.  Workers never
    call jax, DataLoader spawns the pool EAGERLY at construction (in the
    CLIs that is before the first device dispatch), and get() carries a
    stall watchdog that turns a silent hang into an actionable error
    instead of an infinite wait."""

    _GET_TIMEOUT_S = 5.0
    _STALL_LIMIT_S = 300.0  # alive-but-silent workers: raise, don't hang

    def __init__(self, dataset, collate_fn, num_procs: int, seed: int):
        ctx = multiprocessing.get_context("fork")
        self._result_q = ctx.Queue()
        self._task_qs = [ctx.Queue() for _ in range(num_procs)]
        self._procs = []
        for wid, tq in enumerate(self._task_qs):
            p = ctx.Process(
                target=_worker_main,
                args=(dataset, collate_fn, tq, self._result_q, seed, wid),
                daemon=True)
            p.start()
            self._procs.append(p)
        self._closed = False

    def submit(self, serial: int, seq: int, idxs) -> None:
        self._task_qs[seq % len(self._task_qs)].put(
            (serial, seq, [int(i) for i in idxs]))

    def get(self, serial: int):
        """Next (seq, batch) for this iteration serial; skips stale epochs."""
        waited = 0.0
        while True:
            try:
                got_serial, seq, batch, err = self._result_q.get(
                    timeout=self._GET_TIMEOUT_S)
            except queue.Empty:
                dead = [p for p in self._procs if not p.is_alive()]
                if dead:
                    self.close()
                    raise RuntimeError(
                        "loader worker process(es) died: "
                        + ", ".join(f"pid={p.pid} exitcode={p.exitcode}"
                                    for p in dead))
                waited += self._GET_TIMEOUT_S
                if waited >= self._STALL_LIMIT_S:
                    self.close()
                    raise RuntimeError(
                        f"loader workers alive but silent for {waited:.0f}s "
                        "— likely a fork-inherited lock (fork after heavy "
                        "threading) or a stuck __getitem__; reduce "
                        "DATA_PIPE.WORKER_PROCESSES to 0 (thread pool) or "
                        "construct loaders before first device use")
                continue
            waited = 0.0
            if got_serial != serial:
                continue  # leftover from an abandoned iterator
            if err is not None:
                self.close()
                raise RuntimeError(f"loader worker failed:\n{err}")
            return seq, batch

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        for tq in self._task_qs:
            try:
                tq.put(None)
            except (ValueError, OSError):
                pass
        for p in self._procs:
            p.join(timeout=5)
        for p in self._procs:
            if p.is_alive():
                p.terminate()
                p.join(timeout=5)
        for q_ in [*self._task_qs, self._result_q]:
            q_.cancel_join_thread()
            q_.close()


class DataLoader:
    """``process_shard=True`` gives DistributedSampler semantics
    (train_adv.py:22-27): every process sees a disjoint, epoch-shuffled
    slice; the per-process batch_size should be global/process_count.

    ``worker_processes>0`` switches decode/augment/collate from the thread
    pool to that many forked worker processes (torch ``num_workers``
    semantics — see _ProcessPool); batch contents and order are identical
    for deterministic datasets."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 collate_fn=None, seed: int = 0, process_shard: bool = False,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 worker_processes: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.collate_fn = collate_fn or default_collate
        self.seed = seed
        self._epoch = 0  # advanced per __iter__; see set_epoch
        self.process_shard = process_shard
        if process_shard:
            if process_index is None or process_count is None:
                import jax
                process_index = jax.process_index()
                process_count = jax.process_count()
        self.process_index = process_index or 0
        self.process_count = process_count or 1
        self.worker_processes = int(worker_processes)
        self._pool: Optional[_ProcessPool] = None
        self._iter_serial = 0  # bumped per __iter__; stale results discarded
        if self.worker_processes > 0:
            # fork EAGERLY: at construction time (the CLIs build loaders
            # before the first device dispatch) far fewer threads are live
            # than at first-iteration time inside the Trainer
            self._ensure_pool()

    def _local_len(self) -> int:
        n = len(self.dataset)
        if self.process_shard:
            n = n // self.process_count  # even split, DistributedSampler-style
        return n

    def __len__(self):
        n = self._local_len()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle order for the NEXT iteration to a pure function of
        (seed, epoch) — torch DistributedSampler.set_epoch semantics.  This
        makes resume-from-checkpoint replay-exact: an interrupted run that
        restarts at epoch k shuffles epoch k identically to an uninterrupted
        run (tests/test_preemption.py), and multi-process shards stay
        consistent because every process derives the same global order."""
        self._epoch = int(epoch)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.shuffle:
            order = np.random.default_rng(
                (self.seed, self._epoch)).permutation(len(self.dataset))
            self._epoch += 1  # callers that never set_epoch still get a
            #                   fresh shuffle each pass
        else:
            order = np.arange(len(self.dataset))
        if self.process_shard:
            per = len(self.dataset) // self.process_count
            order = order[self.process_index::self.process_count][:per]
        if self.drop_last:
            order = order[: len(self) * self.batch_size]
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]

        if self.worker_processes > 0:
            yield from self._iter_procs(batches)
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # pipeline two batches ahead of the consumer
            pending = []
            for idxs in batches:
                pending.append(pool.map(self.dataset.__getitem__, idxs))
                if len(pending) > 2:
                    yield self.collate_fn(list(pending.pop(0)))
            for fut in pending:
                yield self.collate_fn(list(fut))

    def _ensure_pool(self) -> _ProcessPool:
        if self._pool is None or self._pool._closed:
            pool = _ProcessPool(self.dataset, self.collate_fn,
                                self.worker_processes, self.seed)
            # tie worker lifetime to the loader object, not the interpreter
            weakref.finalize(self, _ProcessPool.close, pool)
            self._pool = pool
        return self._pool

    def _iter_procs(self, batches) -> Iterator[Dict[str, np.ndarray]]:
        pool = self._ensure_pool()
        self._iter_serial += 1
        serial = self._iter_serial
        depth = max(2 * self.worker_processes, 2)  # in-flight batch cap
        next_submit = next_yield = 0
        reorder: Dict[int, dict] = {}
        while next_yield < len(batches):
            while next_submit < len(batches) and \
                    next_submit - next_yield < depth:
                pool.submit(serial, next_submit, batches[next_submit])
                next_submit += 1
            while next_yield not in reorder:
                seq, batch = pool.get(serial)
                reorder[seq] = batch
            yield reorder.pop(next_yield)
            next_yield += 1

    def close(self) -> None:
        """Shut down worker processes (no-op for the thread path)."""
        if self._pool is not None:
            self._pool.close()
            self._pool = None


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Keeps `size` device batches in flight (async dispatch does the overlap)."""
    import jax

    def put(batch):
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in batch.items() if not isinstance(v, np.ndarray)}
        if sharding is not None:
            arrays = {k: jax.device_put(v, sharding) for k, v in arrays.items()}
        else:
            arrays = {k: jax.device_put(v) for k, v in arrays.items()}
        return {**arrays, **rest}

    buf = []
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
