"""Host-pipeline overlap model (VERDICT r3 item 5).

Answers "is the chip input-starved?" with measurement instead of
extrapolation: drive a REAL loader (decode -> augment -> collate, the
exact pipeline build_dataset assembles) against a consumer paced at the
family's measured device rate, and account every wall-clock second to
either device-busy or data-wait.  The same accounting runs live inside
Trainer.train (the `data` meter), so a number produced here is directly
comparable to a production log line.

Reference counterpart: torch DataLoader worker processes + pin_memory
(/root/reference/train_src.py:16-25); torch hides starvation until you
profile — here it is a first-class, always-on meter.
"""

from __future__ import annotations

import time
from typing import Dict, Optional


def measure_overlap(loader, device_rate_img_per_sec: float,
                    max_batches: Optional[int] = None,
                    warmup_batches: int = 1) -> Dict:
    """Run ``loader`` against an emulated device consuming
    ``device_rate_img_per_sec`` and measure the steady-state data-wait.

    The consumer "computes" by sleeping batch_size/rate per batch —
    sleeping releases the GIL exactly like a dispatched XLA step does, so
    loader worker threads overlap with it the same way they overlap with
    the real device.  The first ``warmup_batches`` fetches are excluded
    from the idle accounting (pipeline ramp, compile analog).

    Returns wall/idle/busy seconds, the achieved images/sec, the
    device_idle_fraction, and ``input_bound`` (idle fraction > 5%).
    """
    it = iter(loader)
    idle = busy = 0.0
    n_img = n_batch = 0
    # steady-state clock starts here for warmup_batches=0; each warmup batch
    # pushes it forward so the ramp never counts toward the measured wall
    wall0 = time.perf_counter()
    while max_batches is None or n_batch < max_batches:
        t0 = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            break
        waited = time.perf_counter() - t0
        bs = int(next(v.shape[0] for v in batch.values()
                      if hasattr(v, "shape")))
        n_batch += 1
        if n_batch > warmup_batches:
            idle += waited
            n_img += bs
        step = bs / device_rate_img_per_sec
        time.sleep(step)
        if n_batch > warmup_batches:
            busy += step
        else:
            wall0 = time.perf_counter()  # steady-state starts after ramp
    wall = time.perf_counter() - wall0
    frac = idle / wall if wall > 0 else 0.0
    return {
        "device_rate_img_per_sec": round(device_rate_img_per_sec, 2),
        "batches": n_batch,
        "wall_s": round(wall, 3),
        "data_wait_s": round(idle, 3),
        "device_busy_s": round(busy, 3),
        "achieved_img_per_sec": round(n_img / wall, 2) if wall > 0 else 0.0,
        "device_idle_fraction": round(frac, 4),
        "input_bound": bool(frac > 0.05),
    }


def stage_times(dataset, transform_tag: str, n: int = 16) -> Dict:
    """Per-stage cost of one pipeline item: full __getitem__ (decode +
    augment) in ms/item, measured on the first ``n`` items."""
    n = min(n, len(dataset))
    t0 = time.perf_counter()
    for i in range(n):
        dataset[i]
    dt = time.perf_counter() - t0
    return {"pipeline": transform_tag,
            "getitem_ms_per_item": round(1000 * dt / n, 2)}
