#!/usr/bin/env python
"""Host data-pipeline benchmark (VERDICT r1 weak #6 / next #8).

Measures decode->resize->normalize throughput of the native C++ loader
(native/segdata.cpp) vs the PIL fallback at the two serving geometries
(512x512 training crops, 1024x2048 Cityscapes eval), across thread counts,
and puts the numbers next to the device step times they must outrun.

Writes BENCH_HOST.json at the repo root and prints one JSON line per row.

Note on this harness host: it exposes a SINGLE CPU core (nproc=1), so
multi-thread rows measure queueing overhead, not scaling — the work-queue
design (segdata.cpp segdata_load_batch: atomic fetch_add over a shared index)
scales with cores by construction.  The decisive number is images/sec at
nthreads=1 vs the device img/s it must feed.

Reference counterpart: torch DataLoader worker processes
(/root/reference/train_src.py:16-25).
"""

import json
import os
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def make_corpus(n, w, h, fmt="jpg"):
    from PIL import Image

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="bench_host_")
    paths = []
    # low-frequency content: realistic JPEG entropy (pure noise over-penalises
    # the decoder); blocky random fields like synthetic data
    base = rng.rand(h // 8 + 1, w // 8 + 1, 3)
    for i in range(n):
        shift = rng.randint(0, 8, 2)
        arr = np.kron(np.roll(base, shift, axis=(0, 1)), np.ones((8, 8, 1)))
        arr = (arr[:h, :w] * 255).astype(np.uint8)
        p = f"{tmp}/img_{i}.{fmt}"
        if fmt == "jpg":
            Image.fromarray(arr).save(p, quality=90)
        else:
            Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def bench_case(paths, out_size, threads, reps=3):
    from rnd_semantic_segmentation_tpu.data.native_loader import (
        _load_batch_pil, load_batch, native_available)

    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    n = len(paths)

    def timeit(fn):
        fn()  # warm page cache
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return n * reps / (time.perf_counter() - t0)

    row = {"out_size": list(out_size), "nthreads": threads,
           "native_available": native_available()}
    row["native_images_per_sec"] = round(timeit(
        lambda: load_batch(paths, out_size, mean, std, num_threads=threads)), 1)
    if threads == 1:
        row["pil_images_per_sec"] = round(timeit(
            lambda: _load_batch_pil(paths, out_size, mean, std, 1 / 255.0)), 1)
    return row


def _family_device_rates():
    """Measured on-chip train rates (BENCH_FAMILIES.json when present)."""
    fallback = {"deeplab_resnet101": 106.2, "gald_hardnet68": 137.3,
                "pranet_res2net50": 390.0, "attn_efficientnet-b2": 146.8}
    path = os.path.join(REPO, "BENCH_FAMILIES.json")
    try:
        with open(path) as f:
            for row in json.load(f)["rows"]:
                if "train_images_per_sec" in row:
                    fallback[row["model"]] = row["train_images_per_sec"]
    except Exception:
        pass
    return fallback


# (family case, aug pipeline, train size, batch) matching bench_all geometry
OVERLAP_CASES = [
    ("deeplab_resnet101", "aspp", 512, 16),
    ("gald_hardnet68", "none", 512, 16),
    ("pranet_res2net50", "pra", 352, 16),
    ("attn_efficientnet-b2", "attn", 512, 16),
]


def make_kvasir_corpus(n, w=1280, h=720):
    """Kvasir-style on-disk layout the real KvasirDataSet globs:
    <root>/kvasir/fold_1/{images,masks}/img_i.png (cross_val=0 -> train)."""
    from PIL import Image

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="bench_overlap_")
    img_dir = os.path.join(tmp, "kvasir", "fold_1", "images")
    msk_dir = os.path.join(tmp, "kvasir", "fold_1", "masks")
    os.makedirs(img_dir)
    os.makedirs(msk_dir)
    base = rng.rand(h // 8 + 1, w // 8 + 1, 3)
    for i in range(n):
        shift = rng.randint(0, 8, 2)
        arr = np.kron(np.roll(base, shift, axis=(0, 1)), np.ones((8, 8, 1)))
        arr = (arr[:h, :w] * 255).astype(np.uint8)
        Image.fromarray(arr).save(f"{img_dir}/img_{i}.png")
        Image.fromarray((arr[..., 0] > 128).astype(np.uint8)).save(
            f"{msk_dir}/img_{i}.png")
    return tmp


def bench_overlap(data_root, repeats=6, workers=None, procs=0):
    """The measured overlap model (VERDICT r3 item 5): real
    decode->augment->collate pipeline vs a consumer paced at each family's
    chip-measured train rate; emits device_idle_fraction + input_bound per
    family.  Same accounting as Trainer.train's `data` meter."""
    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.data import (
        DataLoader, build_collate_fn, build_dataset)
    from rnd_semantic_segmentation_tpu.data.overlap import (
        measure_overlap, stage_times)

    rates = _family_device_rates()
    ncores = os.cpu_count() or 1
    workers = workers or max(ncores, 2)
    out = []
    for model, aug, size, batch in OVERLAP_CASES:
        cfg = get_default_cfg()
        cfg.MODEL.NAME = model
        cfg.MODEL.NUM_CLASSES = 2
        cfg.DATASETS.SOURCE_TRAIN = "kvasir_train"
        cfg.DATASETS.DATASET_DIR = data_root
        cfg.AUG.NAME = aug
        if aug == "attn":
            cfg.AUG.COLLATE = "attn"
        cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN = (size, size)
        cfg.INPUT.TRAINSIZE = size
        cfg.DATA_PIPE.NATIVE_DECODE = True
        ds = build_dataset(cfg, "train", True)
        stage = stage_times(ds, aug)
        ds.image_paths = ds.image_paths * repeats  # enough steady-state batches
        loader = DataLoader(ds, batch_size=batch, shuffle=True,
                            drop_last=True, num_workers=workers,
                            collate_fn=build_collate_fn(cfg))
        row = {"model": model, "aug": aug, "size": size, "batch": batch,
               "workers": workers, **stage,
               **measure_overlap(loader, rates[model])}
        if procs:
            # A/B: forked worker processes (DATA_PIPE.WORKER_PROCESSES) vs
            # the thread pool — the GIL-bound Python/PIL per-item residue
            # only parallelizes in the process path on many-core hosts
            ploader = DataLoader(ds, batch_size=batch, shuffle=True,
                                 drop_last=True, worker_processes=procs,
                                 collate_fn=build_collate_fn(cfg))
            prow = measure_overlap(ploader, rates[model])
            ploader.close()
            row.update({f"{k}_procs": v for k, v in prow.items()})
            row["worker_processes"] = procs
        # how many decode workers a host needs so the chip never starves
        row["workers_needed"] = round(
            rates[model] * stage["getitem_ms_per_item"] / 1000, 2)
        # DATA_PIPE.DEVICE_AUG residue: the host Augmenter reduces to its
        # variable-shape stub (crop / identity) and the per-pixel math moves
        # into the jitted device pipeline (data/device_pipe.py) — measure
        # the host ms/item that buys back
        cfg_d = cfg.clone()
        cfg_d.DATA_PIPE.DEVICE_AUG = True
        stage_d = stage_times(build_dataset(cfg_d, "train", True), aug)
        row["getitem_ms_per_item_device_aug"] = stage_d["getitem_ms_per_item"]
        row["workers_needed_device_aug"] = round(
            rates[model] * stage_d["getitem_ms_per_item"] / 1000, 2)
        out.append(row)
        print(json.dumps(row), flush=True)
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=0,
                    help="also A/B the overlap rows with this many forked "
                         "worker processes (DATA_PIPE.WORKER_PROCESSES)")
    args = ap.parse_args()
    ncores = os.cpu_count() or 1
    rows = []
    # 512^2 training-crop geometry from 1280x720 JPEGs (Kvasir-like)
    corpus_small = make_corpus(32, 1280, 720, "jpg")
    # Cityscapes eval geometry: full-res 2048x1024 PNG -> 1024x2048 is native
    corpus_big = make_corpus(8, 2048, 1024, "png")
    for threads in (1, 2, 4, 8):
        rows.append(bench_case(corpus_small, (512, 512), threads))
        rows.append(bench_case(corpus_big, (1024, 2048), threads, reps=2))

    result = {
        "host_cores": ncores,
        "note": ("single-core harness host: >1-thread rows bound by the one "
                 "core; per-core throughput is the scaling unit"),
        "rows": rows,
        # device-side step rates the host must outrun (bench_all.py, v5e):
        "device_budget": {
            "deeplab_train_512_img_per_sec": 107,
            "gald_eval_1024x2048_img_per_sec": 18,
        },
    }
    for r in rows:
        print(json.dumps(r), flush=True)
    one_t_small = rows[0]["native_images_per_sec"]
    one_t_big = rows[1]["native_images_per_sec"]
    result["verdict"] = {
        "workers_needed_deeplab_train": round(107 / max(one_t_small, 1e-9), 2),
        "workers_needed_gald_eval": round(18 / max(one_t_big, 1e-9), 2),
    }
    # measured overlap model: real pipeline vs chip-rate consumer, per family
    corpus_root = make_kvasir_corpus(32)
    result["overlap"] = bench_overlap(corpus_root, procs=args.procs)
    result["overlap_verdict"] = {
        r["model"]: {"input_bound_on_this_host": r["input_bound"],
                     "device_idle_fraction": r["device_idle_fraction"],
                     "workers_needed_on_manycore_host": r["workers_needed"],
                     "workers_needed_with_device_aug": r["workers_needed_device_aug"]}
        for r in result["overlap"]}
    print(json.dumps({"summary": result["verdict"],
                      "overlap_verdict": result["overlap_verdict"],
                      "host_cores": ncores}), flush=True)
    with open(os.path.join(REPO, "BENCH_HOST.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
