"""On-disk ingest throughput at flagship dims (docs/DESIGN.md §Ingest).

Writes a synthetic dataset at production shapes (1000x2048 region
features + 480-frame features per segment, ~11 MB/segment), then times
the Loader end-to-end (threaded fetch + one-copy pack into batch
rows).  Prints one JSON line; pass --keep to reuse an existing dataset
dir across runs.

Usage: python tools/bench_ingest.py [--segments 240] [--batch 60]
       [--threads 8] [--root /tmp/gvd_ingest_bench] [--packed]

--packed measures the pack-once memmapped cache
(data/packed_cache.py) instead of the live assembly path: the cache is
built (or reused) under <root>/packed, then epochs are served from the
page cache as pure memcpy.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=240)
    ap.add_argument("--batch", type=int, default=60)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--root", default="/tmp/gvd_ingest_bench")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--packed_seq", action="store_true",
                    help="sequential zero-copy batches off the cache "
                         "(the eval-feed path)")
    args = ap.parse_args()

    import numpy as np

    from grounded_video_description_tpu.config import GVDConfig
    from grounded_video_description_tpu.data.dataset import (
        AnetDataset, Loader)
    from grounded_video_description_tpu.data.synthetic_files import (
        write_synthetic_dataset)

    cfg = GVDConfig(
        vocab_size=4905, detect_size=431, seq_per_img=1,
        learning_rate_decay_start=-1).validate()

    marker = os.path.join(args.root, ".complete")
    n_train_vids = args.segments // 2          # 2 segments per video
    if not os.path.isfile(marker):
        os.makedirs(args.root, exist_ok=True)
        print(f"writing {args.segments} flagship-dim segments to "
              f"{args.root} (~{args.segments * 11} MB)...")
        paths = write_synthetic_dataset(
            args.root, cfg, n_train=n_train_vids, n_val=1)
        with open(marker, "w") as f:
            json.dump(paths, f)
    with open(marker) as f:
        paths = json.load(f)
    cfg = cfg.replace(**{k: v for k, v in paths.items()
                         if k != "densecap_references"})

    ds = AnetDataset(cfg, split="training")
    path = "live assembly"
    if args.packed_seq:
        from grounded_video_description_tpu.data.packed_cache import (
            open_or_build)
        ds = open_or_build(ds, os.path.join(args.root, "packed"))
        # touch every byte once so measured epochs hit the page cache
        n = 0
        for b in ds.iter_batches(args.batch):
            n += int(b["seg_feat"].sum() * 0 + b["seg_feat"].shape[0])
        # (a) host cost of the zero-copy path itself: batch = views,
        # the actual bytes move inside the device transfer (page cache
        # -> PCIe), not on a host core
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.epochs):
            for b in ds.iter_batches(args.batch):
                n += b["seg_feat"].shape[0]
        view_dt = time.perf_counter() - t0
        # (b) the same batches with a forced host copy — what a
        # consumer that still materializes would pay (= the old bound)
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.epochs):
            for b in ds.iter_batches(args.batch):
                for k in ("seg_feat", "ppls_feat"):
                    np.array(b[k])
                n += b["seg_feat"].shape[0]
        copy_dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "ingest_seg_per_sec_host",
            "value": round(n / view_dt, 1), "unit": "segments/s",
            "host_copy_seg_per_sec": round(n / copy_dt, 1),
            "config": (f"{len(ds)} segments, batch {args.batch}, "
                       "sequential zero-copy memmap batches (eval-feed "
                       "path): value = view handoff only (bytes move "
                       "in the device transfer), host_copy = forced "
                       "full materialization, warm page cache")}))
        return
    if args.packed:
        from grounded_video_description_tpu.data.packed_cache import (
            open_or_build)
        t0 = time.perf_counter()
        ds = open_or_build(ds, os.path.join(args.root, "packed"))
        print(f"packed cache ready in {time.perf_counter() - t0:.1f}s")
        path = "pack-once memmap cache"
    loader = Loader(ds, args.batch, shuffle=True, seed=0,
                    num_threads=args.threads)
    # warm epoch populates the page cache so the measured epochs time
    # the CPU pack path, not cold disk
    n = 0
    for b in loader:
        n += b["seg_feat"].shape[0]
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.epochs):
        for b in loader:
            n += b["seg_feat"].shape[0]
    dt = time.perf_counter() - t0
    rec = {
        "metric": "ingest_seg_per_sec_host",
        "value": round(n / dt, 2),
        "unit": "segments/s",
        "config": (f"{len(ds)} on-disk segments, batch {args.batch}, "
                   f"{args.threads} threads, {path}, flagship "
                   "dims, warm page cache"),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
