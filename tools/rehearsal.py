"""Integrated sustained-training rehearsal through the REAL driver
(VERDICT r4 #4).

Every prior perf number isolated one stage (tools/bench_train.py jits
the step alone; tools/bench_eval_batch.py decodes alone).  This tool
runs `main.py` itself — packed-cache loader -> fit_epoch -> val eval
writing all three JSONs -> best-by-CIDEr checkpoint -> kill -> resume
and continue — at flagship MODEL dims on the real chip, and records
the integrated segments/s next to bench_train's device-only rate.

Mirrors the reference's own 1-GPU training double-check
(/root/reference/README.md:30-33) — the one smoke test that had never
run as a single command on real hardware at real dims.

Scale notes (documented constraints, not hidden caps):
  * model dims are flagship (rnn 1024, 1000 ROIs, 480 frames, vocab
    ~4.9k via n_extra_words); detect_size is the synthetic 12 (vs 431)
    — the (C+1, R) grounder matmul is the only dim that shrinks.
  * steps/epoch is bounded by DISK, not design: one packed flagship
    segment is ~14 MB, so 2400 train segments (~10 steps/epoch at
    batch 240) + 240 val segments cost ~66 GB raw+packed on this
    120 GB box.  Sustained-system behavior (prefetch overlap, logging,
    checkpoint stalls) is exercised by consecutive steps across many
    epochs instead: 6 epochs = 60 steps, >= 6 val evals, >= 6
    checkpoint writes, one mid-run resume.

Usage:
  python tools/rehearsal.py [--root /tmp/gvd_rehearsal]
      [--n_train_videos 1200] [--n_val_videos 120]
      [--epochs_phase1 2] [--epochs_total 6] [--keep]

Writes REHEARSAL_r05.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def rehearsal_cfg(smoke: bool):
    from grounded_video_description_tpu.config import (
        GVDConfig, tiny_test_config)
    return tiny_test_config() if smoke else GVDConfig().validate()


def generate_dataset(data_root: str, n_train_videos: int,
                     n_val_videos: int, smoke: bool = False) -> dict:
    from grounded_video_description_tpu.data.synthetic_files import (
        write_synthetic_dataset)

    cfg = rehearsal_cfg(smoke)            # flagship geometry defaults
    t0 = time.time()
    paths = write_synthetic_dataset(
        data_root, cfg, n_train=n_train_videos, n_val=n_val_videos,
        seed=7, n_extra_words=0 if smoke else 4860)  # ~4.9k vocab
    print(f"[rehearsal] dataset written in {time.time() - t0:.0f}s "
          f"({n_train_videos}+{n_val_videos} videos x 2 segments)",
          flush=True)
    return paths


def driver_argv(paths: dict, work: str, max_epochs: int,
                smoke: bool = False, batch: int = 240) -> list:
    argv = [sys.executable, os.path.join(ROOT, "main.py")]
    for k, v in paths.items():
        if k == "densecap_references":
            argv += ["--densecap_references"] + list(v)
        else:
            argv += [f"--{k}", str(v)]
    if smoke:
        cfg = rehearsal_cfg(True)
        for f in ("rnn_size", "input_encoding_size", "att_hid_size",
                  "fc_feat_size", "rgb_feat_size", "motion_feat_size",
                  "att_feat_size", "t_attn_size", "num_sampled_frm",
                  "num_prop_per_frm", "glove_dim", "loc_encoding_size",
                  "seg_info_size", "seq_length"):
            argv += [f"--{f}", str(getattr(cfg, f))]
        argv += ["--batch_size", str(batch), "--grad_accum", "1"]
    else:
        argv += ["--batch_size", str(batch), "--grad_accum", "8",
                 "--dtype", "bfloat16", "--obj_interact",
                 # the axon tunnel retains un-acked h2d uploads; the
                 # per-step sync bounds them to one batch (the OOM
                 # killer ended the first phase-1 attempt at 130 GB
                 # host RSS — config.host_sync_every_step)
                 "--host_sync_every_step"]
    argv += [
        "--w_att2", "0.05", "--w_cls", "0.1",
        "--max_epochs", str(max_epochs), "--val_every_epoch", "1",
        "--language_eval", "--eval_obj_grounding",
        "--eval_obj_grounding_gt",
        "--disp_interval", "2", "--seed", "7", "--id", "rehearsal",
        "--packed_cache_dir", os.path.join(work, "packed"),
        "--checkpoint_path", os.path.join(work, "save"),
        "--log_jsonl", os.path.join(work, "log.jsonl"),
    ]
    return argv


def run_phase(argv: list, work: str, tag: str,
              smoke: bool = False) -> float:
    env = dict(os.environ)
    if smoke:
        env["GVD_PLATFORM"] = "cpu"
    t0 = time.time()
    res = subprocess.run(argv, cwd=work, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, env=env)
    dt = time.time() - t0
    log_path = os.path.join(work, f"driver_{tag}.log")
    with open(log_path, "w") as f:
        f.write(res.stdout)
    print(f"[rehearsal] phase {tag}: exit {res.returncode} in {dt:.0f}s "
          f"(log: {log_path})", flush=True)
    if res.returncode != 0:
        print(res.stdout[-4000:])
        raise SystemExit(f"driver phase {tag} failed")
    return dt


def parse_log(work: str) -> dict:
    """Per-epoch integrated time/batch (last cumulative entry per
    epoch), val stats, and resume evidence."""
    per_epoch_tpb: dict = {}
    val_stats: dict = {}
    with open(os.path.join(work, "log.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "time_per_batch" in rec:
                # a NaN loss anywhere poisons the cumulative epoch
                # averages — fail the rehearsal loudly (this is how
                # the round-5 cls-BCE flush-to-zero NaN was caught)
                bad = [k for k in ("loss", "lm_loss", "att2_loss",
                                   "ground_loss", "cls_loss")
                       if k in rec and rec[k] != rec[k]]
                if bad:
                    raise SystemExit(
                        f"NaN training loss {bad} at epoch "
                        f"{rec['epoch']} step {rec.get('step')} — see "
                        f"{work}/log.jsonl")
                per_epoch_tpb[rec["epoch"]] = rec["time_per_batch"]
            if rec.get("split") == "validation":
                val_stats[rec["epoch"]] = {
                    k: rec[k] for k in
                    ("CIDEr", "Bleu_4", "METEOR", "grd_f1_all",
                     "grd_f1_loc", "box_accu_att", "box_accu_grd",
                     "cls_accu", "captions_per_sec") if k in rec}
    return {"time_per_batch": per_epoch_tpb, "val": val_stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/gvd_rehearsal")
    ap.add_argument("--n_train_videos", type=int, default=1200)
    ap.add_argument("--n_val_videos", type=int, default=120)
    ap.add_argument("--epochs_phase1", type=int, default=2)
    ap.add_argument("--epochs_total", type=int, default=6)
    ap.add_argument("--keep", action="store_true",
                    help="keep the dataset + checkpoints afterwards")
    ap.add_argument("--reuse_data", action="store_true",
                    help="reuse an existing dataset under --root")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny dims on the CPU backend: validates the "
                         "tool plumbing without touching the chip")
    ap.add_argument("--batch", type=int, default=240)
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "REHEARSAL_r05.json"))
    args = ap.parse_args()
    if args.smoke:
        args.n_train_videos = min(args.n_train_videos, 4)
        args.n_val_videos = min(args.n_val_videos, 2)
        args.batch = 2

    data_root = os.path.join(args.root, "data")
    work = os.path.join(args.root, "work")
    paths_file = os.path.join(args.root, "paths.json")
    if args.reuse_data and os.path.isfile(paths_file):
        with open(paths_file) as f:
            paths = json.load(f)
    else:
        os.makedirs(args.root, exist_ok=True)
        paths = generate_dataset(data_root, args.n_train_videos,
                                 args.n_val_videos, smoke=args.smoke)
        with open(paths_file, "w") as f:
            json.dump(paths, f)
    os.makedirs(work, exist_ok=True)

    # phase 1: fresh run (includes the one-off packed-cache build)
    dt1 = run_phase(
        driver_argv(paths, work, args.epochs_phase1,
                    smoke=args.smoke, batch=args.batch),
        work, "phase1", smoke=args.smoke)
    parse_log(work)     # fail fast on NaN before paying for phase 2
    # phase 2: SAME checkpoint_path, higher max_epochs -> exercises the
    # crash/preemption auto-resume path (main.py:175-189), then keeps
    # training and validating
    dt2 = run_phase(
        driver_argv(paths, work, args.epochs_total,
                    smoke=args.smoke, batch=args.batch),
        work, "phase2", smoke=args.smoke)

    parsed = parse_log(work)
    resumed_at = None
    with open(os.path.join(work, "driver_phase2.log")) as f:
        for line in f:
            if line.startswith("resumed from"):
                resumed_at = line.strip()
    n_train_segs = args.n_train_videos * 2
    steps_per_epoch = n_train_segs // args.batch
    seg_s = {str(e): round(args.batch / t, 1)
             for e, t in parsed["time_per_batch"].items()}
    rec = {
        "metric": "integrated_driver_train_seg_per_sec",
        "per_epoch_seg_per_sec": seg_s,
        "steady_state_seg_per_sec": (
            max(list(seg_s.values())[1:], default=None)
            if len(seg_s) > 1 else None),
        "device_only_reference_seg_per_sec": 262.1,
        "steps_per_epoch": steps_per_epoch,
        "epochs": args.epochs_total,
        "batch_size": args.batch,
        "val_stats_per_epoch": parsed["val"],
        "resume_evidence": resumed_at,
        "phase1_wall_s": round(dt1, 1),
        "phase2_wall_s": round(dt2, 1),
        "artifacts_checked": sorted(
            p for p in (
                os.path.join("densecap_results",
                             "densecap-validation-rehearsal.json"),
                os.path.join("results",
                             "attn-gen-sent-results-validation-"
                             "rehearsal.json"),
                os.path.join("results",
                             "attn-gt-sent-results-validation-"
                             "rehearsal.json"),
                os.path.join("results",
                             "grd-gt-sent-results-validation-"
                             "rehearsal.json"),
            ) if os.path.isfile(os.path.join(work, p))),
        "config_notes": ("flagship model dims (rnn 1024, 1000 ROIs, 480 "
                         "frames, vocab ~4.9k), synthetic detect_size 12; "
                         "steps/epoch disk-bound (see tool docstring); "
                         "host feed on this 1-core box is the expected "
                         "binder vs the 262 device-only rate"),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))

    if not args.keep:
        shutil.rmtree(args.root, ignore_errors=True)


if __name__ == "__main__":
    main()
