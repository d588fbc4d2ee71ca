"""Grounding-metric delta of the default-on bf16 Pallas kernels at
trained weights (VERDICT r4 #2).

The kernel-promotion policy gated `use_pallas_encoder` /
`use_pallas_rnn` on caption-TOKEN agreement (>= 0.99 at trained
weights, TRAINED_AGREEMENT.json), but the grounding metric family
consumes region-attention ARGMAXES (att2_ind per-frame boxes,
engine/evaluator.py; reference main.py:361-384 and 129-153), where the
encoder kernel's trained-weights agreement is only ~0.93.  This tool
closes that blind spot: it runs the FULL eval stack — generated-
sentence grounding (grd_eval all/loc) and GT-sentence GRD mode
(box_accu_att/grd + cls_accu) plus the language metrics — at a trained
checkpoint with each kernel toggled, and reports every metric per
variant and its delta vs the pure-XLA path.

Requires the tools/rehearsal.py dataset + checkpoint (run it with
--keep first), and the real chip (the kernels gate on the TPU
backend).

Usage:
  python tools/rehearsal.py --keep ...            # once
  python tools/grounding_kernel_delta.py [--root /tmp/gvd_rehearsal]

Writes GROUNDING_KERNEL_DELTA.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gvd_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

VARIANTS = {
    # flag overrides per variant; "xla" is the parity baseline
    "xla": dict(use_pallas_encoder=False, use_pallas_rnn=False),
    "encoder_only": dict(use_pallas_encoder=True, use_pallas_rnn=False),
    "rnn_only": dict(use_pallas_encoder=False, use_pallas_rnn=True),
    "default_on": dict(use_pallas_encoder=True, use_pallas_rnn=True),
}

METRIC_KEYS = ("grd_prec_all", "grd_recall_all", "grd_f1_all",
               "grd_prec_loc", "grd_recall_loc", "grd_f1_loc",
               "box_accu_att", "box_accu_grd", "cls_accu",
               "Bleu_4", "METEOR", "CIDEr")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/gvd_rehearsal")
    ap.add_argument("--out", default=os.path.join(
        ROOT, "GROUNDING_KERNEL_DELTA.json"))
    args = ap.parse_args()

    with open(os.path.join(args.root, "paths.json")) as f:
        paths = json.load(f)
    work = os.path.join(args.root, "work")

    from tools.rehearsal import driver_argv
    flags = driver_argv(paths, work, max_epochs=0)[2:]

    import main as cli
    from grounded_video_description_tpu.config import GVDConfig
    from grounded_video_description_tpu.data.dataset import Loader
    from grounded_video_description_tpu.data.packed_cache import (
        open_or_build)
    from grounded_video_description_tpu.engine import Trainer
    from grounded_video_description_tpu.engine.checkpoint import (
        CheckpointManager)
    from grounded_video_description_tpu.engine.evaluator import Evaluator
    from grounded_video_description_tpu.models import GVDModel

    cfg0 = GVDConfig.from_cli(flags)
    cfg0, model0, variables, _, dataset_val, vocab = \
        cli.build_model_and_vocab(cfg0)
    dataset_val = open_or_build(
        dataset_val, os.path.join(work, "packed", cfg0.val_split))

    trainer = Trainer(cfg0, model0)
    state = trainer.init_state(params=variables["params"],
                               model_state=variables["state"])
    # LATEST, not best: the rehearsal's synthetic captions are uniform
    # over the vocab, so greedy rationally decodes empty sentences and
    # every CIDEr ties at 0 — "best" would be the least-trained epoch.
    # The delta wants the sharpest attention margins available.
    state, infos = CheckpointManager(
        os.path.join(work, "save")).restore(state, load_best=False)
    print(f"restored latest checkpoint (epoch {infos.get('epoch')}, "
          f"best CIDEr {infos.get('best_val_score')})", flush=True)
    variables = {"params": state.params, "state": state.model_state}

    results, files = {}, {}
    for name, overrides in VARIANTS.items():
        cfg = cfg0.replace(id=f"kdelta-{name}", **overrides).validate()
        model = GVDModel(cfg)
        loader_val = Loader(dataset_val, cfg.batch_size, shuffle=False,
                            drop_last=False, pad_last=True)
        out_dir = os.path.join(work, f"kdelta_{name}")
        ev = Evaluator(cfg, model, vocab)
        stats = ev.evaluate(variables, loader_val, out_dir=out_dir)
        stats.update(ev.eval_grounding_gt(variables, loader_val,
                                          out_dir=out_dir))
        results[name] = {k: round(float(stats[k]), 6)
                         for k in METRIC_KEYS if k in stats}
        files[name] = os.path.join(
            out_dir, "results",
            f"attn-gen-sent-results-{cfg.val_split}-kdelta-{name}.json")
        print(json.dumps({name: results[name]}), flush=True)

    deltas = {
        name: {k: round(results[name][k] - results["xla"][k], 6)
               for k in results["xla"] if k in results[name]}
        for name in results if name != "xla"}

    # how many generated-sentence grounded boxes actually changed
    box_changes = {}
    with open(files["xla"]) as f:
        base = json.load(f)["results"]
    for name in ("encoder_only", "rnn_only", "default_on"):
        with open(files[name]) as f:
            sub = json.load(f)["results"]
        tot = diff = 0
        for vid, segs in base.items():
            for seg, ann in segs.items():
                other = sub.get(vid, {}).get(seg, {})
                a = ann.get("bbox_for_all_frames", [])
                b = other.get("bbox_for_all_frames", [])
                tot += max(len(a), len(b))
                diff += sum(1 for x, y in zip(a, b) if x != y) \
                    + abs(len(a) - len(b))
        box_changes[name] = {"objects": tot, "changed": diff,
                             "frac": round(diff / max(tot, 1), 4)}

    rec = {"metric": "pallas_kernel_grounding_delta_at_trained_weights",
           "variants": results, "delta_vs_xla": deltas,
           "gen_sent_box_changes": box_changes,
           "checkpoint": os.path.join(work, "save"),
           "note": ("full synthetic-dataset eval (generated-sentence "
                    "grounding + GT-sentence GRD + language metrics) at "
                    "the rehearsal best checkpoint; kernels gate on the "
                    "TPU backend, so this ran on the real chip")}
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
