"""Measure the reference implementation's decode throughput.

VERDICT r1 #5: `bench.py`'s `vs_baseline` divided by an *assumed*
constant.  This tool produces the measured denominators:

  * the ACTUAL reference (torch CPU — the only hardware in this
    environment that can execute it) running its greedy decode loop
    (misc/model.py:492-624) at full model dims: rnn 1024, 1000 ROIs,
    480 frames, vocab 4905, obj_interact on — the published supervised
    config (README.md:74-89) minus the GPU;
  * our framework's greedy decode, jitted on the same CPU, same dims,
    same batch — the apples-to-apples framework-efficiency ratio;

and writes BASELINE_MEASURED.json at the repo root.  bench.py folds
these into its output line (alongside the legacy single-GPU estimate,
kept for series continuity with round 1).

Usage: python tools/measure_baseline.py [--batch 4] [--iters 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gvd_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def full_dims_cfg(batch: int):
    from grounded_video_description_tpu.config import GVDConfig

    return GVDConfig(
        rnn_size=1024, input_encoding_size=512, att_hid_size=512,
        fc_feat_size=3072, rgb_feat_size=2048, motion_feat_size=1024,
        att_feat_size=2048, t_attn_size=480, num_sampled_frm=10,
        num_prop_per_frm=100, seq_length=20, seq_per_img=1,
        vocab_size=4905, detect_size=431, max_gt_box=100,
        batch_size=batch, drop_prob_lm=0.0, obj_interact=True,
        transfer_mode="none", learning_rate_decay_start=-1,
        remat=False).validate()


def measure_reference(cfg, batch: int, iters: int) -> float:
    """Greedy captions/s of the actual reference on torch CPU."""
    import tempfile

    import refbridge as rb

    with tempfile.TemporaryDirectory() as td:
        model, _ = rb.build_ref_model(cfg, td)
        from grounded_video_description_tpu.data import synthetic_batch

        tb = rb.to_torch_batch(synthetic_batch(cfg, batch, seed=0))
        # warmup (allocator, thread pools)
        rb.run_ref_sample(model, tb, beam_size=1)
        t0 = time.perf_counter()
        for _ in range(iters):
            rb.run_ref_sample(model, tb, beam_size=1)
        dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_ours_cpu(cfg, batch: int, iters: int) -> float:
    """Greedy captions/s of our framework, jitted, CPU backend."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.data import synthetic_batch
    from grounded_video_description_tpu.models import GVDModel

    model = GVDModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0))
    b = {k: jnp.asarray(v)
         for k, v in synthetic_batch(cfg, batch, seed=0).items()
         if k != "seg_id"}
    fn = jax.jit(model.sample_greedy)
    np.asarray(fn(variables, b)[0])          # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, b)
    np.asarray(out[0])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_reference_train(cfg, batch: int, iters: int) -> float:
    """Supervised train-step seg/s of the actual reference on torch
    CPU: 4-loss weighted sum (main.py:238-255), grad-norm clip 0.1 +
    adam step (main.py:263-266, 672-675)."""
    import tempfile

    import torch

    import refbridge as rb

    with tempfile.TemporaryDirectory() as td:
        model, _ = rb.build_ref_model(cfg, td)
        model.train()
        # the published Dropout(inplace=True) right after ReLU
        # (model.py:77-119) breaks autograd on torch 2 ("variable
        # needed for gradient computation has been modified by an
        # inplace operation"); inplace off is numerically identical
        for m in model.modules():
            if hasattr(m, "inplace"):
                m.inplace = False
        opt = torch.optim.Adam(model.parameters(), lr=5e-4,
                               betas=(0.9, 0.999), weight_decay=0)
        from grounded_video_description_tpu.data import synthetic_batch

        tb = rb.to_torch_batch(synthetic_batch(cfg, batch, seed=0))

        def one_step():
            opt.zero_grad()
            lm, att2, grd, cls = model(
                tb["segs_feat"], tb["input_seq"], tb["gt_seq"],
                tb["num"], tb["ppls"], tb["gt_boxes"], tb["mask_boxes"],
                tb["ppls_feat"], tb["frm_mask"], tb["sample_idx"],
                tb["pnt_mask"], "MLE")
            loss = (lm.mean() + 0.05 * att2.mean() + 0.1 * cls.mean())
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 0.1)
            opt.step()

        one_step()                                 # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            one_step()
        dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_ours_cpu_train(cfg, batch: int, iters: int) -> float:
    """Train-step seg/s of our framework, jitted, CPU backend, same
    losses/weights as measure_reference_train."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.data import synthetic_batch
    from grounded_video_description_tpu.engine import Trainer

    tcfg = cfg.replace(w_att2=0.05, w_cls=0.1, drop_prob_lm=0.5)
    trainer = Trainer(tcfg)
    state = trainer.init_state()
    b = {k: jnp.asarray(v)
         for k, v in synthetic_batch(tcfg, batch, seed=0).items()
         if k != "seg_id"}
    step = trainer.make_train_step(donate=False)
    rng = jax.random.PRNGKey(0)
    p, m, o = state.params, state.model_state, state.opt_state
    p, m, o, met = step(p, m, o, b, rng, tcfg.learning_rate)
    np.asarray(met["loss"])                        # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        p, m, o, met = step(p, m, o, b, rng, tcfg.learning_rate)
    np.asarray(met["loss"])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--train", action="store_true",
                    help="also measure the supervised train step")
    ap.add_argument("--train_batch", type=int, default=2)
    ap.add_argument("--train_iters", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(
        ROOT, "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    # keep any previously measured fields (e.g. decode numbers) when
    # re-running for the train section only
    rec = {}
    if os.path.isfile(args.out):
        with open(args.out) as f:
            rec = json.load(f)

    cfg = full_dims_cfg(args.batch)
    if args.train:
        ref_t = measure_reference_train(cfg, args.train_batch,
                                        args.train_iters)
        print(f"reference torch-CPU train: {ref_t:.4f} seg/s")
        ours_t = measure_ours_cpu_train(cfg, args.train_batch,
                                        args.train_iters)
        print(f"ours jax-CPU train:        {ours_t:.4f} seg/s")
        rec.update({
            "train_method": (
                "supervised train step (lm + 0.05*att2 + 0.1*cls, "
                "grad clip 0.1, adam), full model dims, batch "
                f"{args.train_batch} x {args.train_iters} iters, same "
                "host CPU; reference = /root/reference torch CPU via "
                "tests/refbridge.py, ours = jitted Trainer step on "
                "the CPU backend"),
            "reference_cpu_train_seg_per_sec": round(ref_t, 4),
            "ours_cpu_train_seg_per_sec": round(ours_t, 4),
            "cpu_train_framework_speedup": round(ours_t / ref_t, 3),
            "train_measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        })
    else:
        ref = measure_reference(cfg, args.batch, args.iters)
        print(f"reference torch-CPU greedy: {ref:.3f} captions/s")
        ours = measure_ours_cpu(cfg, args.batch, args.iters)
        print(f"ours jax-CPU greedy:       {ours:.3f} captions/s")
        rec.update({
            "method": ("greedy decode, full model dims (rnn 1024, "
                       "1000 ROIs, 480 frames, vocab 4905, "
                       "obj_interact), "
                       f"batch {args.batch} x {args.iters} iters, same "
                       "host CPU, reference = /root/reference torch "
                       "CPU via tests/refbridge.py, ours = jax.jit "
                       "CPU backend"),
            "batch": args.batch,
            "iters": args.iters,
            "reference_cpu_caps_per_sec": round(ref, 4),
            "ours_cpu_caps_per_sec": round(ours, 4),
            "cpu_framework_speedup": round(ours / ref, 3),
            "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        })
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
