"""CLI driver: train / evaluate grounded video description on TPU.

Capability contract from the reference driver (main.py:520-743):
config parse + YAML overlay, dataset/loader construction, model build
with VG weight transfer, optional resume (best or latest), per-epoch
LR decay, val-every-N-epochs with language + grounding eval,
best-by-CIDEr checkpointing.

TPU-native: one jitted training step reused across all epochs (static
shapes), host-threaded batch prefetch, device-mesh data parallelism
when more than one device is visible.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gvd_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import numpy as np


def grounding_eval_cfg(cfg):
    """The config the EVALUATOR should run with.

    Grounding metrics consume region-attention ARGMAXES, where the
    fused encoder kernel's bf16 reordering measurably moves
    box_accu_att (-13% relative at a trained checkpoint,
    GROUNDING_KERNEL_DELTA.json) while caption tokens stay above the
    0.99 promotion bar.  When grounding evals are active, run the
    eval stack on the pure-XLA encoder; --no-pallas_encoder_grounding_guard
    restores the ~10% faster kernel eval (docs/DESIGN.md §bf16 kernel
    promotion policy, round-5 extension).  Returns `cfg` unchanged
    (identity) when no gating applies."""
    if (cfg.pallas_encoder_grounding_guard and cfg.use_pallas_encoder
            and (cfg.eval_obj_grounding or cfg.eval_obj_grounding_gt)):
        return cfg.replace(use_pallas_encoder=False)
    return cfg


def build_model_and_vocab(cfg):
    import jax

    from grounded_video_description_tpu.data.dataset import AnetDataset
    from grounded_video_description_tpu.data.transfer import (
        apply_weight_transfer, load_detectron_weights)
    from grounded_video_description_tpu.data.vocab import (
        GloVe, build_class_glove, build_vg_cls_glove, load_vg_classes)
    from grounded_video_description_tpu.models import GVDModel

    dataset = AnetDataset(cfg, split=cfg.train_split)
    dataset_val = AnetDataset(cfg, split=cfg.val_split)
    vocab = dataset.vocab
    unk = int(vocab.wtoi.get("UNK", vocab.vocab_size - 1))
    cfg = cfg.replace(vocab_size=vocab.vocab_size,
                      detect_size=vocab.detect_size,
                      unk_idx=unk)

    model = GVDModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(cfg.seed))

    # Visual-Genome knowledge transfer (model.py:172-217)
    detectron_dir = os.path.join(cfg.data_path, "detectron_weights")
    if os.path.isdir(detectron_dir) and cfg.transfer_mode != "none":
        glove = GloVe(cfg.glove_file or None, dim=cfg.glove_dim)
        vg_classes = load_vg_classes(
            os.path.join(cfg.data_path, "vg_object_vocab.txt"))
        glove_vg = build_vg_cls_glove(vg_classes, glove)
        glove_cls = build_class_glove(vocab.itod, glove)
        det = load_detectron_weights(detectron_dir)
        if det:
            params = apply_weight_transfer(
                dict(variables["params"]), transfer_mode=cfg.transfer_mode,
                detectron=det, glove_vg_cls=glove_vg,
                glove_clss=glove_cls, verbose=True)
            variables = {"params": params, "state": variables["state"]}
            print("applied detectron weight transfer "
                  f"({cfg.transfer_mode})")

    return cfg, model, variables, dataset, dataset_val, vocab


def build_driver_mesh(cfg):
    """Device mesh for the driver (replaces nn.DataParallel,
    reference main.py:654-655).

    `--mesh_shape D M` selects DP x TP explicitly; with no flag, all
    visible devices become one 'data' axis.  Returns (cfg, mesh|None) —
    cfg gains `vocab_pad_to` when a model axis is active so the TP
    rules can shard the vocab logit (4905 is odd).

    Multi-host: `--coordinator_address host:port --num_processes N
    --process_id i` initializes jax.distributed first, so
    jax.devices() spans the slice and the mesh's collectives ride
    ICI within hosts / DCN across them."""
    import jax

    if cfg.coordinator_address:
        jax.distributed.initialize(
            coordinator_address=cfg.coordinator_address,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id)

    from grounded_video_description_tpu.parallel import make_mesh

    devices = jax.devices()
    n = len(devices)
    shape = cfg.mesh_shape
    if shape is None:
        if n <= 1:
            return cfg, None
        # auto-DP: largest device count that divides the MICRObatch
        # (batch // grad_accum) — with accumulation on, each scanned
        # microbatch is what shards over the data axis
        micro = cfg.batch_size // max(cfg.grad_accum, 1)
        d = max((k for k in range(1, n + 1)
                 if micro % k == 0), default=1)
        if d <= 1:
            return cfg, None
        shape = [d, 1]
        devices = devices[:d]
    size = int(np.prod(shape))
    if size <= 1:
        return cfg, None
    if size > n:
        raise ValueError(
            f"mesh_shape {list(shape)} needs {size} devices, "
            f"{n} visible")
    # an explicit shape may use a SUBSET of visible devices (e.g.
    # [2, 2] on an 8-device host for a scaling study)
    devices = devices[:size]
    mesh = make_mesh(shape, ("data", "model"), devices=devices)
    data_size = mesh.shape.get("data", 1)
    if cfg.batch_size % data_size:
        raise ValueError(
            f"batch_size {cfg.batch_size} must be divisible by the "
            f"mesh data axis {data_size}")
    if (cfg.batch_size // cfg.grad_accum) % data_size:
        raise ValueError(
            f"microbatch {cfg.batch_size}//{cfg.grad_accum} must be "
            f"divisible by the mesh data axis {data_size}")
    model_size = mesh.shape.get("model", 1)
    if model_size > 1 and cfg.vocab_pad_to % model_size:
        cfg = cfg.replace(vocab_pad_to=model_size)
    print(f"mesh: {dict(mesh.shape)} over {n} devices")
    return cfg, mesh


def main(argv=None):
    from grounded_video_description_tpu.config import GVDConfig

    cfg = GVDConfig.from_cli(argv)
    np.random.seed(cfg.seed)

    import jax

    # the axon TPU plugin ignores JAX_PLATFORMS (CLAUDE.md); this env
    # gate lets subprocess drivers (tools/rehearsal.py --smoke) force
    # the CPU backend the way conftest.py does for tests
    if os.environ.get("GVD_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["GVD_PLATFORM"])

    from grounded_video_description_tpu.data.dataset import Loader
    from grounded_video_description_tpu.engine import Trainer
    from grounded_video_description_tpu.engine.checkpoint import (
        CheckpointManager)
    from grounded_video_description_tpu.engine.evaluator import Evaluator
    from grounded_video_description_tpu.utils.logging import MetricLogger

    cfg, mesh = build_driver_mesh(cfg)
    cfg, model, variables, dataset, dataset_val, vocab = \
        build_model_and_vocab(cfg)

    if cfg.packed_cache_dir:
        from grounded_video_description_tpu.data.packed_cache import (
            open_or_build)
        dataset = open_or_build(
            dataset, os.path.join(cfg.packed_cache_dir, cfg.train_split))
        dataset_val = open_or_build(
            dataset_val, os.path.join(cfg.packed_cache_dir, cfg.val_split))
    loader = Loader(dataset, cfg.batch_size, shuffle=True, seed=cfg.seed)
    loader_val = Loader(dataset_val, cfg.batch_size, shuffle=False,
                        drop_last=False, pad_last=True)

    trainer = Trainer(cfg, model, mesh=mesh)
    state = trainer.init_state(params=variables["params"],
                               model_state=variables["state"])
    state = trainer.shard_state(state)
    ckpt = CheckpointManager(cfg.checkpoint_path,
                             async_save=cfg.async_checkpoint)
    logger = MetricLogger(cfg.log_jsonl,
                          tensorboard_dir=cfg.tensorboard_dir)

    infos = {"epoch": 0, "best_val_score": None}
    resume_dir = cfg.start_from
    if not resume_dir and os.path.isdir(
            os.path.join(cfg.checkpoint_path, "model")):
        # crash/preemption recovery: pick up the run in progress
        # (the reference required a manual --start_from, opts.py:111)
        resume_dir = cfg.checkpoint_path
    if resume_dir:
        resume = CheckpointManager(resume_dir)
        # crash recovery continues from the LATEST state; explicit
        # --start_from honors --load_best_score (main.py:622-628)
        load_best = (cfg.load_best_score == 1) if cfg.start_from else False
        state, infos = resume.restore(state, load_best=load_best)
        state = trainer.shard_state(state)
        print(f"resumed from {resume_dir} at epoch "
              f"{infos.get('epoch', 0)}")

    eval_cfg = grounding_eval_cfg(cfg)
    if eval_cfg is not cfg:
        print("grounding eval active: encoder kernel gated off for "
              "metric fidelity (pallas_encoder_grounding_guard)")
        from grounded_video_description_tpu.models import GVDModel
        eval_model = GVDModel(eval_cfg)
    else:
        eval_model = model
    evaluator = Evaluator(eval_cfg, eval_model, vocab, mesh=mesh)
    best_val = infos.get("best_val_score")
    start_epoch = infos.get("epoch", 0)
    # loss/LR/val histories persisted with the checkpoint
    # (reference histories_*.pkl, main.py:718-732)
    histories = infos.get("histories",
                          {"loss": {}, "lr": {}, "val": {}})

    for epoch in range(start_epoch, cfg.max_epochs):
        if not cfg.inference_only:
            state, train_metrics = trainer.fit_epoch(
                state, loader, epoch, log_fn=logger.log)
            print(f"epoch {epoch}: " + " ".join(
                f"{k}={v:.4f}" for k, v in train_metrics.items()))
            logger.log({"epoch": epoch, **train_metrics})
            histories["loss"][str(epoch)] = train_metrics.get("loss")
            histories["lr"][str(epoch)] = trainer.lr_at_epoch(epoch)

        if epoch % cfg.val_every_epoch == 0 or cfg.inference_only:
            variables_now = {"params": state.params,
                             "state": state.model_state}
            stats = evaluator.evaluate(variables_now, loader_val,
                                       epoch=epoch)
            if cfg.att_model == "topdown" and cfg.eval_obj_grounding_gt:
                stats.update(evaluator.eval_grounding_gt(
                    variables_now, loader_val))
            logger.log({"epoch": epoch, "split": cfg.val_split, **stats})

            if cfg.inference_only:
                print(json.dumps(stats))
                break

            current = stats.get("CIDEr", 0.0)
            best_flag = best_val is None or current > best_val
            if best_flag:
                best_val = current
            histories["val"][str(epoch)] = stats
            ckpt.save(state, {"epoch": epoch + 1,
                              "best_val_score": best_val,
                              "vocab_size": cfg.vocab_size,
                              "histories": histories},
                      best=best_flag)
            print(f"checkpoint saved (best={best_flag}, "
                  f"CIDEr={current:.4f})")

    ckpt.wait()          # drain any in-flight async checkpoint write
    logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
