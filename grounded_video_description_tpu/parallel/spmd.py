"""Explicit-SPMD training step via shard_map + XLA collectives.

`mesh.py` relies on jit's sharding propagation (XLA inserts the
gradient all-reduce).  This module is the explicit counterpart: the
per-device step runs under `shard_map` with the batch sharded on the
mesh 'data' axis and gradients reduced with `jax.lax.pmean` — the
collective rides ICI within a slice.  Numerically identical to the
jit path (tested); useful when manual control over collective
placement is needed (e.g. overlapping reduce with backward).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_KEYS = ("seg_feat", "input_seq", "gt_seq", "num", "ppls",
              "gt_boxes", "mask_boxes", "ppls_feat", "frm_mask",
              "sample_idx", "pnt_mask")


def make_shardmap_train_step(trainer, mesh: Mesh, donate: bool = False):
    """Returns a jitted train step whose inner computation is an
    explicit per-device program with a pmean gradient collective."""
    tx = trainer.tx

    batch_spec = {k: P("data") for k in BATCH_KEYS}
    rep = P()

    cfg = trainer.cfg

    def per_device_step(params, model_state, opt_state, batch, rng, lr):
        # identical per-device rng: dropout masks match the replicated
        # semantics of a global batch.
        #
        # Every loss component is a MASKED mean, and shards can carry
        # different mask counts (captions of different lengths, varying
        # GT-box counts) — averaging per-shard means would bias the
        # result.  The forward returns each component's local count;
        # scaling the local mean by count/psum(count) makes both the
        # loss value and (after a psum of grads) the gradient exactly
        # equal to the global-batch computation.
        def local_loss(p):
            losses, new_state = trainer.model.forward(
                {"params": p, "state": model_state}, batch,
                mode="MLE", train=True, rng=rng)
            frac = {}
            for name, cnt_key in (("lm_loss", "txt_count"),
                                  ("att2_loss", "roi_count"),
                                  ("ground_loss", "roi_count"),
                                  ("cls_loss", "cls_count")):
                c = losses[cnt_key]
                c_tot = jax.lax.psum(c, "data")
                frac[name] = losses[name] * c / jnp.maximum(c_tot, 1.0)
            import grounded_video_description_tpu.losses as L

            loss = L.total_loss(
                frac["lm_loss"], frac["att2_loss"], frac["ground_loss"],
                frac["cls_loss"], w_att2=cfg.w_att2, w_grd=cfg.w_grd,
                w_cls=cfg.w_cls, disable_caption=cfg.disable_caption)
            return loss, (frac, new_state)

        (loss, (frac, new_model_state)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params)

        # contributions are already count-scaled: SUM them
        grads = jax.lax.psum(grads, "data")
        loss = jax.lax.psum(loss, "data")
        losses = {k: jax.lax.psum(v, "data") for k, v in frac.items()}
        new_model_state = jax.lax.pmean(new_model_state, "data")

        updates, new_opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_model_state, new_opt_state, \
            {"loss": loss, **losses}

    sharded = jax.shard_map(
        per_device_step, mesh=mesh,
        in_specs=(rep, rep, rep, batch_spec, rep, rep),
        out_specs=(rep, rep, rep, rep),
        check_vma=False)  # replicated-output check off: optax state
    # trees carry non-array leaves the checker rejects

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(sharded, donate_argnums=donate_argnums)
