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

    def per_device_step(params, model_state, opt_state, batch, rng, lr):
        # identical per-device rng: dropout masks match the replicated
        # semantics of a global batch
        def local_loss(p):
            loss, (losses, new_state) = trainer.loss_fn(
                p, model_state, batch, rng)
            return loss, (losses, new_state)

        (loss, (losses, new_model_state)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params)

        # the global loss is a masked mean; per-device means over equal
        # shards average to the same value only when mask counts match,
        # so reduce both the weighted-sum and the metrics explicitly
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        losses = jax.lax.pmean(losses, "data")
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
