"""Device-mesh parallelism.

Replaces the reference's single-process `nn.DataParallel`
(main.py:654-655) — which replicated the model and scattered/gathered
every forward on one host — with SPMD over a `jax.sharding.Mesh`:

  * **data axis**: the batch dimension of every input tensor is
    sharded; `jax.jit` partitions the step and XLA inserts the gradient
    all-reduce (psum) over ICI automatically.
  * **model axis** (optional tensor parallelism): the widest matmuls —
    the vocab logit (rnn x V, model.py:124) and the visual-word
    embedding / grounder bank (C+1 x 2048, model.py:93) — shard their
    output dimension; XLA all-gathers activations where needed.

No NCCL/MPI porting: collectives are XLA-level and ride ICI within a
slice, DCN across slices (via jax.distributed, not needed here).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grounded_video_description_tpu.config import GVDConfig


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data", "model"),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    shape = tuple(shape)
    if len(shape) == 1:
        shape = (shape[0], 1)
        axis_names = tuple(axis_names)[:2]
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names)[: len(shape)])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """All batch tensors shard their leading (batch) dim on 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()
            if k != "seg_id"}


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


# parameters that benefit from tensor parallelism on the 'model' axis:
# keyed by top-level param name -> PartitionSpec of the weight
_TP_RULES = {
    "logit": {"w": P(None, "model"), "b": P("model")},
    "vis_embed": {"w": P("model", None)},
}

# rules whose non-divisible fallback is INTENTIONAL replication, not a
# misconfiguration: vis_embed is (detect_size+1, vis_enc) — tiny
# (~1.7 MB at flagship dims, where 432 divides every practical model
# axis) and has no pad knob, so small/toy configs replicate silently.
# the logit stays loud: cfg.vocab_pad_to exists precisely to fix it.
_TP_OPTIONAL = {"vis_embed"}


def param_shardings(mesh: Mesh, params, *, strict: bool = False) -> Dict:
    """NamedSharding tree: TP rules for the big banks, replicated
    elsewhere.

    A TP rule that cannot apply (non-divisible dim) is reported loudly:
    a warning by default, an error under `strict=True`.  The fix for
    the vocab logit is `cfg.vocab_pad_to = <model-axis size>` (ANet's
    4905-word vocab is odd)."""
    skipped = []

    def assign(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        for name, rules in _TP_RULES.items():
            if name in keys and "model" in mesh.axis_names \
                    and mesh.shape.get("model", 1) > 1:
                leaf_key = keys[-1]
                if leaf_key in rules:
                    spec = rules[leaf_key]
                    # only shard if the dim divides
                    dims = [mesh.shape.get(a, 1) if a else 1
                            for a in spec]
                    ok = all(s % d == 0 for s, d in
                             zip(leaf.shape, dims) if d > 1)
                    if ok:
                        return NamedSharding(mesh, spec)
                    if name not in _TP_OPTIONAL:
                        skipped.append(
                            f"{name}.{leaf_key} {leaf.shape} not "
                            f"divisible by {dict(mesh.shape)} "
                            f"-> replicated")
        return NamedSharding(mesh, P())

    out = jax.tree_util.tree_map_with_path(assign, params)
    if skipped:
        msg = ("tensor-parallel rules could not apply: "
               + "; ".join(skipped)
               + " (set cfg.vocab_pad_to to the model-axis size)")
        if strict:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return out


def make_sharded_train_step(trainer, mesh: Mesh, donate: bool = True):
    """Jitted train step with batch inputs sharded over 'data' and
    params sharded per `param_shardings` (TP) / replicated (DP)."""
    tx = trainer.tx

    def train_step(params, model_state, opt_state, batch, rng, lr):
        import optax

        (loss, (losses, new_model_state)), grads = jax.value_and_grad(
            trainer.loss_fn, has_aux=True)(params, model_state, batch, rng)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(params, updates)
        # mask counts are renormalization inputs, not metrics — filter
        # them like Trainer.make_train_step's accum==1 path does
        metrics = {"loss": loss,
                   **{k: v for k, v in losses.items()
                      if not k.endswith("_count")}}
        return new_params, new_model_state, new_opt_state, metrics

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)
