"""Training engine.

Capability contract from the reference driver (main.py:197-311,
652-684): 4-loss weighted objective, global grad-norm clip 0.1,
adam/sgd(momentum 0.9)/adamax, a 0.1x learning-rate parameter group for
the transferred layers (`ctx2pool_grd`, `vis_embed`), and the
multiply-by-0.8-every-3-epochs LR decay.

TPU-native execution: one jitted train step (donated buffers) whose
batch inputs are sharded over the mesh 'data' axis — XLA inserts the
gradient all-reduce (psum) over ICI; there is no DataParallel
scatter/gather and no host round-trip per step.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from grounded_video_description_tpu.config import GVDConfig
from grounded_video_description_tpu import losses as L


def _resident_gb() -> float:
    """Host ANON RSS in GB (diagnostic, logged at disp_interval:
    catches transfer-client buffer retention like the axon tunnel's —
    config.host_sync_every_step).  Anon only: total RSS also counts
    touched memmap pages of the packed cache, which are evictable and
    not a leak."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("RssAnon:"):
                    return round(int(line.split()[1]) / 2**20, 2)
        return -1.0
    except Exception:
        return -1.0
from grounded_video_description_tpu.models.gvd import GVDModel


FINETUNE_KEYS = ("ctx2pool_grd", "vis_embed")


@dataclass
class TrainState:
    params: Any
    model_state: Any
    opt_state: Any
    step: int = 0


def _finetune_mask(params) -> Any:
    """True for params under the transferred layers (main.py:660-669)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_ft(path):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        return any(k in FINETUNE_KEYS for k in keys if isinstance(k, str))

    paths = {jax.tree_util.keystr(p): is_ft(p) for p, _ in flat}

    def mask_fn(params):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
        vals = [paths.get(jax.tree_util.keystr(p), False) for p, _ in leaves]
        return jax.tree_util.tree_unflatten(treedef, vals)

    return mask_fn


def make_optimizer(cfg: GVDConfig, params) -> optax.GradientTransformation:
    """Base-LR-1.0 transform; the dynamic LR is applied in the step
    (reference decays it across epochs, main.py:679-684)."""
    if cfg.optim == "adam":
        base = optax.scale_by_adam(b1=cfg.optim_alpha, b2=cfg.optim_beta,
                                   eps=cfg.optim_epsilon)
    elif cfg.optim == "sgd":
        base = optax.trace(decay=0.9)
    elif cfg.optim == "adamax":
        base = optax.scale_by_adamax(b1=cfg.optim_alpha, b2=cfg.optim_beta,
                                     eps=cfg.optim_epsilon)
    else:
        raise ValueError(f"unknown optim {cfg.optim!r}")

    chain = [optax.clip_by_global_norm(cfg.grad_clip)]
    if cfg.weight_decay:
        # torch-style L2: added to the gradient before the moments
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(base)
    if cfg.finetune_lr_scale != 1.0:
        chain.append(optax.masked(
            optax.scale(cfg.finetune_lr_scale), _finetune_mask(params)))
    chain.append(optax.scale(-1.0))
    return optax.chain(*chain)


class Trainer:
    def __init__(self, cfg: GVDConfig, model: Optional[GVDModel] = None,
                 rng_seed: Optional[int] = None, mesh=None):
        self.cfg = cfg
        self.model = model or GVDModel(cfg)
        seed = cfg.seed if rng_seed is None else rng_seed
        # dropout stream: rbg's RngBitGenerator draws the (B, R, R)
        # attention-prob masks ~2.8x faster than threefry on TPU
        # (tools/ablate_objattn.py); split()s stay threefry-derived so
        # stream independence is unaffected.  Param init elsewhere
        # keeps legacy threefry keys.
        impl = getattr(cfg, "rng_impl", "threefry")
        self.rng = (jax.random.PRNGKey(seed) if impl == "threefry"
                    else jax.random.key(seed, impl=impl))
        # device mesh for SPMD execution (replaces nn.DataParallel,
        # main.py:654-655): batches shard on 'data', params follow
        # param_shardings (TP on the padded vocab head when the
        # 'model' axis is >1)
        self.mesh = mesh

    # ------------------------------------------------------------------ #

    def shard_state(self, state: "TrainState") -> "TrainState":
        """Places params per the TP rules and replicates the rest over
        the mesh.  Opt-state subtrees that mirror the params tree (the
        Adam mu/nu moments) follow the params' shardings; scalar leaves
        (step counts) replicate.  Freshly-initialized opt states are
        uncommitted and jit would lay them out anyway, but a RESTORED
        opt state is committed to one device — without explicit
        placement the sharded step then fails with incompatible-devices
        (found by tests/test_checkpoint.py::test_cross_topology_restore)."""
        if self.mesh is None:
            return state
        from grounded_video_description_tpu.parallel.mesh import (
            param_shardings, replicate)

        psh = param_shardings(self.mesh, state.params)
        params = jax.device_put(state.params, psh)
        model_state = replicate(self.mesh, state.model_state)

        pstruct = jax.tree.structure(state.params)

        def _params_like(sub) -> bool:
            try:
                return jax.tree.structure(sub) == pstruct
            except Exception:
                return False

        def _place(sub):
            if _params_like(sub):
                return jax.device_put(sub, psh)
            return replicate(self.mesh, sub)

        opt_state = jax.tree.map(_place, state.opt_state,
                                 is_leaf=_params_like)
        return TrainState(params=params, model_state=model_state,
                          opt_state=opt_state, step=state.step)

    # ------------------------------------------------------------------ #

    def init_state(self, rng=None, params=None, model_state=None
                   ) -> TrainState:
        if params is None:
            variables = self.model.init(rng if rng is not None else self.rng)
            params = variables["params"]
            model_state = variables["state"]
        self.tx = make_optimizer(self.cfg, params)
        return TrainState(params=params, model_state=model_state,
                          opt_state=self.tx.init(params), step=0)

    # ------------------------------------------------------------------ #

    def loss_fn(self, params, model_state, batch, rng
                ) -> Tuple[jnp.ndarray, Tuple[Dict, Any]]:
        cfg = self.cfg
        losses, new_state = self.model.forward(
            {"params": params, "state": model_state}, batch,
            mode="MLE", train=True, rng=rng)
        loss = L.total_loss(
            losses["lm_loss"], losses["att2_loss"], losses["ground_loss"],
            losses["cls_loss"], w_att2=cfg.w_att2, w_grd=cfg.w_grd,
            w_cls=cfg.w_cls, disable_caption=cfg.disable_caption)
        return loss, (losses, new_state)

    def make_train_step(self, donate: bool = True):
        tx = self.tx
        accum = max(int(getattr(self.cfg, "grad_accum", 1)), 1)

        if accum == 1:
            def train_step(params, model_state, opt_state, batch, rng, lr):
                (loss, (losses, new_model_state)), grads = \
                    jax.value_and_grad(self.loss_fn, has_aux=True)(
                        params, model_state, batch, rng)
                updates, new_opt_state = tx.update(grads, opt_state, params)
                updates = jax.tree.map(lambda u: u * lr, updates)
                new_params = optax.apply_updates(params, updates)
                # mask counts are renormalization inputs, not metrics
                metrics = {"loss": loss,
                           **{k: v for k, v in losses.items()
                              if not k.endswith("_count")}}
                return new_params, new_model_state, new_opt_state, metrics

            donate_argnums = (0, 1, 2) if donate else ()
            return jax.jit(train_step, donate_argnums=donate_argnums)

        return self._make_accum_train_step(accum, donate)

    def _make_accum_train_step(self, accum: int, donate: bool):
        """Gradient accumulation over `accum` sequential microbatches
        (lax.scan): fits the reference's global batch 240 (main.py:556,
        30/GPU x 8 GPUs) in one chip's HBM.

        Every loss term is a MASKED mean whose denominator varies per
        microbatch, so averaging per-microbatch gradients would bias
        the update.  Instead each microbatch loss is scaled by
        `count / total_count` — the totals are parameter-free batch
        statistics (GVDModel.batch_loss_counts) — and the scaled
        gradients are SUMMED, which reproduces the full-batch gradient
        exactly (same renormalization as parallel/spmd.py:47-58;
        tested to ~1e-5 in tests/test_trainer.py).  BatchNorm running
        stats (att_input_mode both/featmap) update once per microbatch
        — the same per-shard semantics as the reference's DataParallel
        BN (main.py:654).
        """
        tx = self.tx
        cfg = self.cfg
        terms = (("lm_loss", "txt_count"), ("att2_loss", "roi_count"),
                 ("ground_loss", "roi_count"), ("cls_loss", "cls_count"))

        def train_step(params, model_state, opt_state, batch, rng, lr):
            # parameter-free supervision (IoU targets, per-step masks,
            # mask counts) is computed ONCE for the full batch and
            # sliced per microbatch — forward() skips rebuilding it
            # inside the scan (VERDICT r2 weak-2)
            sup_full = self.model.supervision(batch)
            totals = {k: sup_full[k] for k in
                      ("txt_count", "roi_count", "cls_count")}
            sup_tensors = {k: v for k, v in sup_full.items()
                           if k not in totals}
            micro = jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum)
                                    + x.shape[1:]), batch)
            micro_sup = jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum)
                                    + x.shape[1:]), sup_tensors)
            if self.mesh is not None and "data" in self.mesh.shape:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P
                shard = lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.mesh, P(None, "data")))
                micro = jax.tree.map(shard, micro)
                micro_sup = jax.tree.map(shard, micro_sup)
            rngs = jax.random.split(rng, accum)

            def mb_loss(p, mstate, mb, mb_sup, r):
                losses, new_state = self.model.forward(
                    {"params": p, "state": mstate}, mb, mode="MLE",
                    train=True, rng=r,
                    sup=mb_sup if mb_sup else None)
                frac = {name: losses[name] * losses[ck]
                        / jnp.maximum(totals[ck], 1.0)
                        for name, ck in terms}
                loss = L.total_loss(
                    frac["lm_loss"], frac["att2_loss"],
                    frac["ground_loss"], frac["cls_loss"],
                    w_att2=cfg.w_att2, w_grd=cfg.w_grd, w_cls=cfg.w_cls,
                    disable_caption=cfg.disable_caption)
                return loss, (frac, new_state)

            def body(carry, x):
                gacc, lacc, mstate = carry
                mb, mb_sup, r = x
                # identity barrier on the big f32 feature slices:
                # without it XLA rewrites convert(dynamic_slice(batch))
                # into dynamic_slice(convert(batch)) and hoists the
                # convert out of the scan, materializing a WHOLE-BATCH
                # bf16 copy of segs_feat+ppls_feat as a loop-invariant
                # temp (~1.6 GB at flagship batch 240 — the residual
                # OOM binder for microbatch 60, docs/DESIGN.md
                # §Grad-accum).  Same total convert bytes either way
                # (each slice is converted exactly once per step).
                mb = {k: (jax.lax.optimization_barrier(v)
                          if v.dtype == jnp.float32 and v.ndim >= 3
                          else v)
                      for k, v in mb.items()}
                (loss, (frac, new_state)), g = jax.value_and_grad(
                    mb_loss, has_aux=True)(params, mstate, mb, mb_sup, r)
                gacc = jax.tree.map(jnp.add, gacc, g)
                upd = {"loss": loss, **frac}
                lacc = {k: lacc[k] + upd[k] for k in lacc}
                return (gacc, lacc, new_state), None

            g0 = jax.tree.map(jnp.zeros_like, params)
            l0 = {k: jnp.zeros(()) for k in
                  ("loss", "lm_loss", "att2_loss", "ground_loss",
                   "cls_loss")}
            (gacc, lacc, new_model_state), _ = jax.lax.scan(
                body, (g0, l0, model_state), (micro, micro_sup, rngs))
            updates, new_opt_state = tx.update(gacc, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_model_state, new_opt_state, dict(lacc)

        donate_argnums = (0, 1, 2) if donate else ()
        return jax.jit(train_step, donate_argnums=donate_argnums)

    # ------------------------------------------------------------------ #

    def lr_at_epoch(self, epoch: int) -> float:
        """main.py:679-684: multiply by decay_rate every
        `decay_every` epochs once past `decay_start`."""
        cfg = self.cfg
        lr = cfg.learning_rate
        if cfg.learning_rate_decay_start >= 0:
            for e in range(cfg.learning_rate_decay_start + 1, epoch + 1):
                if (e - cfg.learning_rate_decay_start) \
                        % cfg.learning_rate_decay_every == 0:
                    lr *= cfg.learning_rate_decay_rate
        return lr

    # ------------------------------------------------------------------ #

    def fit_epoch(self, state: TrainState, loader, epoch: int,
                  log_fn=None) -> Tuple[TrainState, Dict]:
        """One epoch over a host-side batch loader."""
        # the compiled step closes over cfg / mesh / tx — invalidate the
        # cache when any of those identities change, else a second
        # fit_epoch after mutating them silently reuses the stale step
        cache_key = (id(self.cfg), id(self.mesh),
                     id(getattr(self, "tx", None)),
                     getattr(self.cfg, "grad_accum", 1),
                     self.cfg.donate_buffers)
        step_fn = getattr(self, "_step_fn", None)
        if step_fn is None or getattr(self, "_step_key", None) != cache_key:
            step_fn = self._step_fn = self.make_train_step(
                donate=self.cfg.donate_buffers)
            self._step_key = cache_key
            self._prof = None
        lr = self.lr_at_epoch(epoch)
        prof = getattr(self, "_prof", None)
        if prof is None and self.cfg.profile_dir:
            from grounded_video_description_tpu.utils.logging import (
                ProfilerHooks)
            prof = self._prof = ProfilerHooks(
                self.cfg.profile_dir, start_step=state.step + 2,
                num_steps=3)
        # metrics accumulate ON DEVICE (tiny async adds): a host
        # float() per step would block on the step's outputs and
        # serialize next-batch H2D + dispatch behind device compute;
        # syncing only at disp_interval keeps the dispatch pipeline
        # ahead of the chip
        agg_dev = None
        n = 0
        t0 = time.time()
        for batch in loader:
            batch = {k: v for k, v in batch.items()
                     if k not in ("seg_id", "n_valid")}
            if self.cfg.dtype == "bfloat16":
                # halve H2D bytes for the two big feature banks (14 ->
                # 7 MB/segment): the model casts them to cfg.dtype
                # on-device anyway (models/gvd.py encode), so convert
                # on the host before the transfer — the integrated
                # feed is transfer-bound, not gather-bound
                # (REHEARSAL_r05.json).  Geometry tensors (gt_boxes,
                # ppls) stay f32: IoU supervision targets depend on
                # their full precision.
                import ml_dtypes
                import numpy as _np
                for k in ("seg_feat", "ppls_feat"):
                    v = batch.get(k)
                    if v is not None and v.dtype == _np.float32:
                        batch[k] = v.astype(ml_dtypes.bfloat16)
            if self.mesh is not None:
                from grounded_video_description_tpu.parallel.mesh import (
                    shard_batch)
                batch = shard_batch(self.mesh, batch)
            else:
                # explicit upload instead of passing numpy into the
                # jit call: the host buffers then free with the Python
                # reference at the next loop iteration, rather than
                # riding the jit argument path (whose staging the
                # axon client retains per call — the round-5 rehearsal
                # leak, config.host_sync_every_step)
                batch = jax.device_put(batch)
            self.rng, sub = jax.random.split(self.rng)
            if prof is not None:
                prof.maybe_start(state.step)
            params, mstate, ostate, metrics = step_fn(
                state.params, state.model_state, state.opt_state,
                batch, sub, lr)
            if prof is not None and prof.active:
                # sync so the trace window covers the whole step —
                # via host readback, NOT block_until_ready (unreliable
                # through the axon tunnel, CLAUDE.md)
                import numpy as _np
                _np.asarray(metrics["loss"])
            state = TrainState(params, mstate, ostate, state.step + 1)
            if prof is not None:
                prof.maybe_stop(state.step)
            if self.cfg.host_sync_every_step:
                # bound in-flight h2d uploads to one batch (see
                # config.host_sync_every_step) — readback, not
                # block_until_ready (unreliable on the axon tunnel)
                import numpy as _np
                _np.asarray(metrics["loss"])
            n += 1
            agg_dev = metrics if agg_dev is None else jax.tree.map(
                jnp.add, agg_dev, metrics)
            if log_fn and n % max(self.cfg.disp_interval, 1) == 0:
                log_fn({"epoch": epoch, "step": state.step, "lr": lr,
                        **{k: float(v) / n for k, v in agg_dev.items()},
                        "time_per_batch": (time.time() - t0) / n,
                        "host_rss_gb": _resident_gb()})
        agg = {} if agg_dev is None else \
            {k: float(v) for k, v in agg_dev.items()}
        return state, {k: v / max(n, 1) for k, v in agg.items()}
