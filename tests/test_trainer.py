"""Trainer integration: loss decreases / overfits a fixed tiny batch;
finetune param-group gets a smaller effective LR; LR schedule math."""

import jax
import jax.numpy as jnp
import numpy as np

from grounded_video_description_tpu.config import tiny_test_config
from grounded_video_description_tpu.data import synthetic_batch
from grounded_video_description_tpu.engine import Trainer
from grounded_video_description_tpu.models import GVDModel


def test_overfit_tiny_batch():
    cfg = tiny_test_config(w_att2=0.05, w_grd=0.05, w_cls=0.1,
                           learning_rate=2e-3,
                           learning_rate_decay_start=-1)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    step = trainer.make_train_step(donate=False)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, 2, seed=3).items() if k != "seg_id"}

    rng = jax.random.PRNGKey(0)
    first_loss = None
    loss = None
    for i in range(60):
        rng, sub = jax.random.split(rng)
        state_params, mstate, ostate, metrics = step(
            state.params, state.model_state, state.opt_state, batch, sub,
            cfg.learning_rate)
        from grounded_video_description_tpu.engine.trainer import TrainState
        state = TrainState(state_params, mstate, ostate, state.step + 1)
        loss = float(metrics["lm_loss"])
        if first_loss is None:
            first_loss = loss
    assert loss < first_loss * 0.5, (first_loss, loss)


def test_overfit_then_greedy_reproduces_captions():
    """End-to-end learning check: after overfitting one tiny batch the
    greedy decode must emit exactly the training captions."""
    cfg = tiny_test_config(learning_rate=3e-3,
                           learning_rate_decay_start=-1)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    step = trainer.make_train_step(donate=False)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, 2, seed=5).items() if k != "seg_id"}
    rng = jax.random.PRNGKey(0)
    from grounded_video_description_tpu.engine.trainer import TrainState
    for _ in range(250):
        rng, sub = jax.random.split(rng)
        p, ms, os_, m = step(state.params, state.model_state,
                             state.opt_state, batch, sub,
                             cfg.learning_rate)
        state = TrainState(p, ms, os_, state.step + 1)
    model = trainer.model
    seq, *_ = jax.jit(model.sample_greedy)(
        {"params": state.params, "state": state.model_state}, batch)
    gt = np.array(batch["gt_seq"][:, 0, :])
    match = (np.array(seq) == gt) | (gt == 0)
    assert match.mean() == 1.0, (np.array(seq), gt)


def test_lr_schedule():
    cfg = tiny_test_config(learning_rate=1.0,
                           learning_rate_decay_start=1,
                           learning_rate_decay_every=3,
                           learning_rate_decay_rate=0.8)
    t = Trainer(cfg)
    # decay applies at epochs where (e - start) % every == 0, e > start
    assert t.lr_at_epoch(0) == 1.0
    assert t.lr_at_epoch(1) == 1.0
    assert t.lr_at_epoch(3) == 1.0
    assert np.isclose(t.lr_at_epoch(4), 0.8)
    assert np.isclose(t.lr_at_epoch(7), 0.8 * 0.8)


def test_finetune_param_group_scaled():
    cfg = tiny_test_config(learning_rate_decay_start=-1)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    step = trainer.make_train_step(donate=False)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, 2, seed=1).items() if k != "seg_id"}
    p0 = jax.tree.map(lambda x: np.array(x), state.params)
    params, *_ = step(state.params, state.model_state, state.opt_state,
                      batch, jax.random.PRNGKey(0), cfg.learning_rate)
    # adam updates have magnitude ~lr; finetune group ~0.1 lr
    d_main = np.abs(np.array(params["logit"]["w"]) - p0["logit"]["w"]).max()
    d_ft = np.abs(np.array(params["ctx2pool_grd"]["w"])
                  - p0["ctx2pool_grd"]["w"]).max()
    assert d_ft < d_main * 0.5, (d_main, d_ft)


def test_grad_accum_matches_full_batch():
    """grad_accum=2 must produce EXACTLY the full-batch update: the
    count-renormalized microbatch losses sum to the global masked
    means, and their summed gradients equal the full-batch gradient
    (Trainer._make_accum_train_step).  BN off (att_input_mode=region)
    and dropout 0 so the paths are deterministic; sgd keeps the
    update linear in the gradient."""
    kw = dict(w_att2=0.05, w_grd=0.05, w_cls=0.1, optim="sgd",
              att_input_mode="region", learning_rate=1e-2,
              learning_rate_decay_start=-1)
    batch = None
    results = {}
    for accum in (1, 2):
        cfg = tiny_test_config(grad_accum=accum, **kw)
        trainer = Trainer(cfg)
        state = trainer.init_state(rng=jax.random.PRNGKey(7))
        if batch is None:
            batch = {k: jnp.asarray(v) for k, v in
                     synthetic_batch(cfg, 4, seed=11).items()
                     if k != "seg_id"}
        step = trainer.make_train_step(donate=False)
        p, ms, os_, m = step(state.params, state.model_state,
                             state.opt_state, batch,
                             jax.random.PRNGKey(3), cfg.learning_rate)
        results[accum] = (p, m)
    p1, m1 = results[1]
    p2, m2 = results[2]
    for k in ("loss", "lm_loss", "att2_loss", "ground_loss", "cls_loss"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = {jax.tree_util.keystr(pth): leaf
             for pth, leaf in jax.tree_util.tree_leaves_with_path(p2)}
    for pth, leaf in flat1:
        key = jax.tree_util.keystr(pth)
        np.testing.assert_allclose(np.array(flat2[key]), np.array(leaf),
                                   rtol=1e-4, atol=1e-6, err_msg=key)


def test_grad_accum_seq_per_img_2():
    """seq_per_img=2 (multiple captions per segment — a config the
    published reference crashes on, model.py:436-440): the
    count-renormalized accumulation must still reproduce the
    full-batch update exactly."""
    kw = dict(w_att2=0.05, w_grd=0.05, w_cls=0.1, optim="sgd",
              att_input_mode="region", seq_per_img=2,
              learning_rate=1e-2, learning_rate_decay_start=-1)
    losses = {}
    for accum in (1, 2):
        cfg = tiny_test_config(grad_accum=accum, **kw)
        trainer = Trainer(cfg)
        state = trainer.init_state(rng=jax.random.PRNGKey(5))
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_batch(cfg, 4, seed=13).items()
                 if k != "seg_id"}
        step = trainer.make_train_step(donate=False)
        _, _, _, m = step(state.params, state.model_state,
                          state.opt_state, batch,
                          jax.random.PRNGKey(3), cfg.learning_rate)
        losses[accum] = {k: float(m[k]) for k in
                         ("loss", "lm_loss", "att2_loss",
                          "ground_loss", "cls_loss")}
    for k, v in losses[1].items():
        np.testing.assert_allclose(losses[2][k], v, rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_grad_accum_transformer_mode():
    """Accumulation under the transformer captioner (LM-only losses):
    exact lm parity vs accum=1.  region input mode: BatchNorm (active
    under both/featmap) computes per-microbatch batch stats, which is
    intentionally NOT full-batch-identical (same as DataParallel
    per-GPU BN) — exactness is only claimed without BN."""
    kw = dict(att_model="transformer", att_input_mode="region",
              optim="sgd", learning_rate=1e-2,
              learning_rate_decay_start=-1)
    lm = {}
    for accum in (1, 2):
        cfg = tiny_test_config(grad_accum=accum, **kw)
        trainer = Trainer(cfg)
        state = trainer.init_state(rng=jax.random.PRNGKey(9))
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_batch(cfg, 4, seed=2).items()
                 if k != "seg_id"}
        step = trainer.make_train_step(donate=False)
        _, _, _, m = step(state.params, state.model_state,
                          state.opt_state, batch,
                          jax.random.PRNGKey(3), cfg.learning_rate)
        lm[accum] = float(m["lm_loss"])
    np.testing.assert_allclose(lm[2], lm[1], rtol=1e-5, atol=1e-6)


def test_profiler_hooks_capture_trace(tmp_path):
    """cfg.profile_dir wires jax.profiler into fit_epoch: a trace
    directory must appear after one epoch (SURVEY §5: the reference
    had no profiling at all)."""
    import os

    prof_dir = str(tmp_path / "trace")
    cfg = tiny_test_config(profile_dir=prof_dir,
                           learning_rate_decay_start=-1)
    trainer = Trainer(cfg)
    state = trainer.init_state()

    class OneBatchLoader:
        def __iter__(self):
            for seed in range(6):
                b = synthetic_batch(cfg, cfg.batch_size, seed=seed)
                yield {k: jnp.asarray(v) for k, v in b.items()
                       if k != "seg_id"}

    state, metrics = trainer.fit_epoch(state, OneBatchLoader(), 0)
    assert "loss" in metrics
    found = []
    for root, _, files in os.walk(prof_dir):
        found += [f for f in files if f.endswith(".xplane.pb")
                  or "trace" in f]
    assert found, f"no profiler artifacts under {prof_dir}"


def test_rng_impl_rbg_trains_and_is_stochastic():
    """Default rng_impl='rbg' (XLA RngBitGenerator — 2.8x faster
    dropout-mask draws than threefry on TPU, tools/ablate_objattn.py)
    must flow through the accum scan: finite loss, and distinct rng
    splits give distinct dropout draws.  threefry remains selectable
    and produces a DIFFERENT stream (proves the impl switch is live)."""
    import numpy as np

    losses = {}
    for impl in ("rbg", "threefry"):
        cfg = tiny_test_config(grad_accum=2, drop_prob_lm=0.5,
                               obj_interact=True, rng_impl=impl,
                               learning_rate_decay_start=-1)
        trainer = Trainer(cfg)
        assert (trainer.rng.dtype.name == "key<rbg>") == (impl == "rbg")
        state = trainer.init_state()
        step = trainer.make_train_step(donate=False)
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_batch(
                     cfg, cfg.batch_size, seed=0).items()
                 if k != "seg_id"}
        import jax
        r1, r2 = jax.random.split(trainer.rng)
        _, _, _, m1 = step(state.params, state.model_state,
                           state.opt_state, batch, r1, 5e-4)
        _, _, _, m2 = step(state.params, state.model_state,
                           state.opt_state, batch, r2, 5e-4)
        assert np.isfinite(float(m1["loss"]))
        assert float(m1["loss"]) != float(m2["loss"])
        losses[impl] = float(m1["loss"])
    assert losses["rbg"] != losses["threefry"]


def test_decode_scan_schedule_is_equivalence_preserving():
    """The round-4 decode-scan schedule (body remat + unroll 8,
    docs/DESIGN.md §Decode-scan training bucket) is a pure scheduling
    change: losses and the updated parameters must match the plain
    scan (no remat, unroll 1) exactly.  Deterministic setup as in
    test_grad_accum_matches_full_batch."""
    kw = dict(w_att2=0.05, w_grd=0.05, w_cls=0.1, optim="sgd",
              att_input_mode="region", learning_rate=1e-2,
              learning_rate_decay_start=-1, remat=False)
    batch = None
    results = {}
    for fast in (False, True):
        cfg = tiny_test_config(decode_scan_remat=fast,
                               decode_scan_unroll=8 if fast else 1,
                               **kw)
        trainer = Trainer(cfg)
        state = trainer.init_state(rng=jax.random.PRNGKey(7))
        if batch is None:
            batch = {k: jnp.asarray(v) for k, v in
                     synthetic_batch(cfg, 4, seed=11).items()
                     if k != "seg_id"}
        step = trainer.make_train_step(donate=False)
        p, ms, os_, m = step(state.params, state.model_state,
                             state.opt_state, batch,
                             jax.random.PRNGKey(3), cfg.learning_rate)
        results[fast] = (p, m)
    p1, m1 = results[False]
    p2, m2 = results[True]
    for k in ("loss", "lm_loss", "att2_loss", "ground_loss", "cls_loss"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = {jax.tree_util.keystr(pth): leaf
             for pth, leaf in jax.tree_util.tree_leaves_with_path(p2)}
    for pth, leaf in flat1:
        key = jax.tree_util.keystr(pth)
        np.testing.assert_allclose(np.array(flat2[key]), np.array(leaf),
                                   rtol=1e-4, atol=1e-6, err_msg=key)


def test_fit_epoch_bf16_host_cast():
    """With cfg.dtype=bfloat16, fit_epoch converts the two big feature
    banks to bf16 on the HOST before the device transfer (halving H2D
    bytes — the integrated feed is transfer-bound, REHEARSAL_r05.json)
    and the step still trains to finite losses.  Geometry tensors
    (gt_boxes, ppls) must stay f32 for the IoU supervision targets."""
    import ml_dtypes

    cfg = tiny_test_config(dtype="bfloat16", learning_rate_decay_start=-1)
    trainer = Trainer(cfg)
    state = trainer.init_state()

    seen = {}

    class NumpyLoader:
        def __iter__(self):
            for seed in range(2):
                b = synthetic_batch(cfg, cfg.batch_size, seed=seed)
                b = {k: np.asarray(v) for k, v in b.items()
                     if k != "seg_id"}
                assert b["seg_feat"].dtype == np.float32
                yield b

    # spy on the step to capture the device batch dtypes
    real_make = trainer.make_train_step

    def spy_make(donate=True):
        fn = real_make(donate=donate)

        def wrapped(params, mstate, opt, batch, rng, lr):
            seen.update({k: v.dtype for k, v in batch.items()})
            return fn(params, mstate, opt, batch, rng, lr)
        return wrapped

    trainer.make_train_step = spy_make
    state, metrics = trainer.fit_epoch(state, NumpyLoader(), 0)
    assert np.isfinite(metrics["loss"])
    assert seen["seg_feat"] == ml_dtypes.bfloat16
    assert seen["ppls_feat"] == ml_dtypes.bfloat16
    assert seen["gt_boxes"] == np.float32
    assert seen["ppls"] == np.float32
