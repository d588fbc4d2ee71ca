"""Attribute the train step's non-scan, non-obj_interact remainder.

The round-3 component ablation (tools/ablate_train.py, docs/DESIGN.md)
leaves ~300 ms of the 1.043 s accum-8 step unattributed after
obj_interact (~289 ms), the temporal path (~216 ms) and the decode
scan (~234 ms).  This times the candidate pieces as standalone jitted
programs at the exact step shapes:

  * supervision — GVDModel.supervision on the full batch 240 (runs
    once per step inside the jitted accum step)
  * encode_fwdbwd — encode() fwd+bwd at microbatch 30, x8 (the
    projections / LN / BN / grounder sim part, WITHOUT obj_interact
    and WITHOUT the temporal path: obj_interact off, t_attn_size 16)
  * optimizer — tx.update + apply_updates on step-shaped grads
    (clip-by-global-norm + adam + finetune group)
  * grad_zero_accum — the accumulation scan's bookkeeping: zeros_like
    on params + 8 tree-adds (measures the per-step gradient-buffer
    traffic)

Standalone timings overstate nothing but miss XLA's cross-fusion, so
treat them as upper bounds for "what would removing this buy".
Prints one JSON line per piece.  Select pieces on argv.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gvd_jax_cache")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.config import GVDConfig
    from grounded_video_description_tpu.data import synthetic_batch
    from grounded_video_description_tpu.engine.trainer import Trainer
    from grounded_video_description_tpu.models.gvd import GVDModel

    base = dict(vocab_size=4905, detect_size=431, seq_per_img=1,
                drop_prob_lm=0.5, obj_interact=True, dtype="bfloat16",
                grad_accum=8, batch_size=240, remat=False,
                learning_rate_decay_start=-1)
    cfg = GVDConfig(**base).validate()
    model = GVDModel(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 240, seed=0).items()
             if k != "seg_id"}

    def timed(fn, *args, iters=10):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / iters

    pieces = {}

    def supervision():
        fn = jax.jit(lambda b: model.supervision(b))
        return timed(fn, batch)

    def encode_fwdbwd():
        cfg_e = GVDConfig(**{**base, "obj_interact": False,
                             "t_attn_size": 16}).validate()
        model_e = GVDModel(cfg_e)
        var = jax.jit(model_e.init)(jax.random.PRNGKey(0))
        mb = {k: v[:30] for k, v in batch.items()}
        mb["seg_feat"] = mb["seg_feat"][:, :16]
        rng = jax.random.key(0, impl="rbg")

        def loss(p, b, r):
            enc, _ = model_e.encode(p, var["state"], b, train=True,
                                    rng=r)
            return (jnp.sum(enc["pool_feats"].astype(jnp.float32))
                    + jnp.sum(enc["sim_mat_static"])
                    + jnp.sum(enc["fc_feats"].astype(jnp.float32)))

        g = jax.jit(jax.grad(loss))
        per_mb = timed(g, var["params"], mb, rng)
        return per_mb * 8

    def optimizer():
        tr = Trainer(cfg)
        st = tr.init_state()
        grads = jax.tree.map(jnp.ones_like, st.params)

        def upd(g, o, p):
            import optax
            u, no = tr.tx.update(g, o, p)
            u = jax.tree.map(lambda x: x * 5e-4, u)
            return optax.apply_updates(p, u), no

        fn = jax.jit(upd)
        return timed(fn, grads, st.opt_state, st.params)

    def grad_zero_accum():
        tr = Trainer(cfg)
        st = tr.init_state()
        g = jax.tree.map(jnp.ones_like, st.params)

        def acc(p, g):
            z = jax.tree.map(jnp.zeros_like, p)
            for _ in range(8):
                z = jax.tree.map(jnp.add, z, g)
            return z

        fn = jax.jit(acc)
        return timed(fn, st.params, g)

    fns = {"supervision": supervision, "encode_fwdbwd": encode_fwdbwd,
           "optimizer": optimizer, "grad_zero_accum": grad_zero_accum}
    which = sys.argv[1:] or list(fns)
    for name in which:
        s = fns[name]()
        pieces[name] = round(s * 1e3, 2)
        print(json.dumps({"piece": name, "ms_per_step": pieces[name]}),
              flush=True)
    print(json.dumps({"rest_ablation_ms": pieces}))


if __name__ == "__main__":
    main()
