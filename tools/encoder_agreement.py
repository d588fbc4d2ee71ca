"""Token-agreement gate for bf16 kernel-path flags (same promotion
bar as the int8 banks, QUANTIZE_REPORT.json: >0.99 token agreement).

Usage: python tools/encoder_agreement.py [n_seeds] [flag_name]
                                          [--params ckpt.npz]
(flag defaults to use_pallas_encoder; use_pallas_rnn also accepted —
the flag's off-state must be the XLA path).  --params loads a trained
flat-npz checkpoint (tools/overfit_checkpoint.py) instead of init
weights — the round-4 re-validation of the bf16 promotion policy.

Greedy-decodes the same batches at flagship dims through the XLA
encoder path and the fused Pallas encoder-layer kernel and reports
per-batch token / exact-sentence / attention-argmax agreement.
Prints one JSON line per batch, then the summary line.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gvd_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.config import GVDConfig
    from grounded_video_description_tpu.data import synthetic_batch
    from grounded_video_description_tpu.models import GVDModel

    B = 100
    argv = list(sys.argv[1:])
    ckpt = None
    if "--params" in argv:
        i = argv.index("--params")
        ckpt = argv[i + 1]
        del argv[i:i + 2]
    n_seeds = int(argv[0]) if len(argv) > 0 else 3
    flag = argv[1] if len(argv) > 1 else "use_pallas_encoder"
    base = dict(vocab_size=4905, detect_size=431, seq_per_img=1,
                drop_prob_lm=0.5, obj_interact=True, dtype="bfloat16",
                learning_rate_decay_start=-1)
    fns = {}
    for name, on in (("xla", False), ("pallas", True)):
        cfg = GVDConfig(**base, **{flag: on}).validate()
        model = GVDModel(cfg)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0))
        if ckpt:
            from grounded_video_description_tpu.utils.params_io import (
                load_variables)
            variables = jax.device_put(load_variables(ckpt, variables))
        fns[name] = (jax.jit(model.sample_greedy), variables)
        print(json.dumps({"compiled": name, "weights":
                          ckpt or "init"}), flush=True)

    cfg0 = GVDConfig(**base).validate()
    agree, exact, attn = [], [], []
    for seed in range(n_seeds):
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_batch(cfg0, B, seed=seed).items()
                 if k != "seg_id"}
        outs = {}
        for name, (fn, variables) in fns.items():
            seq, lp, att2, sim = fn(variables, batch)
            outs[name] = (np.asarray(seq),
                          np.asarray(jnp.argmax(att2, -1)))
        s1, a1 = outs["xla"]
        s2, a2 = outs["pallas"]
        agree.append(float((s1 == s2).mean()))
        exact.append(float((s1 == s2).all(1).mean()))
        attn.append(float((a1 == a2).mean()))
        print(json.dumps({"seed": seed, "token": round(agree[-1], 4),
                          "exact": round(exact[-1], 4),
                          "attn": round(attn[-1], 4)}), flush=True)
    print(json.dumps({
        flag + "_agreement": {
            "token_mean": round(sum(agree) / len(agree), 4),
            "token_min": round(min(agree), 4),
            "exact_sentence_mean": round(sum(exact) / len(exact), 4),
            "attn_argmax_mean": round(sum(attn) / len(attn), 4),
            "batches": n_seeds, "batch_size": B}}))


if __name__ == "__main__":
    main()
