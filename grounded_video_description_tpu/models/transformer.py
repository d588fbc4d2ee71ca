"""Post-LN transformer: region self-attention encoder (`obj_interact`)
and the Masked-Transformer caption decoder family.

Behavioral contract from misc/transformer.py (itself derived from
salesforce/densecap):
  * post-LN residual blocks whose LayerNorm divides by (unbiased std
    + eps) (transformer.py:66-77);
  * multi-head attention with *chunked* head splitting (1024 dims over
    6 heads -> uneven chunks, transformer.py:118-123) and a shared
    sqrt(d_model) score scale (transformer.py:94);
  * causal masking via an upper-triangular -INF bias
    (transformer.py:100-104);
  * the encoder returns the per-layer encoding list — the decoder's
    layer i cross-attends encoder layer i (transformer.py:177-190,
    206-212);
  * decoder token embedding is tied to the output projection scaled by
    sqrt(d_model) (transformer.py:207).

TPU-first notes: all shapes static; greedy decode is a `lax.scan` over
fixed-size hidden buffers with dynamic_update_slice (no Python loop
over a growing prefix).
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
import numpy as np

from grounded_video_description_tpu.nn import (
    dropout, layer_norm_affine, layer_norm_params_init, linear, linear_init,
)

INF = 1e10


def positional_encodings(T: int, D: int, dtype=jnp.float32) -> jnp.ndarray:
    pos = np.arange(T, dtype=np.float64)[:, None]
    chan = np.arange(D, dtype=np.float64)[None, :]
    # even channel c: sin(pos / 10000^(c/D)); odd: cos(pos / 10000^((c-1)/D))
    exponent = np.where(chan % 2 == 0, chan, chan - 1) / D
    angle = pos / np.power(10000.0, exponent)
    enc = np.where(chan % 2 == 0, np.sin(angle), np.cos(angle))
    return jnp.asarray(enc, dtype=dtype)


def _head_slices(d: int, n_heads: int) -> List[slice]:
    """torch.chunk boundaries: ceil-sized chunks, last one smaller."""
    size = -(-d // n_heads)
    out, start = [], 0
    while start < d:
        out.append(slice(start, min(start + size, d)))
        start += size
    return out


# --------------------------------------------------------------------- #
# init
# --------------------------------------------------------------------- #

def _mha_init(key, d_model: int) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "wq": linear_init(k1, d_model, d_model, bias=False),
        "wk": linear_init(k2, d_model, d_model, bias=False),
        "wv": linear_init(k3, d_model, d_model, bias=False),
        "wo": linear_init(k4, d_model, d_model, bias=False),
    }


def _ff_init(key, d_model: int, d_hidden: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"l1": linear_init(k1, d_model, d_hidden),
            "l2": linear_init(k2, d_hidden, d_model)}


def encoder_init(key, d_model: int, d_hidden: int, n_layers: int) -> dict:
    layers = []
    for _ in range(n_layers):
        k1, k2, key = jax.random.split(key, 3)
        layers.append({
            "selfattn": _mha_init(k1, d_model),
            "ln1": layer_norm_params_init(d_model),
            "ff": _ff_init(k2, d_model, d_hidden),
            "ln2": layer_norm_params_init(d_model),
        })
    return {"layers": layers}


def decoder_init(key, d_model: int, d_hidden: int, vocab: int,
                 n_layers: int) -> dict:
    layers = []
    for _ in range(n_layers):
        k1, k2, k3, key = jax.random.split(key, 4)
        layers.append({
            "selfattn": _mha_init(k1, d_model),
            "ln1": layer_norm_params_init(d_model),
            "crossattn": _mha_init(k2, d_model),
            "ln2": layer_norm_params_init(d_model),
            "ff": _ff_init(k3, d_model, d_hidden),
            "ln3": layer_norm_params_init(d_model),
        })
    kout, _ = jax.random.split(key)
    return {"layers": layers, "out": linear_init(kout, d_model, vocab)}


# --------------------------------------------------------------------- #
# apply
# --------------------------------------------------------------------- #

def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(B, T, D) -> (B, T, h, ceil(D/h)), zero-padding the feature tail.

    Exactly equivalent to the reference's uneven torch.chunk heads
    (transformer.py:118-123): padded dims are zero in BOTH q and k, so
    every q.k dot product is unchanged, and the padded v dims produce
    zeros that are sliced away after merging — but the h score/value
    matmuls run as one batched MXU op instead of a Python loop."""
    B, T, D = x.shape
    head = -(-D // n_heads)
    pad = head * n_heads - D
    if pad:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, pad)])
    return x.reshape(B, T, n_heads, head)


def _merge_heads(x: jnp.ndarray, d_model: int) -> jnp.ndarray:
    B, T, h, head = x.shape
    return x.reshape(B, T, h * head)[..., :d_model]


def _mha(p, query, key_, value, *, n_heads: int, causal: bool,
         drop: float, train: bool, rng,
         use_pallas: bool = False, attn_train_impl: str = "xla",
         pallas_interpret: bool = False) -> jnp.ndarray:
    """Multi-head attention; identical math via four schedules:

    * packed (all heads in one batched einsum) for short sequences;
    * head-sequential for long KV (the 1000-region obj_interact bank)
      — materializing the full (B, h, T, T) score tensor there is
      HBM-bound and measured ~12% slower end-to-end on v5e;
    * fused Pallas flash kernel (ops/pallas/mha.py) for long KV at
      inference when `use_pallas` — scores never leave VMEM;
    * fused fwd+bwd attention primitive with in-kernel prob dropout
      (ops/pallas/attention_train.py) for long-KV SELF-attention in
      TRAINING when `attn_train_impl` is "pallas"/"hybrid" — probs are
      regenerated in VMEM in both passes, so neither they nor their
      dropout mask ever reach HBM.
    """
    d_model = query.shape[-1]
    scale = math.sqrt(d_model)       # shared scale (transformer.py:94)

    if (attn_train_impl != "xla" and train and not causal
            and key_.shape[1] > 256
            and query.shape[1] == key_.shape[1]):
        from grounded_video_description_tpu.ops.pallas import attention_train
        prim = {"pallas": attention_train.mha_probs_dropout,
                "hybrid": attention_train.mha_probs_dropout_hybrid
                }[attn_train_impl]
        q = _split_heads(linear(p["wq"], query), n_heads)
        k = _split_heads(linear(p["wk"], key_), n_heads)
        v = _split_heads(linear(p["wv"], value), n_heads)
        if rng is not None and drop > 0.0:
            bits = jax.random.bits(rng, (), jnp.uint32)
            seed = jax.lax.bitcast_convert_type(bits, jnp.int32)
            rate = float(drop)
        else:
            seed = jnp.int32(0)
            rate = 0.0
        o = prim(
            jnp.moveaxis(q, 2, 1), jnp.moveaxis(k, 2, 1),
            jnp.moveaxis(v, 2, 1), seed, scale, rate, pallas_interpret)
        return linear(p["wo"], _merge_heads(jnp.moveaxis(o, 1, 2), d_model))

    if (use_pallas and not train and not causal
            and key_.shape[1] > 256):
        from grounded_video_description_tpu.ops.pallas.mha import (
            flash_self_attention)
        B, T = query.shape[:2]
        # (B, T, h, d) -> (B*h, T, d); q pre-scaled so the kernel's
        # softmax(q k^T) matches softmax(scores / scale)
        def heads_first(x):
            return jnp.moveaxis(x, 2, 1).reshape(-1, T, x.shape[-1])
        q = heads_first(_split_heads(linear(p["wq"], query), n_heads))
        k = heads_first(_split_heads(linear(p["wk"], key_), n_heads))
        v = heads_first(_split_heads(linear(p["wv"], value), n_heads))
        o = flash_self_attention(q / jnp.asarray(scale, q.dtype), k, v)
        o = jnp.moveaxis(o.reshape(B, n_heads, T, -1), 1, 2)
        return linear(p["wo"], _merge_heads(o, d_model))

    if key_.shape[1] <= 256:
        q = _split_heads(linear(p["wq"], query), n_heads)
        k = _split_heads(linear(p["wk"], key_), n_heads)
        v = _split_heads(linear(p["wv"], value), n_heads)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if causal:
            T = k.shape[1]
            tri = jnp.triu(jnp.full((T, T), INF, scores.dtype), 1)
            scores = scores - tri[None, None]
        scores = checkpoint_name(scores, "attn_probs")
        w = checkpoint_name(
            jax.nn.softmax(scores / scale, axis=-1), "attn_probs")
        w = dropout(rng, w, drop, train=train, residual_name="attn_probs")
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
        return linear(p["wo"], _merge_heads(out, d_model))

    q = linear(p["wq"], query)
    k = linear(p["wk"], key_)
    v = linear(p["wv"], value)
    outs = []
    rngs = (jax.random.split(rng, n_heads) if rng is not None
            else [None] * n_heads)
    for sl, r in zip(_head_slices(d_model, n_heads), rngs):
        # (B, T, T) score/prob/mask tensors are tagged so a names-based
        # checkpoint policy can recompute instead of store them — at
        # R=1000 they are the dominant training residual (~60 MB each
        # per head per layer at microbatch 30)
        scores = jnp.einsum("bqd,bkd->bqk", q[..., sl], k[..., sl])
        if causal:
            T = k.shape[1]
            tri = jnp.triu(jnp.full((T, T), INF, scores.dtype), 1)
            scores = scores - tri[None]
        # tag AFTER the causal subtraction (matching the packed branch
        # above): the post-mask tensor is the one autodiff would save
        scores = checkpoint_name(scores, "attn_probs")
        w = checkpoint_name(
            jax.nn.softmax(scores / scale, axis=-1), "attn_probs")
        w = dropout(r, w, drop, train=train, residual_name="attn_probs")
        outs.append(jnp.einsum("bqk,bkd->bqd", w, v[..., sl]))
    return linear(p["wo"], jnp.concatenate(outs, axis=-1))


def _residual(pln, x, sub, *, drop: float, train: bool, rng) -> jnp.ndarray:
    return layer_norm_affine(pln, x + dropout(rng, sub, drop, train=train),
                             use_std=True)


def _ff(p, x):
    return linear(p["l2"], jax.nn.relu(linear(p["l1"], x)))


def encoder_apply(p, x: jnp.ndarray, *, n_heads: int, drop: float,
                  train: bool = False, rng=None,
                  mask: Optional[jnp.ndarray] = None,
                  use_pallas: bool = False, attn_train_impl: str = "xla",
                  pallas_interpret: bool = False) -> List[jnp.ndarray]:
    """Returns the list of per-layer encodings (transformer.py:177-190)."""
    if mask is not None:
        x = x * mask
    encodings = []
    for lp in p["layers"]:
        r1, r2, r3, rng = (jax.random.split(rng, 4) if rng is not None
                           else (None, None, None, None))
        a = _mha(lp["selfattn"], x, x, x, n_heads=n_heads, causal=False,
                 drop=drop, train=train, rng=r1, use_pallas=use_pallas,
                 attn_train_impl=attn_train_impl,
                 pallas_interpret=pallas_interpret)
        x = _residual(lp["ln1"], x, a, drop=drop, train=train, rng=r2)
        f = _ff(lp["ff"], x)
        x = _residual(lp["ln2"], x, f, drop=drop, train=train, rng=r3)
        if mask is not None:
            x = x * mask
        encodings.append(x)
    return encodings


def decoder_apply(p, tokens: jnp.ndarray, encodings: List[jnp.ndarray], *,
                  n_heads: int, drop: float, train: bool = False,
                  rng=None) -> jnp.ndarray:
    """Teacher-forced decoder pass -> (B, T, d_model) hidden states."""
    d_model = encodings[0].shape[-1]
    # tied embedding = transposed output projection, scaled
    # (transformer.py:207; our linear stores (in, out))
    embed_w = p["out"]["w"].T * math.sqrt(d_model)   # (vocab, d_model)
    x = jnp.take(embed_w, tokens, axis=0)
    x = x + positional_encodings(x.shape[1], d_model, x.dtype)[None]
    r0, rng = (jax.random.split(rng) if rng is not None else (None, None))
    x = dropout(r0, x, drop, train=train)
    for lp, enc in zip(p["layers"], encodings):
        r1, r2, r3, r4, r5, rng = (jax.random.split(rng, 6) if rng is not None
                                   else (None,) * 6)
        a = _mha(lp["selfattn"], x, x, x, n_heads=n_heads, causal=True,
                 drop=drop, train=train, rng=r1)
        x = _residual(lp["ln1"], x, a, drop=drop, train=train, rng=r2)
        c = _mha(lp["crossattn"], x, enc, enc, n_heads=n_heads, causal=False,
                 drop=drop, train=train, rng=r3)
        x = _residual(lp["ln2"], x, c, drop=drop, train=train, rng=r4)
        f = _ff(lp["ff"], x)
        x = _residual(lp["ln3"], x, f, drop=drop, train=train, rng=r5)
    return x


def decoder_xe_loss(p, encodings: List[jnp.ndarray], seq: jnp.ndarray, *,
                    n_heads: int, drop: float, train: bool,
                    rng=None) -> jnp.ndarray:
    """Masked cross-entropy over non-pad targets (transformer.py:271-280).
    seq: (B, T+1) with BOS(0) prepended."""
    out = decoder_apply(p, seq[:, :-1], encodings, n_heads=n_heads,
                        drop=drop, train=train, rng=rng)
    targets = seq[:, 1:]
    logits = linear(p["out"], out)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != 0).astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def decoder_greedy(p, encodings: List[jnp.ndarray], T: int, *,
                   n_heads: int) -> jnp.ndarray:
    """Incremental greedy decode (transformer.py:214-241) as a scan.

    Maintains per-layer hidden buffers of static shape (B, T, H); step t
    writes slot t and self-attends over slots [0, t] via masking.
    """
    B = encodings[0].shape[0]
    H = encodings[0].shape[-1]
    n_layers = len(p["layers"])
    embed_w = p["out"]["w"].T * math.sqrt(H)         # (vocab, H), tied
    pe = positional_encodings(T, H, encodings[0].dtype)

    hiddens0 = jnp.zeros((n_layers + 1, B, T, H), encodings[0].dtype)
    pred0 = jnp.zeros((B, T), jnp.int32)
    scale = math.sqrt(H)
    pos_ids = jnp.arange(T)

    def step(carry, t):
        hiddens, pred = carry
        prev_tok = jnp.where(t == 0, 0, pred[:, jnp.maximum(t - 1, 0)])
        x0 = jnp.take(embed_w, prev_tok, axis=0) + pe[t][None]   # (B, H)
        hiddens = hiddens.at[0, :, t, :].set(x0)
        h_cur = hiddens[0, :, t, :]
        for l in range(n_layers):
            lp = p["layers"][l]
            prefix = hiddens[l]                                   # (B, T, H)
            # self-attn: current token attends slots <= t
            q = h_cur[:, None, :]
            valid = (pos_ids <= t)[None, None, None, :]         # (1,1,1,T)
            qq = _split_heads(linear(lp["selfattn"]["wq"], q), n_heads)
            kk = _split_heads(linear(lp["selfattn"]["wk"], prefix),
                              n_heads)
            vv = _split_heads(linear(lp["selfattn"]["wv"], prefix),
                              n_heads)
            scores = jnp.einsum("bqhd,bkhd->bhqk", qq, kk)
            scores = jnp.where(valid, scores, -INF)
            w = jax.nn.softmax(scores / scale, axis=-1)
            a_out = jnp.einsum("bhqk,bkhd->bqhd", w, vv)
            a = linear(lp["selfattn"]["wo"], _merge_heads(a_out, H))
            x = layer_norm_affine(lp["ln1"], q + a, use_std=True)

            enc = encodings[l]
            c = _mha(lp["crossattn"], x, enc, enc, n_heads=n_heads,
                     causal=False, drop=0.0, train=False, rng=None)
            x = layer_norm_affine(lp["ln2"], x + c, use_std=True)
            f = _ff(lp["ff"], x)
            x = layer_norm_affine(lp["ln3"], x + f, use_std=True)
            h_cur = x[:, 0, :]
            hiddens = hiddens.at[l + 1, :, t, :].set(h_cur)

        logits = linear(p["out"], h_cur)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pred = pred.at[:, t].set(tok)
        return (hiddens, pred), None

    (_, pred), _ = jax.lax.scan(step, (hiddens0, pred0), jnp.arange(T))
    return pred
