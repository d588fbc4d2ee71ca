"""Beam search: shape/determinism tests + equivalence against a
pure-Python oracle that reproduces the reference algorithm
(CaptionModelBU.py:24-185) step by step."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from helpers import setup, batch_for


def oracle_beam(model, params, enc, W, beta=1.0):
    """Reference-semantics beam search for batch item 0, pure Python."""
    cfg = model.cfg
    Lq = cfg.seq_length
    R = enc["pnt_mask"].shape[1] - 1

    def rep(x):
        return jnp.repeat(x[:1], W, axis=0)

    fc, conv, p_conv = (rep(enc["fc_feats"]), rep(enc["conv_feats"]),
                        rep(enc["p_conv_feats"]))
    pool, p_pool = rep(enc["pool_feats"]), rep(enc["p_pool_feats"])
    mask = rep(enc["pnt_mask"])

    core = jax.jit(lambda xt_ids, state: model.core_step(
        params["core"], model.embed_words(params, xt_ids, train=False),
        fc, conv, p_conv, pool, p_pool, mask, mask, state, train=False))

    logit = jax.jit(lambda out: jax.nn.log_softmax(
        beta * (out @ params["logit"]["w"] + params["logit"]["b"]), axis=1))

    state = model.init_state(W)
    out, state, att2_w, _ = core(jnp.zeros((W,), jnp.int32), state)
    att2_first = int(np.argmax(np.array(att2_w)[0]))
    att2_ind = np.argmax(np.array(att2_w), axis=1)

    beam_seq = np.zeros((Lq, W), np.int64)
    beam_lp = np.zeros((Lq, W))
    beam_att2 = np.full((Lq, W), -1, np.int64)
    beam_sum = np.zeros(W)
    done = []

    for t in range(Lq):
        logprobs = np.array(logit(out))
        rows = 1 if t == 0 else W
        cands = []
        order = np.argsort(-logprobs, axis=1)
        for q in range(rows):
            for c in range(W):
                w = order[q, c]
                cands.append(dict(c=w, q=q, r=logprobs[q, w],
                                  p=beam_sum[q] + logprobs[q, w],
                                  w2=att2_ind[q]))
        cands.sort(key=lambda x: -x["p"])
        cands = cands[:W]

        new_seq, new_lp, new_att2 = (beam_seq.copy(), beam_lp.copy(),
                                     beam_att2.copy())
        state_np = [np.array(s) for s in state]
        out_np = np.array(out)
        new_state = [s.copy() for s in state_np]
        new_out = out_np.copy()
        for vix, v in enumerate(cands):
            if t >= 1:
                new_seq[:t, vix] = beam_seq[:t, v["q"]]
                new_lp[:t, vix] = beam_lp[:t, v["q"]]
                new_att2[:t, vix] = beam_att2[:t, v["q"]]
            for s_new, s_old in zip(new_state, state_np):
                s_new[vix] = s_old[v["q"]]
            new_out[vix] = out_np[v["q"]]
            new_seq[t, vix] = v["c"]
            new_lp[t, vix] = v["r"]
            if t >= 1:
                new_att2[t, vix] = v["w2"]
            beam_sum[vix] = v["p"]
        beam_seq, beam_lp, beam_att2 = new_seq, new_lp, new_att2

        for vix in range(W):
            if beam_seq[t, vix] == 0 or t == Lq - 1:
                done.append(dict(seq=beam_seq[:, vix].copy(),
                                 logps=beam_lp[:, vix].copy(),
                                 att2=beam_att2[:, vix].copy(),
                                 p=beam_sum[vix]))
                beam_sum[vix] = -1000.0

        state = type(state)(*(jnp.asarray(s) for s in new_state))
        out, state, att2_w, _ = core(jnp.asarray(beam_seq[t]), state)
        att2_ind = np.argmax(np.array(att2_w), axis=1)

    best = max(done, key=lambda d: d["p"])
    att2 = best["att2"].copy()
    att2[0] = att2_first
    return best["seq"], best["logps"], att2


def test_beam_matches_reference_oracle():
    cfg, model, variables, fns = setup()
    batch = batch_for(cfg, B=2, seed=7)
    p = variables["params"]
    enc, _ = jax.jit(partial(model.encode, train=False))(
        p, variables["state"], batch)

    for W in (2, 3):
        seq, lps, att2, _att2f = jax.jit(
            partial(model.sample_beam, beam_size=W))(variables, batch)
        o_seq, o_lps, o_att2 = oracle_beam(model, p, enc, W)
        assert np.array_equal(np.array(seq[0]), o_seq), (
            np.array(seq[0]), o_seq)
        assert np.allclose(np.array(lps[0]), o_lps, atol=2e-3)
        assert np.array_equal(np.array(att2[0]), o_att2)


def test_beam_shapes_and_determinism():
    cfg, model, variables, fns = setup()
    batch = batch_for(cfg, B=3, seed=5)
    fn = jax.jit(partial(model.sample_beam, beam_size=3))
    seq, lps, att2, att2f = fn(variables, batch)
    assert seq.shape == (3, cfg.seq_length)
    assert lps.shape == (3, cfg.seq_length)
    assert att2.shape == (3, cfg.seq_length)
    assert att2f.shape == (3, cfg.seq_length, cfg.num_sampled_frm)
    # the per-frame argmaxes are consistent with the global argmax:
    # the winning global ROI index appears at its frame's slot
    frm = np.array(att2) // cfg.num_prop_per_frm
    within = np.array(att2) % cfg.num_prop_per_frm
    live = np.array(att2) >= 0
    picked = np.take_along_axis(np.array(att2f), np.maximum(frm, 0)[..., None],
                                axis=2)[..., 0]
    assert np.array_equal(picked[live], within[live])
    seq2 = fn(variables, batch)[0]
    assert np.array_equal(np.array(seq), np.array(seq2))
    assert np.all(np.array(seq) >= 0)
    assert np.all(np.array(seq) < cfg.vocab_size)
