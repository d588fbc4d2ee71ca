"""Fused greedy-decode megakernel vs the lax.scan path (interpret
mode, f32): tokens must match exactly, logprobs and grounding logits
to f32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_description_tpu.config import tiny_test_config
from grounded_video_description_tpu.data import synthetic_batch
from grounded_video_description_tpu.models import GVDModel
from grounded_video_description_tpu.ops.pallas.decode_scan import (
    greedy_decode_fused)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(batch_size=4, obj_interact=True,
                           learning_rate_decay_start=-1)
    model = GVDModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 4, seed=1).items()
             if k != "seg_id"}
    return cfg, model, variables, batch


def test_fused_matches_scan(setup):
    cfg, model, variables, batch = setup
    seq, lp, att2, _ = jax.jit(model.sample_greedy)(variables, batch)

    enc, _ = model.encode(variables["params"], variables["state"],
                          batch, train=False, rng=None)
    fseq, flp, fatt2 = greedy_decode_fused(
        variables["params"], enc, enc["pnt_mask"],
        seq_length=cfg.seq_length, vocab_size=cfg.vocab_size,
        unk_idx=model.unk_idx, bt=2, interpret=True)

    np.testing.assert_array_equal(np.asarray(fseq), np.asarray(seq))
    np.testing.assert_allclose(np.asarray(flp), np.asarray(lp),
                               rtol=1e-5, atol=1e-5)
    # grounding logits: compare where unmasked (masked slots are
    # MIN_VALUE on both sides)
    a, b = np.asarray(fatt2), np.asarray(att2, np.float32)
    live = b > -1e7
    np.testing.assert_allclose(a[live], b[live], rtol=1e-4, atol=1e-4)
    assert np.all(a[~live] < -1e7)


def test_fused_unk_suppression(setup):
    """Force the argmax onto UNK via a biased logit head; the fused
    decode must emit the runner-up exactly like the scan path
    (model.py:589-594)."""
    cfg, model, variables, batch = setup
    params = jax.tree.map(jnp.asarray, variables["params"])
    b = np.array(params["logit"]["b"])
    b[:] = 0.0
    b[model.unk_idx] = 50.0              # UNK always wins the argmax
    params = dict(params)
    params["logit"] = {"w": params["logit"]["w"] * 0.01,
                       "b": jnp.asarray(b)}
    variables2 = {"params": params, "state": variables["state"]}

    seq, lp, _, _ = jax.jit(model.sample_greedy)(variables2, batch)
    assert not np.any(np.asarray(seq) == model.unk_idx)

    enc, _ = model.encode(params, variables["state"], batch,
                          train=False, rng=None)
    fseq, flp, _ = greedy_decode_fused(
        params, enc, enc["pnt_mask"], seq_length=cfg.seq_length,
        vocab_size=cfg.vocab_size, unk_idx=model.unk_idx, bt=2,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(fseq), np.asarray(seq))
    assert not np.any(np.asarray(fseq) == model.unk_idx)
    np.testing.assert_allclose(np.asarray(flp), np.asarray(lp),
                               rtol=1e-5, atol=1e-5)
