"""Differential parity against the ACTUAL reference implementation.

The credibility test for every behavioral-parity claim in this repo:
instantiate the reference `TopDownModel` (misc/AttModel.py:167-171) at
tiny dims on torch CPU, push its live `state_dict()` through
`import_torch_checkpoint`, and assert on the same synthetic batch that

  * MLE lm/att2/grd/cls losses match (misc/model.py:283-483),
  * GRD cls-pred pairs and att2/grd per-frame argmaxes match exactly
    (misc/model.py:484-489),
  * greedy UNK-suppressed token sequences match token-for-token
    (misc/model.py:586-618),
  * beam-3 sequences match token-for-token (misc/CaptionModelBU.py:24-185,
    modulo the published reference's broken core call — see
    refbridge._shim_beam_core_call),
  * every tensor in the harvested torch state_dict is consumed by the
    importer (no silent key-name drift).

Dims are constrained by reference hardcodes: att_embed requires
rgb=2048/motion=1024 (model.py:107-112), seg_info=50 (model.py:38),
loc_fc=300 (model.py:75), and vis_encoding_size is only
self-consistent when att_feat_size equals it (2048 for transfer
none/cls, 300 via glove_dim for transfer glove; transfer 'both'
crashes the reference's own pool_feat view at model.py:370 and is
excluded).
"""

import functools
import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

import refbridge as rb
from grounded_video_description_tpu.config import tiny_test_config
from grounded_video_description_tpu.data import synthetic_batch
from grounded_video_description_tpu.engine.checkpoint import (
    import_torch_bn_state, import_torch_checkpoint)
from grounded_video_description_tpu.models import GVDModel


def parity_cfg(transfer="glove", region="mix", input_mode="both",
               t_mode="bigru", obj_interact=False, seq_per_img=1,
               att_model="topdown"):
    att_feat = 300 if transfer == "glove" else 2048
    return tiny_test_config(
        rgb_feat_size=2048, motion_feat_size=1024, fc_feat_size=3072,
        att_feat_size=att_feat, glove_dim=300, loc_encoding_size=300,
        seg_info_size=50, rnn_size=64, att_hid_size=32,
        input_encoding_size=32, t_attn_size=8, num_sampled_frm=2,
        num_prop_per_frm=4, max_gt_box=4, seq_length=8, vocab_size=50,
        detect_size=10, seq_per_img=seq_per_img, transfer_mode=transfer,
        region_attn_mode=region, att_input_mode=input_mode,
        t_attn_mode=t_mode, obj_interact=obj_interact,
        att_model=att_model, batch_size=2, remat=False)


class RecordingDict(dict):
    """state_dict wrapper that records which keys the importer reads."""

    def __init__(self, base):
        super().__init__(base)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        self.read.add(k)
        return super().get(k, default)

    def __contains__(self, k):
        self.read.add(k)
        return super().__contains__(k)


@functools.lru_cache(maxsize=None)
def setup_pair(transfer="glove", region="mix", input_mode="both",
               t_mode="bigru", obj_interact=False, seq_per_img=1,
               att_model="topdown", batch_seed=0):
    """Builds (ref model+batch outputs-ready handle, our model with the
    imported weights, matching batches)."""
    cfg = parity_cfg(transfer, region, input_mode, t_mode, obj_interact,
                     seq_per_img, att_model)
    with tempfile.TemporaryDirectory() as td:
        ref_model, _ = rb.build_ref_model(cfg, td)
    sd = RecordingDict(
        {k: v.detach().numpy() for k, v in ref_model.state_dict().items()})

    model = GVDModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0))
    params = import_torch_checkpoint(sd, variables["params"])
    mstate = import_torch_bn_state(sd, variables["state"])
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "state": jax.tree.map(jnp.asarray, mstate)}

    batch = synthetic_batch(cfg, cfg.batch_size, seed=batch_seed)
    tb = rb.to_torch_batch(batch)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "seg_id"}
    return cfg, ref_model, sd, model, variables, tb, jb


# Combos the published reference can actually execute.  Verified
# unrunnable in the reference (crash before producing a number), hence
# excluded from differential comparison and covered by our own unit
# tests instead:
#   * att_input_mode='dual_region': TopDownCore always calls the
#     temporal Attention (AttModel.py:141-142) but _forward only builds
#     conv_feats for 'both'/'featmap' (model.py:391-409) -> view() on
#     the dummy (1,1) tensor fails at AttModel.py:37.
#   * seq_per_img>1: frm_mask_on_prop is built at batch_size and OR-ed
#     with the seq_batch_size pnt_mask (model.py:436-440) -> size
#     mismatch.  (Published configs all use seq_per_img=1.)
#   * region_attn_mode='cat': Attention2 references an undefined `xt`
#     (AttModel.py:90); transfer_mode='both': pool_feat concat width
#     (vis 2348 + loc 300 + cls) disagrees with the hardcoded
#     pool_feat_size view (model.py:68-69 vs :370).
TOPDOWN_COMBOS = [
    # (transfer, region_attn, att_input, t_attn, obj_interact, seq_per_img)
    ("glove", "mix", "both", "bigru", False, 1),
    ("glove", "dp", "region", "bigru", False, 1),
    ("glove", "mix_mul", "both", "bigru", False, 1),
    ("glove", "mix", "both", "bilstm", False, 1),
    ("cls", "mix", "both", "bigru", False, 1),
    ("none", "mix", "featmap", "bigru", False, 1),
    ("glove", "mix", "both", "bigru", True, 1),
]

IDS = ["-".join(map(str, c)) for c in TOPDOWN_COMBOS]


@pytest.mark.parametrize("combo", TOPDOWN_COMBOS, ids=IDS)
def test_mle_losses_match_reference(combo):
    cfg, ref_model, _, model, variables, tb, jb = setup_pair(*combo)
    ref = rb.run_ref_mle(ref_model, tb)
    ours, _ = jax.jit(
        functools.partial(model.forward, mode="MLE", train=False))(
        variables, jb)
    for k in ("lm_loss", "att2_loss", "ground_loss", "cls_loss"):
        np.testing.assert_allclose(
            float(ours[k]), ref[k], rtol=2e-4, atol=2e-5,
            err_msg=f"{k} diverges from the reference on {combo}")


# GRD / decode parity on a representative subset (each extra combo pays
# a fresh XLA compile on the 1-core CI box)
DECODE_COMBOS = [TOPDOWN_COMBOS[0], TOPDOWN_COMBOS[1], TOPDOWN_COMBOS[4]]
DECODE_IDS = ["-".join(map(str, c)) for c in DECODE_COMBOS]


@pytest.mark.parametrize("combo", DECODE_COMBOS, ids=DECODE_IDS)
def test_grd_outputs_match_reference(combo):
    cfg, ref_model, _, model, variables, tb, jb = setup_pair(*combo)
    ref_cls_pred, ref_att2_ind, ref_grd_ind = rb.run_ref_grd(ref_model, tb)
    out = jax.jit(functools.partial(model.forward, mode="GRD"))(
        variables, jb)

    # the reference loop breaks once every caption has ended
    # (model.py:424-426); ours runs the full static scan — compare the
    # executed prefix
    seq_cnt = ref_att2_ind.shape[1]
    np.testing.assert_array_equal(
        np.asarray(out["att2_ind"])[:, :seq_cnt], ref_att2_ind,
        err_msg=f"att2 argmax mismatch on {combo}")
    np.testing.assert_array_equal(
        np.asarray(out["grd_ind"])[:, :seq_cnt], ref_grd_ind,
        err_msg=f"grd argmax mismatch on {combo}")

    # cls_pred pairs (model.py:350-355): (gt class, predicted class)
    # at every (box, roi) with IoU>0.5, masked_select order
    sim_target = np.asarray(out["sim_target"])          # (B, K, R)
    pred_cls = np.asarray(out["pred_cls"])              # (B, R)
    mask = sim_target > 0
    pred_exp = np.broadcast_to(pred_cls[:, None, :], sim_target.shape)
    ours_pairs = np.stack([sim_target[mask], pred_exp[mask]], axis=1)
    np.testing.assert_array_equal(ours_pairs, ref_cls_pred,
                                  err_msg=f"cls_pred mismatch on {combo}")


@pytest.mark.parametrize("combo", DECODE_COMBOS, ids=DECODE_IDS)
def test_greedy_decode_matches_reference(combo):
    cfg, ref_model, _, model, variables, tb, jb = setup_pair(*combo)
    ref_seq, ref_lp, ref_att2_w, ref_sim = rb.run_ref_sample(
        ref_model, tb, beam_size=1)
    seq, lp, att2_w, sim = jax.jit(model.sample_greedy)(variables, jb)
    np.testing.assert_array_equal(
        np.asarray(seq), ref_seq,
        err_msg=f"greedy tokens diverge from the reference on {combo}")
    np.testing.assert_allclose(np.asarray(lp), ref_lp, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim), ref_sim, rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("beam_size", [3, 5])
def test_beam_matches_reference(beam_size):
    """Both published bench beam widths (BENCH beam3/beam5) pinned
    against the executing reference (misc/CaptionModelBU.py:24-185)."""
    combo = TOPDOWN_COMBOS[0]
    cfg, ref_model, _, model, variables, tb, jb = setup_pair(*combo)
    ref_seq, ref_lp, ref_att2 = rb.run_ref_sample(ref_model, tb,
                                                  beam_size=beam_size)
    seq, lp, att2, _att2f = jax.jit(
        functools.partial(model.sample_beam, beam_size=beam_size))(
        variables, jb)
    np.testing.assert_array_equal(
        np.asarray(seq), ref_seq,
        err_msg=f"beam-{beam_size} tokens diverge from the reference")
    np.testing.assert_allclose(np.asarray(lp), ref_lp, rtol=1e-4,
                               atol=1e-5)
    # att2 index parity only where a token exists (reference fills -1
    # ahead of time and never overwrites positions past EOS)
    live = ref_seq > 0
    np.testing.assert_array_equal(np.asarray(att2)[live], ref_att2[live])


def test_transformer_captioner_matches_reference():
    combo = ("glove", "mix", "both", "bigru", False, 1, "transformer")
    cfg, ref_model, _, model, variables, tb, jb = setup_pair(*combo)
    ref = rb.run_ref_transformer_mle(ref_model, tb)
    ours, _ = jax.jit(
        functools.partial(model.forward, mode="MLE", train=False))(
        variables, jb)
    np.testing.assert_allclose(float(ours["lm_loss"]), ref["lm_loss"],
                               rtol=2e-4, atol=2e-5)
    ref_seq = rb.run_ref_sample(ref_model, tb, beam_size=1)[0]
    seq = np.asarray(jax.jit(model.sample_greedy)(variables, jb)[0])
    np.testing.assert_array_equal(seq, ref_seq)


# keys the importer legitimately never reads
_IGNORED_TORCH_KEYS = (
    "core.i2h_2.", "core.h2h_2.",   # allocated but unused (AttModel.py:130-131)
)


def _is_ignored(key: str) -> bool:
    return any(key.startswith(p) for p in _IGNORED_TORCH_KEYS)


@pytest.mark.parametrize(
    "combo",
    [TOPDOWN_COMBOS[0], TOPDOWN_COMBOS[4], TOPDOWN_COMBOS[6],
     # dual_region is unrunnable in the reference but its ctor (and
     # hence its state_dict keys) is fine — importer coverage only
     ("glove", "mix", "dual_region", "bigru", False, 1),
     ("glove", "mix", "both", "bigru", False, 1, "transformer")],
    ids=["base", "cls", "obj_interact", "dual", "transformer"])
def test_importer_consumes_all_torch_keys(combo):
    """Guards against silent key-name drift: every tensor in the live
    reference state_dict must be read by the importer (or be on the
    documented ignore-list)."""
    cfg, ref_model, sd, model, variables, tb, jb = setup_pair(*combo)
    unread = {k for k in sd.keys()
              if k not in sd.read and not _is_ignored(k)}
    assert not unread, f"importer silently ignored torch keys: {sorted(unread)}"


def test_gradient_parity_with_reference():
    """Training-path differential: d(total loss)/d(params) must match
    torch autograd on the same weights and batch.

    The torch grads are exported as a state_dict-shaped mapping and
    pushed through the SAME importer used for weights — so this also
    re-verifies the importer's layout transposes on gradient tensors.
    Compared leaves cover every stage: embeddings, encoder GRU, both
    LSTM cells, attention heads, and the vocab logit."""
    import torch

    combo = TOPDOWN_COMBOS[0]
    cfg, ref_model, _, model, variables, tb, jb = setup_pair(*combo)
    w_att2, w_grd, w_cls = 0.05, 0.2, 0.1

    ref_model.zero_grad()
    lm, att2, grd, cls = ref_model(
        tb["segs_feat"], tb["input_seq"], tb["gt_seq"], tb["num"],
        tb["ppls"], tb["gt_boxes"], tb["mask_boxes"], tb["ppls_feat"],
        tb["frm_mask"], tb["sample_idx"], tb["pnt_mask"], "MLE")
    total = (lm.mean() + w_att2 * att2.mean() + w_grd * grd.mean()
             + w_cls * cls.mean())
    total.backward()
    grad_sd = {k: p.grad.detach().numpy() for k, p in
               ref_model.named_parameters() if p.grad is not None}

    # route the torch grads through the importer into our layout
    zeros = jax.tree.map(np.zeros_like, variables["params"])
    ref_grads = import_torch_checkpoint(grad_sd, zeros)

    import grounded_video_description_tpu.losses as L

    def loss_fn(params):
        losses, _ = model.forward({"params": params,
                                   "state": variables["state"]},
                                  jb, mode="MLE", train=False)
        return L.total_loss(losses["lm_loss"], losses["att2_loss"],
                            losses["ground_loss"], losses["cls_loss"],
                            w_att2=w_att2, w_grd=w_grd, w_cls=w_cls)

    ours_grads = jax.jit(jax.grad(loss_fn))(variables["params"])

    checks = {
        "logit.w": (ours_grads["logit"]["w"], ref_grads["logit"]["w"]),
        "embed.w": (ours_grads["embed"]["w"], ref_grads["embed"]["w"]),
        "vis_embed.w": (ours_grads["vis_embed"]["w"],
                        ref_grads["vis_embed"]["w"]),
        "att_lstm.wi": (ours_grads["core"]["att_lstm"]["wi"],
                        ref_grads["core"]["att_lstm"]["wi"]),
        "lang_lstm.wh": (ours_grads["core"]["lang_lstm"]["wh"],
                         ref_grads["core"]["lang_lstm"]["wh"]),
        "attn2.h2att.w": (ours_grads["core"]["attn2"]["h2att"]["w"],
                          ref_grads["core"]["attn2"]["h2att"]["w"]),
        "ctx2pool_grd.w": (ours_grads["ctx2pool_grd"]["w"],
                           ref_grads["ctx2pool_grd"]["w"]),
        "fc_embed.w": (ours_grads["fc_embed"]["w"],
                       ref_grads["fc_embed"]["w"]),
        "context_enc.l0.fwd.wi": (
            ours_grads["context_enc"]["layers"][0]["fwd"]["wi"],
            ref_grads["context_enc"]["layers"][0]["fwd"]["wi"]),
    }
    for name, (a, b) in checks.items():
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=5e-4,
            err_msg=f"gradient mismatch at {name}")
