"""The Grounded-Video-Description model, TPU-native.

Capability contract (what, not how) from the reference `AttModel`
(misc/model.py:28-742) + `TopDownCore` (misc/AttModel.py:111-164):

  * encode pre-extracted frame + region features into attention banks,
  * region-class similarity via visual-word embeddings with optional
    Visual-Genome classifier transfer (fc7 surgery + per-class bias),
  * teacher-forced training with LM / attention / grounding /
    region-cls losses ('MLE'), grounding eval on GT sentences ('GRD'),
  * greedy UNK-suppressed sampling and batched beam search ('sample').

Architecture is jax-first: the decoder is a single `lax.scan` over the
(static) 20 token steps; per-step ROI supervision and frame masks are
precomputed as (B, T, ...) tensors outside the scan; all decode-time
tensors keep the padded static shapes (R = 1000 ROIs, K = 100 boxes)
so one XLA compilation serves every batch.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from grounded_video_description_tpu.config import GVDConfig
from grounded_video_description_tpu.models import transformer as xf
from grounded_video_description_tpu.nn import (
    batch_norm, batch_norm_init, birnn, birnn_init, dropout, embedding,
    embedding_init, layer_norm, linear, linear_init, lstm_cell,
    lstm_cell_init,
)
from grounded_video_description_tpu.ops import (
    MIN_VALUE, bbox_overlaps, bbox_target, grounder, region_attention,
    sim_mat_target, temporal_attention,
)
from grounded_video_description_tpu import losses as L


class CoreState(NamedTuple):
    h_att: jnp.ndarray
    c_att: jnp.ndarray
    h_lang: jnp.ndarray
    c_lang: jnp.ndarray


def _split(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


class GVDModel:
    """Static config holder; all methods are pure functions of params."""

    def __init__(self, cfg: GVDConfig):
        cfg.validate()
        self.cfg = cfg
        # grounder head style (model.py:55-58): additive only for
        # region_attn_mode add/cat; 'mix'/'mix_mul'/'dp' -> dot-product.
        self.grounder_additive = cfg.region_attn_mode in ("add", "cat")
        # UNK suppression target (model.py:53): vocab builds append
        # UNK last, overridable via cfg.unk_idx for foreign vocabs
        self.unk_idx = (cfg.unk_idx if cfg.unk_idx >= 0
                        else cfg.vocab_size - 1)
        # compute dtype: bfloat16 keeps the MXU fed at 2x f32 rate;
        # losses / softmaxes / statistics stay f32
        self.dtype = (jnp.bfloat16 if cfg.dtype == "bfloat16"
                      else jnp.float32)

    # ------------------------------------------------------------------ #
    # init
    # ------------------------------------------------------------------ #

    def init(self, key) -> Dict:
        cfg = self.cfg
        ks = iter(jax.random.split(key, 40))
        p: Dict = {}
        p["loc_fc"] = linear_init(next(ks), 5, cfg.loc_encoding_size)
        p["embed"] = embedding_init(next(ks), cfg.vocab_size,
                                    cfg.input_encoding_size)
        p["vis_embed"] = embedding_init(next(ks), cfg.detect_size + 1,
                                        cfg.vis_encoding_size)
        p["fc_embed"] = linear_init(next(ks), cfg.fc_feat_size_full,
                                    cfg.rnn_size)
        p["seg_info_embed"] = linear_init(next(ks), 4, cfg.seg_info_size)
        p["att_embed_rgb"] = linear_init(next(ks), cfg.rgb_feat_size,
                                         cfg.rnn_size // 2)
        p["att_embed_motion"] = linear_init(next(ks), cfg.motion_feat_size,
                                            cfg.rnn_size // 2)
        bn_p, bn_s = batch_norm_init(cfg.rnn_size)
        p["att_embed_aux"] = bn_p
        p["pool_embed"] = linear_init(next(ks), cfg.pool_feat_size,
                                      cfg.rnn_size)
        p["ctx2att"] = linear_init(next(ks), cfg.rnn_size, cfg.att_hid_size)
        p["ctx2pool"] = linear_init(next(ks), cfg.rnn_size, cfg.att_hid_size)
        # logit width padded to cfg.vocab_pad_to so the TP 'model' axis
        # divides it (pad columns masked in logit_logprobs)
        p["logit"] = linear_init(next(ks), cfg.rnn_size,
                                 cfg.vocab_size_padded)
        p["ctx2pool_grd"] = linear_init(next(ks), cfg.att_feat_size,
                                        cfg.vis_encoding_size)
        p["context_enc"] = birnn_init(next(ks), cfg.rnn_size,
                                      cfg.rnn_size // 2, 2, cfg.t_attn_mode)

        # model-level grounder head (model.py:55-58).  The reference
        # sizes this by att_hid_size, which only type-checks when
        # vis_encoding_size == att_hid_size (it crashes otherwise); we
        # size it by the embeddings it actually scores.
        if cfg.region_attn_mode == "add":
            p["alpha_net"] = linear_init(next(ks), cfg.vis_encoding_size, 1)
        elif cfg.region_attn_mode == "cat":
            p["alpha_net"] = linear_init(
                next(ks), cfg.vis_encoding_size * 2, 1)

        if cfg.transfer_mode in ("cls", "both"):
            p["vis_classifiers_bias"] = jnp.zeros((cfg.detect_size + 1,))

        # TopDown core (AttModel.py:111-131).  The reference also
        # allocates unused i2h_2/h2h_2 layers; not reproduced.
        attn_width = {"add": cfg.att_hid_size, "mix": cfg.att_hid_size,
                      "mix_mul": cfg.att_hid_size,
                      "cat": cfg.att_hid_size * 2}.get(cfg.region_attn_mode)
        core = {
            "att_lstm": lstm_cell_init(
                next(ks), cfg.input_encoding_size + cfg.rnn_size, cfg.rnn_size),
            "lang_lstm": lstm_cell_init(
                next(ks), cfg.rnn_size * 2, cfg.rnn_size),
            "attn": {"h2att": linear_init(next(ks), cfg.rnn_size,
                                          cfg.att_hid_size),
                     "alpha_net": linear_init(next(ks), cfg.att_hid_size, 1)},
            "attn2": {"h2att": linear_init(next(ks), cfg.rnn_size,
                                           cfg.att_hid_size)},
        }
        if attn_width is not None:
            core["attn2"]["alpha_net"] = linear_init(next(ks), attn_width, 1)
        if cfg.att_input_mode == "dual_region":
            core["attn2_dual"] = {
                "h2att": linear_init(next(ks), cfg.rnn_size, cfg.att_hid_size)}
            if attn_width is not None:
                core["attn2_dual"]["alpha_net"] = linear_init(
                    next(ks), attn_width, 1)
            core["dual_pointer"] = linear_init(next(ks), cfg.rnn_size, 1)
        p["core"] = core

        if cfg.obj_interact:
            # 2 layers, 6 heads, d_hidden = rnn/2 (model.py:126-135)
            p["obj_interact"] = xf.encoder_init(
                next(ks), cfg.rnn_size, cfg.rnn_size // 2, 2)

        if cfg.att_model == "transformer":
            p["cap_model"] = xf.decoder_init(
                next(ks), cfg.rnn_size, cfg.rnn_size // 2, cfg.vocab_size, 2)

        return {"params": p, "state": {"bn": bn_s}}

    # ------------------------------------------------------------------ #
    # shared encode path (model.py:302-409 / 504-568)
    # ------------------------------------------------------------------ #

    def encode(self, params: Dict, bn_state: Dict, batch: Dict, *,
               train: bool, rng=None) -> Tuple[Dict, Dict]:
        cfg = self.cfg
        p = params
        dt = self.dtype
        segs_feat = batch["seg_feat"].astype(dt)              # (B, T, F)
        ppls = batch["ppls"].astype(jnp.float32)              # (B, R, 7)
        ppls_feat = batch["ppls_feat"].astype(dt)             # (B, R, 2048)
        num = batch["num"].astype(dt)                         # (B, 7)
        sample_idx = batch["sample_idx"].astype(jnp.int32)    # (B, 2)
        pnt_mask = batch["pnt_mask"].astype(bool)             # (B, R+1)
        B, R = ppls.shape[:2]
        drop = cfg.drop_prob_lm
        r = _split(rng, 10)

        # fc feature: mean frame feat (LN) ++ segment-position info (LN)
        fc_raw = jnp.mean(segs_feat, axis=1)
        seg_info = jax.nn.relu(linear(p["seg_info_embed"], num[:, 3:7]))
        seg_info = dropout(r[0], seg_info, drop, train=train)
        fc_feats = jnp.concatenate(
            [layer_norm(fc_raw), layer_norm(seg_info)], axis=-1)

        # region features through the (transferred) fc7 layer
        g_pool_feats = jax.nn.relu(linear(p["ctx2pool_grd"], ppls_feat))
        g_pool_feats = dropout(r[1], g_pool_feats, drop, train=train)

        # visual-word embeddings for all classes (model.py:321-326)
        vis_ids = jnp.arange(cfg.detect_size + 1)
        vis_word_embed = jax.nn.relu(embedding(p["vis_embed"], vis_ids))
        vis_word_embed = dropout(r[2], vis_word_embed, drop,
                                 train=train).astype(dt)
        p_vis_word = jnp.broadcast_to(
            vis_word_embed[None], (B,) + vis_word_embed.shape)

        if "vis_classifiers_bias" in p:
            bias = jnp.broadcast_to(
                p["vis_classifiers_bias"][None, :, None],
                (B, cfg.detect_size + 1, R))
        else:
            bias = None

        sim_logits = grounder(
            p_vis_word, g_pool_feats, pnt_mask[:, 1:], bias,
            alpha_params=p.get("alpha_net") if self.grounder_additive else None,
            additive_cat=cfg.region_attn_mode == "cat")
        sim_mat_static = jax.nn.softmax(
            sim_logits.astype(jnp.float32), axis=1)           # over classes

        if not cfg.enable_BUTD:
            loc_input = jnp.concatenate(
                [ppls[:, :, :4] / 720.0,
                 ppls[:, :, 4:5] / cfg.num_sampled_frm],
                axis=-1).astype(dt)
            loc_feats = jax.nn.relu(linear(p["loc_fc"], loc_input))
            loc_feats = dropout(r[3], loc_feats, cfg.loc_drop, train=train)
            label_feat = jnp.swapaxes(sim_mat_static, 1,
                                      2).astype(dt)            # (B, R, C+1)
            # pool_embed(concat(LN(g), LN(loc), LN(label))) computed as
            # three row-block matmuls: the (B, R, 2780) concat never
            # materializes in HBM (~1.1 GB of write+read saved per
            # encode at B=100); identical math up to fp association
            w = p["pool_embed"]["w"].astype(dt)
            d1 = g_pool_feats.shape[-1]
            d2 = d1 + loc_feats.shape[-1]
            pool_pre = (
                jnp.dot(layer_norm(g_pool_feats).astype(dt), w[:d1])
                + jnp.dot(layer_norm(loc_feats).astype(dt), w[d1:d2])
                + jnp.dot(layer_norm(label_feat), w[d2:]))
            if "b" in p["pool_embed"]:
                pool_pre = pool_pre + p["pool_embed"]["b"].astype(dt)
            pool_feats = jax.nn.relu(pool_pre)
        else:
            pool_feats = jax.nn.relu(
                linear(p["pool_embed"], g_pool_feats))

        fc_emb = jax.nn.relu(linear(p["fc_embed"], fc_feats))
        fc_emb = dropout(r[4], fc_emb, drop, train=train)
        pool_feats = dropout(r[5], pool_feats, drop, train=train)

        if "obj_interact" in p:
            fused_train = (train and cfg.use_pallas_encoder_train
                           and jax.default_backend() == "tpu")
            attn_impl = (cfg.attn_train_impl
                         if jax.default_backend() == "tpu" else "xla")

            def _obj_interact(pf):
                if (not train and cfg.use_pallas_encoder
                        and jax.default_backend() == "tpu"):
                    # whole-layer fused kernel: scores stay in VMEM
                    # (ops/pallas/encoder_layer.py); inference only
                    from grounded_video_description_tpu.ops.pallas \
                        .encoder_layer import encoder_apply_fused
                    return encoder_apply_fused(
                        p["obj_interact"], pf, n_heads=6)[-1]
                if fused_train:
                    # hand fwd+bwd kernel with in-kernel dropout: the
                    # only autodiff residual is the layer input, so no
                    # remat wrap is needed either
                    from grounded_video_description_tpu.ops.pallas \
                        .encoder_layer_train import (
                            encoder_apply_fused_train)
                    return encoder_apply_fused_train(
                        p["obj_interact"], pf, n_heads=6,
                        drop=cfg.enc_drop, rng=r[6])[-1]
                return xf.encoder_apply(
                    p["obj_interact"], pf, n_heads=6,
                    drop=cfg.enc_drop, train=train, rng=r[6],
                    use_pallas=(cfg.use_pallas_mha
                                and jax.default_backend() == "tpu"),
                    attn_train_impl=attn_impl)[-1]

            if train and cfg.remat and not fused_train \
                    and attn_impl == "xla":
                # the (B, R, R) attention intermediates dominate
                # training memory; recompute them in the backward pass.
                # skipped when the attention-train primitive is active:
                # it already regenerates probs in VMEM (its only
                # residuals are q/k/v), so rematting would rerun the
                # Pallas forward for nothing
                _obj_interact = jax.checkpoint(_obj_interact)
            elif train and cfg.obj_interact_probs_remat \
                    and not fused_train and attn_impl == "xla":
                # finer-grained than the whole-function checkpoint
                # above: store every residual EXCEPT the (B, R, R)
                # score/prob/mask tensors (tagged in transformer._mha),
                # which are regenerated in the backward from the saved
                # q/k projections — same rng replay, same math
                # (f64-verified, tests/test_transformer.py)
                _obj_interact = jax.checkpoint(
                    _obj_interact,
                    policy=jax.checkpoint_policies
                    .save_anything_except_these_names("attn_probs"))
            pool_feats = _obj_interact(pool_feats)

        p_pool_feats = linear(p["ctx2pool"], pool_feats)

        new_bn_state = bn_state
        if cfg.att_input_mode in ("both", "featmap"):
            rgb = segs_feat[:, :, :cfg.rgb_feat_size]
            motion = segs_feat[:, :, cfg.rgb_feat_size:]
            conv = jnp.concatenate([
                dropout(r[7], jax.nn.relu(linear(p["att_embed_rgb"], rgb)),
                        drop, train=train),
                dropout(r[8], jax.nn.relu(linear(p["att_embed_motion"],
                                                 motion)),
                        drop, train=train)], axis=-1)
            conv, new_bn_state = batch_norm(
                p["att_embed_aux"], bn_state["bn"], conv, train=train)
            conv = jax.nn.relu(conv)
            conv = birnn(p["context_enc"], conv, mode=cfg.t_attn_mode,
                         hidden=cfg.rnn_size // 2,
                         dropout_rate=cfg.enc_drop,
                         train=train, rng=r[9],
                         use_pallas=(cfg.use_pallas_rnn
                                     and jax.default_backend() == "tpu"),
                         unroll=cfg.birnn_unroll,
                         remat=cfg.birnn_remat and train)
            # zero frames outside the segment window (model.py:303-305, 401)
            t_ids = jnp.arange(cfg.t_attn_size)[None, :]
            inside = ((t_ids >= sample_idx[:, :1])
                      & (t_ids < sample_idx[:, 1:2]))    # (B, T)
            conv_feats = jnp.where(inside[..., None], conv, 0.0)
            p_conv_feats = linear(p["ctx2att"], conv_feats)
            new_bn_state = {"bn": new_bn_state}
        else:
            conv_feats = jnp.zeros((B, 1, cfg.rnn_size), dt)
            p_conv_feats = jnp.zeros((B, 1, cfg.att_hid_size), dt)
            new_bn_state = bn_state

        return {
            "fc_feats": fc_emb,
            "conv_feats": conv_feats,
            "p_conv_feats": p_conv_feats,
            "pool_feats": pool_feats,
            "p_pool_feats": p_pool_feats,
            "g_pool_feats": g_pool_feats,
            "sim_mat_static": sim_mat_static,       # class-softmaxed
            "sim_logits": sim_logits,               # pre-softmax
            "pnt_mask": pnt_mask,
        }, new_bn_state

    # ------------------------------------------------------------------ #
    # TopDown core step (AttModel.py:134-164)
    # ------------------------------------------------------------------ #

    def core_step(self, core: Dict, xt, fc_feats, conv_feats, p_conv_feats,
                  pool_feats, p_pool_feats, att_mask, pnt_mask,
                  state: CoreState, *, train: bool, rng=None):
        cfg = self.cfg
        att_in = jnp.concatenate([fc_feats, xt], axis=1)
        h_att, (h_att_, c_att) = lstm_cell(
            core["att_lstm"], att_in, (state.h_att, state.c_att))

        if cfg.att_input_mode != "region":
            att = temporal_attention(core["attn"], h_att, conv_feats,
                                     p_conv_feats)
        att2, att2_weight, att_h = region_attention(
            core["attn2"], h_att, pool_feats, p_pool_feats,
            att_mask[:, 1:], pnt_mask[:, 1:], mode=cfg.region_attn_mode,
            use_pallas=cfg.use_pallas)

        if cfg.att_input_mode == "both":
            lang_in = att + att2
        elif cfg.att_input_mode == "featmap":
            lang_in = att
        elif cfg.att_input_mode == "region":
            lang_in = att2
        elif cfg.att_input_mode == "dual_region":
            att2_dual, _, _ = region_attention(
                core["attn2_dual"], h_att, pool_feats, p_pool_feats,
                att_mask[:, 1:], pnt_mask[:, 1:], mode=cfg.region_attn_mode,
                use_pallas=cfg.use_pallas)
            dual_p = jax.nn.sigmoid(linear(core["dual_pointer"], h_att))
            lang_in = dual_p * att2 + (1.0 - dual_p) * att2_dual
        else:
            raise ValueError(cfg.att_input_mode)

        lang_lstm_in = jnp.concatenate([lang_in, h_att], axis=1)
        h_lang, (h_lang_, c_lang) = lstm_cell(
            core["lang_lstm"], lang_lstm_in, (state.h_lang, state.c_lang))
        output = dropout(rng, h_lang, cfg.drop_prob_lm, train=train)
        new_state = CoreState(h_att_, c_att, h_lang_, c_lang)
        return output, new_state, att2_weight, att_h

    def core_step_beam(self, core: Dict, xt, fc_feats, conv_feats,
                       p_conv_feats, pool_feats, p_pool_feats, pnt_mask,
                       state: CoreState, W: int):
        """TopDown core step for beam search with SHARED attention
        banks: per-beam state is (B*W, ...) but the conv/pool banks
        stay (B, ...) — the reference (and our jit path) would tile
        them W-fold (model.py:710-718).  Identical math."""
        cfg = self.cfg
        B = fc_feats.shape[0]
        fc_bw = jnp.broadcast_to(
            fc_feats[:, None], (B, W, fc_feats.shape[-1])
        ).reshape(B * W, -1)
        att_in = jnp.concatenate([fc_bw, xt], axis=1)
        h_att, (h_att_, c_att) = lstm_cell(
            core["att_lstm"], att_in, (state.h_att, state.c_att))
        h3 = h_att.reshape(B, W, -1)

        from grounded_video_description_tpu.ops.attention import (
            region_attention_beam, temporal_attention_beam)

        if cfg.att_input_mode != "region":
            att = temporal_attention_beam(core["attn"], h3, conv_feats,
                                          p_conv_feats)
        att2, att2_w, _ = region_attention_beam(
            core["attn2"], h3, pool_feats, p_pool_feats,
            pnt_mask[:, 1:], pnt_mask[:, 1:], mode=cfg.region_attn_mode)

        if cfg.att_input_mode == "both":
            lang_in = att + att2
        elif cfg.att_input_mode == "featmap":
            lang_in = att
        elif cfg.att_input_mode == "region":
            lang_in = att2
        elif cfg.att_input_mode == "dual_region":
            att2_dual, _, _ = region_attention_beam(
                core["attn2_dual"], h3, pool_feats, p_pool_feats,
                pnt_mask[:, 1:], pnt_mask[:, 1:],
                mode=cfg.region_attn_mode)
            dual_p = jax.nn.sigmoid(linear(core["dual_pointer"], h3))
            lang_in = dual_p * att2 + (1.0 - dual_p) * att2_dual
        else:
            raise ValueError(cfg.att_input_mode)

        lang_lstm_in = jnp.concatenate(
            [lang_in.reshape(B * W, -1), h_att], axis=1)
        h_lang, (h_lang_, c_lang) = lstm_cell(
            core["lang_lstm"], lang_lstm_in, (state.h_lang, state.c_lang))
        new_state = CoreState(h_att_, c_att, h_lang_, c_lang)
        return h_lang, new_state, att2_w.reshape(B * W, -1)

    def _transformer_encodings(self, p, conv_feats, pool_feats):
        """Cross-attention memory pair for the 2-layer Masked-Transformer
        captioner: decoder layer i attends encodings[i]
        (model.py:411-417, transformer.py:206-212)."""
        mode = self.cfg.att_input_mode
        if mode == "both":
            return [conv_feats, pool_feats]
        if mode == "featmap":
            return [conv_feats, conv_feats]
        return [pool_feats, pool_feats]

    def init_state(self, batch_size: int) -> CoreState:
        z = jnp.zeros((batch_size, self.cfg.rnn_size), self.dtype)
        return CoreState(z, z, z, z)

    # ------------------------------------------------------------------ #
    # embeddings
    # ------------------------------------------------------------------ #

    def embed_words(self, params, ids, *, train: bool, rng=None):
        x = jax.nn.relu(embedding(params["embed"], ids))
        return dropout(rng, x, self.cfg.drop_prob_lm,
                       train=train).astype(self.dtype)

    def logit_logprobs(self, params, x, *, beta: float = 1.0):
        """Vocab log-probabilities from the (possibly padded) logit head
        (model.py:464, 612).  Pad columns are forced to MIN_VALUE before
        the log_softmax — exp underflows to exactly 0 in f32, so the
        distribution over the real vocab is unchanged — and sliced away,
        keeping every caller's shapes in terms of the true vocab."""
        cfg = self.cfg
        logits = linear(params["logit"], x).astype(jnp.float32)
        if beta != 1.0:
            logits = beta * logits
        V, Vp = cfg.vocab_size, cfg.vocab_size_padded
        if Vp > V:
            pad = jnp.arange(Vp) >= V
            logits = jnp.where(pad, MIN_VALUE, logits)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return lp[..., :V] if Vp > V else lp

    def embed_vis_words(self, params, ids, *, train: bool, rng=None):
        x = jax.nn.relu(embedding(params["vis_embed"], ids))
        return dropout(rng, x, self.cfg.drop_prob_lm,
                       train=train).astype(self.dtype)

    # ------------------------------------------------------------------ #
    # MLE / GRD forward (model.py:283-489)
    # ------------------------------------------------------------------ #

    def supervision(self, batch: Dict) -> Dict[str, jnp.ndarray]:
        """Parameter-free MLE supervision tensors + mask counts,
        computed from the batch alone (utils.py:293-328,
        model.py:342-355, 436-440 semantics).

        Gradient accumulation precomputes this ONCE for the full batch
        and slices it per microbatch — both for the exact
        count-renormalization denominators (each microbatch's masked
        mean is scaled by `count / total_count`, the trick the
        explicit-SPMD step uses, parallel/spmd.py:47-58, making the
        accumulated gradient exactly the full-batch gradient) and so
        `forward` skips rebuilding the (L, sb, R) ROI-label and
        frame-mask tensors once per microbatch.

        Returns batch-major tensors: sim_target (B, K, R),
        roi_labels (sb, L, R), step_pnt (sb, L, R+1), plus scalar
        txt/roi/cls counts.  Transformer family: counts only (it has
        no box supervision).
        """
        cfg = self.cfg
        gt_seq = batch["gt_seq"].astype(jnp.int32)
        B = gt_seq.shape[0]
        S = cfg.seq_per_img
        Lq = cfg.seq_length
        sb = B * S
        tgt = gt_seq[:, :S, :].reshape(sb, Lq)
        if cfg.att_model == "transformer":
            # decoder_xe_loss denominator: non-pad targets
            # (transformer.py:246-247)
            txt_count = jnp.sum(tgt > 0).astype(jnp.float32)
            return {"txt_count": txt_count, "roi_count": jnp.ones(()),
                    "cls_count": jnp.ones(())}
        # txt mask includes the END position: [1, tgt[:-1] > 0]
        txt_count = (jnp.sum(tgt[:, :Lq - 1] > 0) + sb).astype(jnp.float32)
        ppls = batch["ppls"].astype(jnp.float32)
        gt_boxes = batch["gt_boxes"].astype(jnp.float32)
        mask_boxes = batch["mask_boxes"].astype(bool)
        frm_mask = batch["frm_mask"].astype(bool)
        pnt_mask = batch["pnt_mask"].astype(bool)
        overlaps = bbox_overlaps(
            ppls, gt_boxes, frm_mask | pnt_mask[:, 1:, None])
        sim_target = sim_mat_target(overlaps, gt_boxes[:, :, 5])
        cls_count = jnp.sum(sim_target > 0).astype(jnp.float32)
        overlaps_sb = (jnp.repeat(overlaps, S, axis=0) if S > 1
                       else overlaps)
        # ROI labels: box_mask at step i+1 over all seq_per_img
        # (utils.py:307-328 via model.py:431-433)
        mb = mask_boxes.reshape(sb, -1, Lq + 1)
        step_mask = jnp.moveaxis(mb[:, :, 1:], 2, 0)           # (L, sb, K)
        roi_labels = jax.vmap(
            lambda m: bbox_target(m, overlaps_sb))(step_mask)  # (L, sb, R)
        roi_count = jnp.sum(roi_labels > 0).astype(jnp.float32)
        # frame mask on proposals per step (model.py:436-440),
        # built from the FIRST caption's box mask (reference quirk)
        bm0 = mask_boxes[:, 0, :, 1:]                          # (B, K, L)
        bm0 = jnp.moveaxis(bm0, 2, 0)                          # (L, B, K)
        keep = (~(bm0[:, :, None, :] | frm_mask[None]))        # (L,B,R,K)
        no_frame = jnp.sum(keep, axis=3) <= 0                  # (L, B, R)
        frm_on_prop = jnp.concatenate(
            [jnp.zeros((Lq, B, 1), bool), no_frame], axis=2)
        frm_on_prop = frm_on_prop | pnt_mask[None]             # (L, B, R+1)
        if S > 1:
            frm_on_prop = jnp.repeat(frm_on_prop, S, axis=1)
        return {"txt_count": txt_count, "roi_count": roi_count,
                "cls_count": cls_count,
                "sim_target": sim_target,
                "roi_labels": jnp.moveaxis(roi_labels, 0, 1),
                "step_pnt": jnp.moveaxis(frm_on_prop, 0, 1)}

    def batch_loss_counts(self, batch: Dict) -> Dict[str, jnp.ndarray]:
        """Mask counts (masked-mean denominators) of each MLE loss
        term — the scalar subset of `supervision` (kept for the
        explicit-SPMD path and tests)."""
        sup = self.supervision(batch)
        return {k: sup[k] for k in ("txt_count", "roi_count",
                                    "cls_count")}

    def forward(self, variables: Dict, batch: Dict, *, mode: str = "MLE",
                train: bool = True, rng=None, sup: Optional[Dict] = None):
        """mode 'MLE' -> (losses dict, new_model_state);
        mode 'GRD' -> grounding-eval outputs (see below).

        `sup`: optional precomputed `supervision(batch)` tensors (MLE
        only) — the grad-accumulation step computes them once for the
        full batch and passes per-microbatch slices, so the IoU /
        ROI-label / frame-mask assembly is not redone per microbatch."""
        assert mode in ("MLE", "GRD")
        cfg = self.cfg
        p = variables["params"]
        eval_obj_ground = mode == "GRD"
        if eval_obj_ground:
            train = False

        gt_seq = batch["gt_seq"].astype(jnp.int32)            # (B, 10, L)
        input_seq = batch["input_seq"].astype(jnp.int32)      # (B, S, L+1, 4)
        ppls = batch["ppls"].astype(jnp.float32)
        gt_boxes = batch["gt_boxes"].astype(jnp.float32)      # (B, K, 6)
        mask_boxes = batch["mask_boxes"].astype(bool)         # (B, S, K, L+1)
        frm_mask = batch["frm_mask"].astype(bool)             # (B, R, K)
        pnt_mask = batch["pnt_mask"].astype(bool)             # (B, R+1)

        B, R = ppls.shape[:2]
        S = cfg.seq_per_img
        Lq = cfg.seq_length
        sb = B * S

        r = _split(rng, 6)

        # teacher-forcing sequence: first S gt captions, BOS prepended
        seq = gt_seq[:, :S, :].reshape(sb, Lq)
        seq = jnp.concatenate([jnp.zeros((sb, 1), jnp.int32), seq], axis=1)
        iseq = input_seq.reshape(sb, Lq + 1, 4)

        if train and self.cfg.remat:
            # rematerialize the encode stage in the backward pass: the
            # (B, R, 2780) pool concat and friends dominate residuals
            enc, new_bn = jax.checkpoint(
                lambda pp, st, bb: self.encode(pp, st, bb, train=train,
                                               rng=r[0]))(
                p, variables["state"], batch)
        else:
            enc, new_bn = self.encode(p, variables["state"], batch,
                                      train=train, rng=r[0])

        if sup is None:
            # overlaps with frame+proposal masking (model.py:317-318)
            overlaps = bbox_overlaps(
                ppls, gt_boxes, frm_mask | pnt_mask[:, 1:, None])  # (B,R,K)
            # region-cls supervision (model.py:342-355)
            sim_target = sim_mat_target(
                overlaps, gt_boxes[:, :, 5])                   # (B, K, R)
        else:
            sim_target = sup["sim_target"]
        if not eval_obj_ground:
            cls_loss, cls_count = L.cls_criterion_with_counts(
                enc["sim_mat_static"], sim_target)
            cls_out = cls_loss
        else:
            pred_cls = jnp.argmax(enc["sim_mat_static"], axis=1)  # (B, R)
            cls_out = (sim_target, pred_cls)

        def expand(x):
            return jnp.repeat(x, S, axis=0) if S > 1 else x

        fc_feats = expand(enc["fc_feats"])
        conv_feats = expand(enc["conv_feats"])
        p_conv_feats = expand(enc["p_conv_feats"])
        pool_feats = expand(enc["pool_feats"])
        p_pool_feats = expand(enc["p_pool_feats"])
        g_pool_feats = expand(enc["g_pool_feats"])
        pnt_mask_sb = expand(pnt_mask)

        # ---- Masked-Transformer captioner family (model.py:411-419).
        # It has no box supervision; only the LM loss is meaningful.
        if cfg.att_model == "transformer":
            encodings = self._transformer_encodings(
                p, conv_feats, pool_feats)
            lm_loss = xf.decoder_xe_loss(
                p["cap_model"], encodings, seq, n_heads=6,
                drop=cfg.enc_drop, train=train, rng=r[4])
            zero = jnp.zeros(())
            # txt_count is the EXACT denominator of decoder_xe_loss's
            # masked mean (transformer.py:246-247: non-pad targets) —
            # count renormalization (SPMD / grad accumulation) relies
            # on it; the topdown path uses a different convention
            # (shifted mask incl. the END slot, losses.py:50-52)
            txt_count = jnp.sum(seq[:, 1:] > 0).astype(jnp.float32)
            return ({"lm_loss": lm_loss, "att2_loss": zero,
                     "ground_loss": zero, "cls_loss": zero,
                     "txt_count": txt_count,
                     "roi_count": jnp.ones(()),
                     "cls_count": jnp.ones(())}, new_bn)

        # ---- per-step supervision tensors, precomputed (B*, T, ...) ----
        if not eval_obj_ground and sup is not None:
            roi_labels_sb = sup["roi_labels"]                  # (sb, L, R)
            step_pnt = jnp.moveaxis(sup["step_pnt"], 0, 1)     # (L, sb, R+1)
        elif not eval_obj_ground:
            # ROI labels: box_mask at step i+1 over all seq_per_img
            # (utils.py:307-328 via model.py:431-433); the GRD branch
            # consumes none of this, so it is only built for MLE
            overlaps_sb = expand(overlaps)
            mb = mask_boxes.reshape(sb, -1, Lq + 1)           # (sb, K, L+1)
            step_mask = jnp.moveaxis(mb[:, :, 1:], 2, 0)      # (L, sb, K)
            roi_labels = jax.vmap(
                lambda m: bbox_target(m, overlaps_sb))(
                    step_mask)                                 # (L, sb, R)
            roi_labels_sb = jnp.moveaxis(roi_labels, 0, 1)    # (sb, L, R)
            # frame mask on proposals per step (model.py:436-440),
            # built from the FIRST caption's box mask (reference quirk)
            bm0 = mask_boxes[:, 0, :, 1:]                      # (B, K, L)
            bm0 = jnp.moveaxis(bm0, 2, 0)                      # (L, B, K)
            keep = (~(bm0[:, :, None, :] | frm_mask[None]))    # (L,B,R,K)
            no_frame = jnp.sum(keep, axis=3) <= 0              # (L, B, R)
            frm_on_prop = jnp.concatenate(
                [jnp.zeros((Lq, B, 1), bool), no_frame], axis=2)
            frm_on_prop = frm_on_prop | pnt_mask[None]         # (L, B, R+1)
            if S > 1:
                frm_on_prop = jnp.repeat(frm_on_prop, S, axis=1)
            step_pnt = frm_on_prop                             # (L, sb, R+1)
        else:
            step_pnt = jnp.broadcast_to(pnt_mask_sb[None],
                                        (Lq,) + pnt_mask_sb.shape)

        # ---- the hot scan over decode steps (model.py:421-453) ----
        xt_all = self.embed_words(p, seq[:, :Lq], train=train, rng=r[1])
        xt_steps = jnp.moveaxis(xt_all, 1, 0)                  # (L, sb, E)
        step_rngs = (jnp.stack(_split(r[2], Lq))
                     if r[2] is not None else None)

        def scan_step(state, inp):
            if step_rngs is not None:
                xt, pmask, srng = inp
            else:
                xt, pmask = inp
                srng = None
            out, new_state, att2_w, att_h = self.core_step(
                p["core"], xt, fc_feats, conv_feats, p_conv_feats,
                pool_feats, p_pool_feats, pnt_mask_sb, pmask, state,
                train=train, rng=srng)
            return new_state, (out, att2_w, att_h)

        xs = (xt_steps, step_pnt, step_rngs) if step_rngs is not None \
            else (xt_steps, step_pnt)
        body = scan_step
        if train and (cfg.remat or cfg.decode_scan_remat):
            # per-step region-attention activations are recomputed in
            # the backward pass instead of stored for all 20 steps —
            # measured FASTER as well as smaller (the (sb, R, att_hid)
            # residual stores cost more HBM traffic than the recompute
            # FLOPs; docs/DESIGN.md §Decode-scan training bucket)
            body = jax.checkpoint(scan_step)
        _, (outs, att2_ws, att_hs) = jax.lax.scan(
            body, self.init_state(sb), xs,
            unroll=(cfg.decode_scan_unroll if train else 1))

        rnn_output = jnp.moveaxis(outs, 0, 1)                  # (sb, L, rnn)
        att2_weights = jnp.moveaxis(att2_ws, 0, 1)             # (sb, L, R)
        frm_mask_output = jnp.moveaxis(step_pnt, 0, 1)         # (sb, L, R+1)

        decoded = self.logit_logprobs(p, rnn_output)           # (sb, L, V)

        # grounding scorer over the target's visual words
        # (model.py:467-480)
        xt_clamp = jnp.maximum(iseq[:, 1:Lq + 1, 0] - cfg.vocab_size, 0)
        xt_vis = self.embed_vis_words(p, xt_clamp, train=train, rng=r[3])
        if "vis_classifiers_bias" in p:
            g_bias = p["vis_classifiers_bias"][xt_clamp][..., None]
        else:
            g_bias = 0.0

        if not eval_obj_ground:
            ground_weights = grounder(
                xt_vis, g_pool_feats, frm_mask_output[:, :, 1:],
                g_bias + att2_weights,
                alpha_params=(p.get("alpha_net")
                              if self.grounder_additive else None),
                additive_cat=cfg.region_attn_mode == "cat")
            lm_loss, att2_loss, ground_loss, txt_count, roi_count = \
                L.lm_criterion_with_counts(
                    decoded, att2_weights, ground_weights,
                    seq[:, 1:Lq + 1], roi_labels_sb)
            new_vars_state = new_bn
            # *_count: per-shard mask counts; an explicit-SPMD step
            # uses them to form exact global masked means when shards
            # carry different numbers of selected elements
            return ({"lm_loss": lm_loss, "att2_loss": att2_loss,
                     "ground_loss": ground_loss, "cls_loss": cls_out,
                     "txt_count": txt_count, "roi_count": roi_count,
                     "cls_count": cls_count},
                    new_vars_state)
        else:
            ground_weights = grounder(
                xt_vis, g_pool_feats, pnt_mask_sb[:, 1:],
                g_bias + att2_weights,
                alpha_params=(p.get("alpha_net")
                              if self.grounder_additive else None),
                additive_cat=cfg.region_attn_mode == "cat")
            # per-frame argmax over proposals (model.py:487-489)
            att2_ind = jnp.argmax(att2_weights.reshape(
                sb, Lq, cfg.num_sampled_frm, cfg.num_prop_per_frm), axis=-1)
            grd_ind = jnp.argmax(ground_weights.reshape(
                sb, Lq, cfg.num_sampled_frm, cfg.num_prop_per_frm), axis=-1)
            sim_target_out, pred_cls = cls_out
            return {"sim_target": sim_target_out, "pred_cls": pred_cls,
                    "att2_ind": att2_ind, "grd_ind": grd_ind}

    # ------------------------------------------------------------------ #
    # greedy sampling (model.py:492-624)
    # ------------------------------------------------------------------ #

    def sample_greedy(self, variables: Dict, batch: Dict, *,
                      rng=None, temperature: float = 1.0,
                      sample_max: bool = True, beta: float = 1.0):
        """Returns (seq (B,L), seqLogprobs (B,L), att2_weights (B,L,R),
        sim_mat_static (B,C+1,R))."""
        cfg = self.cfg
        p = variables["params"]
        if not sample_max and rng is None:
            raise ValueError("stochastic sampling requires rng")
        enc, _ = self.encode(p, variables["state"], batch,
                             train=False, rng=None)
        if cfg.quantize_banks:
            from grounded_video_description_tpu.ops.quantize import (
                quantize_rows)
            for k in ("pool_feats", "p_pool_feats", "conv_feats",
                      "p_conv_feats"):
                enc[k] = quantize_rows(
                    enc[k], group_size=cfg.quantize_group_size or None)
        pnt_mask = enc["pnt_mask"]
        B = pnt_mask.shape[0]
        Lq = cfg.seq_length

        if cfg.att_model == "transformer":
            # greedy Masked-Transformer inference (model.py:570-578)
            encodings = self._transformer_encodings(
                p, enc["conv_feats"], enc["pool_feats"])
            seq = xf.decoder_greedy(p["cap_model"], encodings, Lq,
                                    n_heads=6)
            zeros_lp = jnp.zeros((B, Lq), jnp.float32)
            dummy_att2 = jnp.zeros((B, Lq, cfg.max_proposal), jnp.float32)
            return seq, zeros_lp, dummy_att2, enc["sim_mat_static"]

        if (cfg.use_pallas_decode and sample_max and beta == 1.0
                and cfg.att_input_mode == "both"
                and cfg.region_attn_mode in ("add", "mix")
                and not cfg.quantize_banks
                and pnt_mask.shape[0] % 4 == 0
                and jax.default_backend() == "tpu"):
            # fused megakernel: banks stay in VMEM across all decode
            # steps (ops/pallas/decode_scan.py)
            from grounded_video_description_tpu.ops.pallas.decode_scan \
                import greedy_decode_fused
            seq, seq_lp, att2_weights = greedy_decode_fused(
                p, enc, pnt_mask, seq_length=Lq,
                vocab_size=cfg.vocab_size, unk_idx=self.unk_idx)
            return seq, seq_lp, att2_weights, enc["sim_mat_static"]

        sample_rngs = (jnp.stack(_split(rng, Lq))
                       if (rng is not None and not sample_max) else None)

        def step(carry, inp):
            state, prev_tok = carry
            t = inp if sample_rngs is None else inp[0]
            xt = self.embed_words(p, prev_tok, train=False)
            out, new_state, att2_w, _ = self.core_step(
                p["core"], xt, enc["fc_feats"], enc["conv_feats"],
                enc["p_conv_feats"], enc["pool_feats"], enc["p_pool_feats"],
                pnt_mask, pnt_mask, state, train=False)
            logprobs = self.logit_logprobs(p, out, beta=beta)
            if sample_max:
                # UNK-suppressed argmax (model.py:589-594).  Two argmax
                # reductions instead of lax.top_k(k=2): top_k lowers to
                # a full per-row sort of the 4906-wide vocab on TPU and
                # dominated the per-token step
                V = logprobs.shape[1]
                i1 = jnp.argmax(logprobs, axis=1)
                v1 = jnp.take_along_axis(
                    logprobs, i1[:, None], axis=1)[:, 0]
                masked = jnp.where(
                    jnp.arange(V)[None, :] == i1[:, None],
                    MIN_VALUE, logprobs)
                i2 = jnp.argmax(masked, axis=1)
                v2 = jnp.take_along_axis(
                    masked, i2[:, None], axis=1)[:, 0]
                use_first = i1 != self.unk_idx
                tok = jnp.where(use_first, i1, i2)
                lp = jnp.where(use_first, v1, v2)
            else:
                srng = inp[1]
                tok = jax.random.categorical(srng, logprobs / temperature,
                                             axis=1)
                lp = jnp.take_along_axis(
                    logprobs, tok[:, None], axis=1)[:, 0]
            tok = tok.astype(jnp.int32)
            return (new_state, tok), (tok, lp, att2_w)

        init = (self.init_state(B), jnp.zeros((B,), jnp.int32))
        ts = jnp.arange(Lq)
        xs = ts if sample_rngs is None else (ts, sample_rngs)
        _, (toks, lps, att2_ws) = jax.lax.scan(step, init, xs)

        seq = jnp.moveaxis(toks, 0, 1)
        seq_lp = jnp.moveaxis(lps, 0, 1)
        att2_weights = jnp.moveaxis(att2_ws, 0, 1)
        return seq, seq_lp, att2_weights, enc["sim_mat_static"]

    # ------------------------------------------------------------------ #
    # beam search — batched, fully on device (models/beam.py)
    # ------------------------------------------------------------------ #

    def sample_beam(self, variables: Dict, batch: Dict, *, beam_size: int,
                    beta: float = 1.0):
        from grounded_video_description_tpu.models.beam import beam_search
        p = variables["params"]
        enc, _ = self.encode(p, variables["state"], batch,
                             train=False, rng=None)
        return beam_search(self, p, enc, beam_size=beam_size, beta=beta)
