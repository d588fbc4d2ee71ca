"""Checkpoint / resume.

Capability contract from main.py:620-652, 702-743: `model.pth` +
`model-best.pth` equivalents saved every val epoch, best selected by
CIDEr, `infos` metadata (iter/epoch/best_val_score/vocab) persisted
alongside, resume restoring either latest or best.

Implementation: Orbax for the parameter/optimizer pytrees (async-safe,
sharding-aware on TPU) + a JSON sidecar for the scalar metadata
(replacing the reference's pickled Namespace).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


class CheckpointManager:
    def __init__(self, directory: str, *, async_save: bool = False):
        """async_save: Orbax writes proceed in the background; training
        resumes immediately after scheduling (the device->host copy is
        still synchronous, so the state snapshot is consistent).  Call
        `wait()` (or the next save/restore, which waits implicitly)
        before reading the files back."""
        self.dir = _abs(directory)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.async_save = async_save

    # ------------------------------------------------------------------ #

    def wait(self):
        self._ckptr.wait_until_finished()

    def _save_tree(self, name: str, tree: Any):
        path = os.path.join(self.dir, name)
        if self.async_save:
            # at most one outstanding async write
            self._ckptr.wait_until_finished()
        self._ckptr.save(path, tree, force=True)
        if not self.async_save:
            self._ckptr.wait_until_finished()

    def _restore_tree(self, name: str, template: Any) -> Any:
        self._ckptr.wait_until_finished()
        path = os.path.join(self.dir, name)
        return self._ckptr.restore(path, template)

    # ------------------------------------------------------------------ #

    def save(self, state, infos: Dict, *, best: bool = False):
        tree = {"params": state.params, "model_state": state.model_state,
                "opt_state": state.opt_state}
        self._save_tree("model", tree)
        with open(os.path.join(self.dir, "infos.json"), "w") as f:
            json.dump({**infos, "step": int(state.step)}, f)
        if best:
            self._save_tree("model-best", tree)
            with open(os.path.join(self.dir, "infos-best.json"), "w") as f:
                json.dump({**infos, "step": int(state.step)}, f)

    def restore(self, state, *, load_best: bool = True
                ) -> Tuple[Any, Dict]:
        name = "model-best" if load_best and os.path.isdir(
            os.path.join(self.dir, "model-best")) else "model"
        template = {"params": state.params,
                    "model_state": state.model_state,
                    "opt_state": state.opt_state}
        tree = self._restore_tree(name, template)
        infos_file = os.path.join(
            self.dir, "infos-best.json" if name == "model-best"
            else "infos.json")
        infos = {}
        if os.path.isfile(infos_file):
            with open(infos_file) as f:
                infos = json.load(f)
        from grounded_video_description_tpu.engine.trainer import TrainState
        new_state = TrainState(
            params=tree["params"], model_state=tree["model_state"],
            opt_state=tree["opt_state"], step=infos.get("step", 0))
        return new_state, infos


def import_torch_checkpoint(path, params: Dict) -> Dict:
    """Import of a reference `model.pth` state_dict into our parameter
    tree (torch CPU is available in the image).  Covers the
    shared-architecture layers; transposes Linear weights
    (torch stores (out, in), we store (in, out)).

    `path` is a file path or an already-loaded state_dict mapping;
    key-name coverage against the real reference module tree is pinned
    by tests/test_ref_parity.py::test_importer_consumes_all_torch_keys.
    """
    import torch

    sd = path if isinstance(path, dict) else torch.load(
        path, map_location="cpu")
    out = jax.tree.map(np.array, params)

    def put_linear(dst, prefix):
        w = sd.get(prefix + ".weight")
        if w is None:
            return
        wt = np.asarray(w).T
        if "w" in dst and dst["w"].shape != wt.shape:
            # wider target head (e.g. TP vocab padding): fill the
            # leading block, keep the (masked) pad columns as-is
            buf = np.array(dst["w"])
            buf[: wt.shape[0], : wt.shape[1]] = wt
            dst["w"] = buf
        else:
            dst["w"] = wt
        b = sd.get(prefix + ".bias")
        if b is not None and "b" in dst:
            bb = np.asarray(b)
            if dst["b"].shape != bb.shape:
                buf = np.array(dst["b"])
                buf[: bb.shape[0]] = bb
                dst["b"] = buf
            else:
                dst["b"] = bb

    put_linear(out["loc_fc"], "loc_fc.0")
    put_linear(out["fc_embed"], "fc_embed.0")
    put_linear(out["seg_info_embed"], "seg_info_embed.0")
    put_linear(out["pool_embed"], "pool_embed.0")
    put_linear(out["ctx2att"], "ctx2att")
    put_linear(out["ctx2pool"], "ctx2pool")
    put_linear(out["logit"], "logit")
    put_linear(out["ctx2pool_grd"], "ctx2pool_grd.0")
    put_linear(out["att_embed_rgb"], "att_embed.0.0")
    put_linear(out["att_embed_motion"], "att_embed.1.0")
    if "embed.0.weight" in sd:
        out["embed"]["w"] = np.asarray(sd["embed.0.weight"])
    if "vis_embed.0.weight" in sd:
        out["vis_embed"]["w"] = np.asarray(sd["vis_embed.0.weight"])
    if "vis_classifiers_bias" in sd and "vis_classifiers_bias" in out:
        out["vis_classifiers_bias"] = np.asarray(sd["vis_classifiers_bias"])

    # LSTM cells: torch keeps separate ih/hh biases; ours is fused
    for ours, theirs in (("att_lstm", "core.att_lstm"),
                         ("lang_lstm", "core.lang_lstm")):
        wi = sd.get(theirs + ".weight_ih")
        if wi is None:
            continue
        core = out["core"][ours]
        core["wi"] = np.asarray(wi).T
        core["wh"] = np.asarray(sd[theirs + ".weight_hh"]).T
        core["b"] = (np.asarray(sd[theirs + ".bias_ih"])
                     + np.asarray(sd[theirs + ".bias_hh"]))

    put_linear(out["core"]["attn"]["h2att"], "core.attention.h2att")
    put_linear(out["core"]["attn"]["alpha_net"], "core.attention.alpha_net")
    put_linear(out["core"]["attn2"]["h2att"], "core.attention2.h2att")
    if "core.attention2.alpha_net.weight" in sd \
            and "alpha_net" in out["core"]["attn2"]:
        put_linear(out["core"]["attn2"]["alpha_net"],
                   "core.attention2.alpha_net")
    if "core.attention2_dual.h2att.weight" in sd \
            and "attn2_dual" in out["core"]:
        put_linear(out["core"]["attn2_dual"]["h2att"],
                   "core.attention2_dual.h2att")
        if "alpha_net" in out["core"]["attn2_dual"]:
            put_linear(out["core"]["attn2_dual"]["alpha_net"],
                       "core.attention2_dual.alpha_net")
        put_linear(out["core"]["dual_pointer"], "core.dual_pointer.0")
    if "alpha_net.weight" in sd and "alpha_net" in out:
        put_linear(out["alpha_net"], "alpha_net")

    # bidirectional context encoder: torch GRU/LSTM stores per-layer,
    # per-direction weight_ih_l{k}[_reverse] with gate rows stacked
    # (GRU: r,z,n; LSTM: i,f,g,o — both match our column layout after
    # transposition)
    for li, layer in enumerate(out["context_enc"]["layers"]):
        for dirn, suffix in (("fwd", ""), ("bwd", "_reverse")):
            wi = sd.get(f"context_enc.weight_ih_l{li}{suffix}")
            if wi is None:
                continue
            wh = sd[f"context_enc.weight_hh_l{li}{suffix}"]
            bi = sd[f"context_enc.bias_ih_l{li}{suffix}"]
            bh = sd[f"context_enc.bias_hh_l{li}{suffix}"]
            cell = layer[dirn]
            cell["wi"] = np.asarray(wi).T
            cell["wh"] = np.asarray(wh).T
            if "bi" in cell:                    # GRU keeps both biases
                cell["bi"] = np.asarray(bi)
                cell["bh"] = np.asarray(bh)
            else:                               # LSTM uses the sum
                cell["b"] = np.asarray(bi) + np.asarray(bh)

    # obj_interact transformer encoder (model.py:126-135 layout):
    # obj_interact.encoder.layers.{i}.selfattn.layer.{wq,wk,wv,wo} and
    # .selfattn.layernorm.{gamma,beta}; feedforward.layer.linear{1,2}
    if "obj_interact" in out:
        for i, lp in enumerate(out["obj_interact"]["layers"]):
            base = f"obj_interact.encoder.layers.{i}"
            for name in ("wq", "wk", "wv", "wo"):
                put_linear(lp["selfattn"][name],
                           f"{base}.selfattn.layer.{name}")
            for ln_key, ln_name in (("ln1", "selfattn.layernorm"),
                                    ("ln2", "feedforward.layernorm")):
                g = sd.get(f"{base}.{ln_name}.gamma")
                if g is not None:
                    lp[ln_key]["gamma"] = np.asarray(g)
                    lp[ln_key]["beta"] = np.asarray(
                        sd[f"{base}.{ln_name}.beta"])
            put_linear(lp["ff"]["l1"],
                       f"{base}.feedforward.layer.linear1")
            put_linear(lp["ff"]["l2"],
                       f"{base}.feedforward.layer.linear2")

    # transformer captioner (cap_model.decoder.*)
    if "cap_model" in out:
        put_linear(out["cap_model"]["out"], "cap_model.decoder.out")
        for i, lp in enumerate(out["cap_model"]["layers"]):
            base = f"cap_model.decoder.layers.{i}"
            for blk, ours_attn, ours_ln in (
                    ("selfattn", "selfattn", "ln1"),
                    ("attention", "crossattn", "ln2")):
                for name in ("wq", "wk", "wv", "wo"):
                    put_linear(lp[ours_attn][name],
                               f"{base}.{blk}.layer.{name}")
                g = sd.get(f"{base}.{blk}.layernorm.gamma")
                if g is not None:
                    lp[ours_ln]["gamma"] = np.asarray(g)
                    lp[ours_ln]["beta"] = np.asarray(
                        sd[f"{base}.{blk}.layernorm.beta"])
            put_linear(lp["ff"]["l1"],
                       f"{base}.feedforward.layer.linear1")
            put_linear(lp["ff"]["l2"],
                       f"{base}.feedforward.layer.linear2")
            g = sd.get(f"{base}.feedforward.layernorm.gamma")
            if g is not None:
                lp["ln3"]["gamma"] = np.asarray(g)
                lp["ln3"]["beta"] = np.asarray(
                    sd[f"{base}.feedforward.layernorm.beta"])

    # batch-norm aux layer (att_embed_aux.0)
    if "att_embed_aux.0.weight" in sd:
        out["att_embed_aux"]["gamma"] = np.asarray(
            sd["att_embed_aux.0.weight"])
        out["att_embed_aux"]["beta"] = np.asarray(
            sd["att_embed_aux.0.bias"])

    if "vis_classifiers_bias" in sd and "vis_classifiers_bias" in out:
        out["vis_classifiers_bias"] = np.asarray(
            sd["vis_classifiers_bias"])
    return out


def import_torch_bn_state(path, model_state: Dict) -> Dict:
    """Imports the att_embed_aux BatchNorm running statistics
    (model.py:114-115) into the model-state collection.  `path` is a
    file path or an already-loaded state_dict mapping."""
    import torch

    sd = path if isinstance(path, dict) else torch.load(
        path, map_location="cpu")
    out = jax.tree.map(np.array, model_state)
    if "att_embed_aux.0.running_mean" in sd:
        out["bn"]["mean"] = np.asarray(sd["att_embed_aux.0.running_mean"])
        out["bn"]["var"] = np.asarray(sd["att_embed_aux.0.running_var"])
        if "att_embed_aux.0.num_batches_tracked" in sd:
            out["bn"]["count"] = np.asarray(
                sd["att_embed_aux.0.num_batches_tracked"], np.float32)
    return out
