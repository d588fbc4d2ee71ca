"""Full-pipeline CLI test: synthetic dataset on disk -> train 1 epoch
-> validate with language + grounding eval -> checkpoint written.
This is the framework-level integration test (mirrors the reference's
smoke-test-by-eval strategy, README.md:22-33)."""

import json
import os

import pytest

from grounded_video_description_tpu.config import tiny_test_config
from grounded_video_description_tpu.data.synthetic_files import (
    write_synthetic_dataset)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    cfg = tiny_test_config()
    paths = write_synthetic_dataset(str(root), cfg, n_train=4, n_val=4)
    return root, cfg, paths


def _argv(cfg, paths, extra):
    argv = []
    dims = dict(
        rnn_size=cfg.rnn_size, input_encoding_size=cfg.input_encoding_size,
        att_hid_size=cfg.att_hid_size, fc_feat_size=cfg.fc_feat_size,
        rgb_feat_size=cfg.rgb_feat_size,
        motion_feat_size=cfg.motion_feat_size,
        att_feat_size=cfg.att_feat_size, t_attn_size=cfg.t_attn_size,
        num_sampled_frm=cfg.num_sampled_frm,
        num_prop_per_frm=cfg.num_prop_per_frm, glove_dim=cfg.glove_dim,
        loc_encoding_size=cfg.loc_encoding_size,
        seg_info_size=cfg.seg_info_size, seq_length=cfg.seq_length,
        batch_size=2, max_epochs=1, val_every_epoch=1,
        drop_prob_lm=0.0, seed=11,
    )
    for k, v in dims.items():
        argv += [f"--{k}", str(v)]
    for k, v in paths.items():
        if k == "densecap_references":
            argv += ["--densecap_references"] + list(v)
        else:
            argv += [f"--{k}", str(v)]
    argv += extra
    return argv


def test_cli_train_eval_checkpoint(synth_root, tmp_path):
    import main as cli

    root, cfg, paths = synth_root
    ckpt_dir = str(tmp_path / "save")
    argv = _argv(cfg, paths, [
        "--checkpoint_path", ckpt_dir,
        "--language_eval", "--eval_obj_grounding",
        "--eval_obj_grounding_gt",
        "--id", "citest",
        "--w_att2", "0.05", "--w_cls", "0.1",
    ])
    rc = cli.main(argv)
    assert rc == 0
    # checkpoint + infos written
    assert os.path.isdir(os.path.join(ckpt_dir, "model"))
    assert os.path.isfile(os.path.join(ckpt_dir, "infos.json"))
    # densecap submission + grounding result files in reference format
    sub = "densecap_results/densecap-validation-citest.json"
    assert os.path.isfile(sub)
    with open(sub) as f:
        dc = json.load(f)
    assert "results" in dc and dc["version"] == "VERSION 1.0"
    attn_gen = "results/attn-gen-sent-results-validation-citest.json"
    assert os.path.isfile(attn_gen)
    with open(attn_gen) as f:
        gen = json.load(f)
    assert gen["eval_mode"] == "gen"
    attn_gt = "results/attn-gt-sent-results-validation-citest.json"
    with open(attn_gt) as f:
        gt = json.load(f)
    assert gt["eval_mode"] == "GT"
    # GT grounding entries carry 4-frame box lists (tiny config)
    any_seg = next(iter(next(iter(gt["results"].values())).values()))
    if any_seg["clss"]:
        assert len(any_seg["bbox_for_all_frames"][0]) == cfg.num_sampled_frm


def test_cli_beam_inference(synth_root, tmp_path):
    """Beam-search decoding through the full CLI eval pipeline."""
    import main as cli

    root, cfg, paths = synth_root
    argv = _argv(cfg, paths, [
        "--checkpoint_path", str(tmp_path / "save_beam"),
        "--inference_only", "--language_eval",
        "--beam_size", "2", "--id", "cibeam",
    ])
    assert cli.main(argv) == 0
    sub = "densecap_results/densecap-validation-cibeam.json"
    with open(sub) as f:
        dc = json.load(f)
    # every val segment captioned
    n = sum(len(v) for v in dc["results"].values())
    assert n == 8


def test_cli_multidevice_mesh(synth_root, tmp_path):
    """Full driver on the virtual 8-device CPU mesh: DP=4 x TP=2.
    The reference's multi-GPU entry point is nn.DataParallel
    (main.py:654-655); ours is a jit-sharded mesh with the vocab
    logit padded to the model axis and sharded.  grad_accum=2 on top
    exercises the accumulation scan's microbatch sharding constraint
    (each microbatch of 2 spans the 2-device data axis)."""
    import main as cli

    root, cfg, paths = synth_root
    ckpt_dir = str(tmp_path / "save_mesh")
    argv = _argv(cfg, paths, [
        "--checkpoint_path", ckpt_dir, "--id", "cimesh",
        "--mesh_shape", "2", "2",
        "--batch_size", "4",          # 2 microbatches of 2 over DP=2
        "--grad_accum", "2",
        "--language_eval", "--eval_obj_grounding",
        "--eval_obj_grounding_gt",
        "--w_att2", "0.05", "--w_cls", "0.1",
    ])
    assert cli.main(argv) == 0
    assert os.path.isdir(os.path.join(ckpt_dir, "model"))
    sub = "densecap_results/densecap-validation-cimesh.json"
    with open(sub) as f:
        dc = json.load(f)
    n = sum(len(v) for v in dc["results"].values())
    assert n == 8   # every val segment captioned under the mesh


def test_cli_inference_only_resume(synth_root, tmp_path):
    import main as cli

    root, cfg, paths = synth_root
    ckpt_dir = str(tmp_path / "save2")
    argv = _argv(cfg, paths, [
        "--checkpoint_path", ckpt_dir, "--id", "citest2",
        "--language_eval",
    ])
    assert cli.main(argv) == 0
    # resume from the checkpoint, inference only
    argv2 = _argv(cfg, paths, [
        "--checkpoint_path", str(tmp_path / "save3"),
        "--start_from", ckpt_dir, "--inference_only",
        "--language_eval", "--id", "citest2",
    ])
    assert cli.main(argv2) == 0


def test_grounding_eval_gates_encoder_kernel():
    """Argmax-consumer guard (GROUNDING_KERNEL_DELTA.json): grounding
    evals run with the fused encoder kernel off unless the user
    disables the guard; non-grounding eval keeps the kernel."""
    from grounded_video_description_tpu.config import GVDConfig
    from main import grounding_eval_cfg

    base = dict(use_pallas_encoder=True, batch_size=8)
    on = GVDConfig(eval_obj_grounding=True, **base)
    assert grounding_eval_cfg(on).use_pallas_encoder is False
    gt = GVDConfig(eval_obj_grounding_gt=True, **base)
    assert grounding_eval_cfg(gt).use_pallas_encoder is False
    off = GVDConfig(**base)
    assert grounding_eval_cfg(off) is off
    unguarded = GVDConfig(eval_obj_grounding=True,
                          pallas_encoder_grounding_guard=False, **base)
    assert grounding_eval_cfg(unguarded) is unguarded
