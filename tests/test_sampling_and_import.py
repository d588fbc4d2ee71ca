"""Temperature sampling, torch-checkpoint import, visualization."""

import jax
import numpy as np
import pytest

from helpers import setup, batch_for


def test_temperature_sampling_stochastic():
    cfg, model, variables, fns = setup()
    batch = batch_for(cfg)
    fn = jax.jit(lambda v, b, r: model.sample_greedy(
        v, b, rng=r, sample_max=False, temperature=1.0))
    s1 = np.array(fn(variables, batch, jax.random.PRNGKey(0))[0])
    s2 = np.array(fn(variables, batch, jax.random.PRNGKey(1))[0])
    s1b = np.array(fn(variables, batch, jax.random.PRNGKey(0))[0])
    assert np.array_equal(s1, s1b)          # same key -> same sample
    assert not np.array_equal(s1, s2)       # different key -> differs
    assert np.all(s1 >= 0) and np.all(s1 < cfg.vocab_size)


def test_torch_checkpoint_import():
    torch = pytest.importorskip("torch")
    cfg, model, variables, fns = setup()
    p = variables["params"]

    rnn, enc = cfg.rnn_size, cfg.input_encoding_size
    sd = {
        "logit.weight": torch.randn(cfg.vocab_size, rnn),
        "logit.bias": torch.randn(cfg.vocab_size),
        "embed.0.weight": torch.randn(cfg.vocab_size, enc),
        "core.att_lstm.weight_ih": torch.randn(4 * rnn, enc + rnn),
        "core.att_lstm.weight_hh": torch.randn(4 * rnn, rnn),
        "core.att_lstm.bias_ih": torch.randn(4 * rnn),
        "core.att_lstm.bias_hh": torch.randn(4 * rnn),
    }
    import tempfile

    from grounded_video_description_tpu.engine.checkpoint import (
        import_torch_checkpoint)

    with tempfile.NamedTemporaryFile(suffix=".pth") as f:
        torch.save(sd, f.name)
        out = import_torch_checkpoint(f.name, p)

    assert np.allclose(out["logit"]["w"], sd["logit.weight"].numpy().T)
    assert np.allclose(out["embed"]["w"], sd["embed.0.weight"].numpy())
    assert np.allclose(
        out["core"]["att_lstm"]["b"],
        sd["core.att_lstm.bias_ih"].numpy()
        + sd["core.att_lstm.bias_hh"].numpy())
    # untouched params keep their init
    assert np.allclose(out["ctx2pool"]["w"], np.array(p["ctx2pool"]["w"]))


def test_torch_checkpoint_import_gru_and_bn():
    torch = pytest.importorskip("torch")
    import tempfile

    from grounded_video_description_tpu.engine.checkpoint import (
        import_torch_bn_state, import_torch_checkpoint)

    cfg, model, variables, fns = setup()
    p = variables["params"]
    rnn, hid = cfg.rnn_size, cfg.rnn_size // 2

    sd = {
        "context_enc.weight_ih_l0": torch.randn(3 * hid, rnn),
        "context_enc.weight_hh_l0": torch.randn(3 * hid, hid),
        "context_enc.bias_ih_l0": torch.randn(3 * hid),
        "context_enc.bias_hh_l0": torch.randn(3 * hid),
        "context_enc.weight_ih_l0_reverse": torch.randn(3 * hid, rnn),
        "context_enc.weight_hh_l0_reverse": torch.randn(3 * hid, hid),
        "context_enc.bias_ih_l0_reverse": torch.randn(3 * hid),
        "context_enc.bias_hh_l0_reverse": torch.randn(3 * hid),
        "att_embed_aux.0.weight": torch.ones(rnn) * 2,
        "att_embed_aux.0.bias": torch.zeros(rnn),
        "att_embed_aux.0.running_mean": torch.ones(rnn) * 0.5,
        "att_embed_aux.0.running_var": torch.ones(rnn) * 4.0,
    }
    with tempfile.NamedTemporaryFile(suffix=".pth") as f:
        torch.save(sd, f.name)
        out = import_torch_checkpoint(f.name, p)
        mstate = import_torch_bn_state(
            f.name, variables["state"])

    l0 = out["context_enc"]["layers"][0]
    assert np.allclose(l0["fwd"]["wi"],
                       sd["context_enc.weight_ih_l0"].numpy().T)
    assert np.allclose(l0["bwd"]["wh"],
                       sd["context_enc.weight_hh_l0_reverse"].numpy().T)
    assert np.allclose(l0["fwd"]["bi"],
                       sd["context_enc.bias_ih_l0"].numpy())
    assert np.allclose(out["att_embed_aux"]["gamma"], 2.0)
    assert np.allclose(mstate["bn"]["mean"], 0.5)
    assert np.allclose(mstate["bn"]["var"], 4.0)


def test_vis_infer_writes_image(tmp_path):
    pytest.importorskip("matplotlib")
    from grounded_video_description_tpu.utils.visualize import vis_infer

    rng = np.random.RandomState(0)
    frames = (rng.rand(4, 90, 160, 3) * 255).astype(np.uint8)
    att2 = rng.rand(3, 20)
    att2 /= att2.sum(-1, keepdims=True)
    ppls = np.zeros((20, 7), np.float32)
    ppls[:, :4] = [20, 20, 100, 80]
    ppls[:, 4] = rng.randint(0, 4, 20)
    sim = rng.rand(5, 20)
    path = vis_infer(frames, "v_X_segment_00", "a man runs", att2, ppls,
                     20, sim, {1: "man"}, out_dir=str(tmp_path),
                     run_id="t")
    import os
    assert path and os.path.isfile(path)
