"""Evaluator internals: region-classification accuracy aggregation
(main.py:166-171 semantics: per-class hit rates averaged over the
number of classes present in the split's vocabulary)."""

import numpy as np

from helpers import setup, batch_for


def test_cls_accuracy_aggregation(tmp_path):
    """Feed the GRD outputs through the evaluator's accuracy math with
    crafted predictions: class 1 always right, class 2 always wrong."""
    import jax

    from grounded_video_description_tpu.engine.evaluator import Evaluator

    cfg, model, variables, fns = setup()

    class FakeVocab:
        itow = {str(i): f"w{i}" for i in range(1, cfg.vocab_size)}
        wtoi = {f"w{i}": str(i) for i in range(1, cfg.vocab_size)}
        itod = {i: f"d{i}" for i in range(1, cfg.detect_size + 1)}
        wtod = {f"d{i}": i for i in range(1, cfg.detect_size + 1)}
        wtol = {}
        ltow = {}

    ev = Evaluator(cfg, model, FakeVocab())

    # monkeypatch the jitted GRD fn with crafted outputs
    B, K, R = 1, cfg.max_gt_box, cfg.max_proposal
    Lq, F = cfg.seq_length, cfg.num_sampled_frm
    sim_target = np.zeros((B, K, R), np.int32)
    sim_target[0, 0, 0] = 1    # class 1 at roi 0
    sim_target[0, 1, 1] = 2    # class 2 at roi 1
    pred_cls = np.zeros((B, R), np.int32)
    pred_cls[0, 0] = 1          # correct
    pred_cls[0, 1] = 3          # wrong

    import jax.numpy as jnp

    def fake_grd(variables, arrays):
        return {"sim_target": jnp.asarray(sim_target),
                "pred_cls": jnp.asarray(pred_cls),
                "att2_ind": jnp.zeros((B, Lq, F), jnp.int32),
                "grd_ind": jnp.zeros((B, Lq, F), jnp.int32)}

    ev._grd = fake_grd

    batch = batch_for(cfg, B=1, seed=1)
    # two visual words -> two classes in the split vocabulary
    iseq = np.array(batch["input_seq"])
    iseq[:, :, :, 0] = np.where(iseq[:, :, :, 0] > cfg.vocab_size,
                                0, iseq[:, :, :, 0])
    iseq[0, 0, 1, 0] = cfg.vocab_size + 1
    iseq[0, 0, 2, 0] = cfg.vocab_size + 2
    batch = dict(batch)
    batch["input_seq"] = jnp.asarray(iseq)

    loader = [dict(batch, seg_id=["v_T_segment_00"])]
    stats = ev.eval_grounding_gt(
        {"params": variables["params"],
         "state": variables["state"]}, loader, out_dir=str(tmp_path))
    # class 1: 1/1 hit; class 2: 0/1 -> sum(1,0)/|vocab_in_split=2| = 0.5
    assert np.isclose(stats["cls_accu"], 0.5), stats
