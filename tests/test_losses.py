"""Loss-criterion unit tests.

The broader loss stack is covered differentially against the executing
reference in tests/test_ref_parity.py; this module pins edge-case
semantics that only surface on data distributions the differential
fixtures don't hit — found by the round-5 integrated rehearsal.
"""

import jax
import jax.numpy as jnp
import numpy as np

from grounded_video_description_tpu.losses import (
    cls_criterion_with_counts)


def _make_inputs():
    """(B, C+1, R) probs with a selected target whose probability is
    EXACTLY zero — the class-softmax underflow case the TPU's
    flush-to-zero produces on wide init logit spreads."""
    rng = np.random.RandomState(0)
    B, C, K, R = 2, 5, 3, 7
    logits = rng.randn(B, C + 1, R).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    sim_target = np.zeros((B, K, R), np.int64)
    sim_target[0, 0, 1] = 2
    sim_target[0, 1, 4] = 5
    sim_target[1, 0, 0] = 1
    probs[0, 2, 1] = 0.0          # exact zero at a SELECTED target
    probs[1, 1, 0] = 1e-44        # denormal (torch: log clamps to -100)
    return jnp.asarray(probs), jnp.asarray(sim_target)


def test_cls_criterion_zero_prob():
    """p == 0 at a selected target must contribute exactly 100 (the
    torch BCE -100 log clamp, model.py:348) with a ZERO gradient —
    not NaN.  The pre-round-5 epsilon floor max(p, 1e-45) was a no-op
    on TPU (denormals flush to zero), so log(0) = -inf met the
    min-clip's zero cotangent and produced 0 * inf = NaN, poisoning
    every sim-path parameter through Adam (losses.py docstring)."""
    probs, sim_target = _make_inputs()

    def f(p):
        loss, count = cls_criterion_with_counts(p, sim_target)
        return loss

    loss, grad = jax.jit(jax.value_and_grad(f))(probs)
    assert np.isfinite(float(loss))
    g = np.asarray(grad)
    assert np.isfinite(g).all()
    # clamped entries (p = 0 and p = denormal, both past the -100
    # clamp) contribute zero gradient, like torch's clamped log
    assert g[0, 2, 1] == 0.0
    assert g[1, 1, 0] == 0.0
    # an unclamped selected entry still gets the -1/p pull
    assert g[0, 5, 4] != 0.0

    # value parity with the torch formula: mean over selected entries
    # of min(-log p, 100), with p=0 contributing exactly 100
    sel = [(0, 2, 1), (0, 5, 4), (1, 1, 0)]
    want = np.mean([100.0 if float(probs[i]) == 0.0
                    else min(-np.log(float(probs[i])), 100.0)
                    for i in sel])
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)


def test_cls_criterion_matches_torch_bce():
    """Differential vs torch.nn.functional.binary_cross_entropy on the
    gathered true-class probabilities (the reference's exact call,
    model.py:345-350), including a zero-probability entry."""
    import torch
    import torch.nn.functional as F

    probs, sim_target = _make_inputs()
    loss, count = jax.jit(cls_criterion_with_counts)(probs, sim_target)

    p_t = torch.from_numpy(np.asarray(probs).copy())
    tgt = torch.from_numpy(np.asarray(sim_target).copy())
    gathered = torch.gather(p_t, 1, tgt.long())
    mask = tgt > 0
    sel = torch.masked_select(gathered, mask)
    ref = F.binary_cross_entropy(sel, torch.ones_like(sel))
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-6)
    assert int(count) == int(mask.sum())
