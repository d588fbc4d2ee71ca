"""Flat-npz params round-trip (utils/params_io.py): exact restore,
missing-key and shape-mismatch failure modes."""

import numpy as np
import pytest

import jax

from grounded_video_description_tpu.config import tiny_test_config
from grounded_video_description_tpu.models import GVDModel
from grounded_video_description_tpu.utils.params_io import (
    load_variables, save_variables)


def test_round_trip_exact(tmp_path):
    model = GVDModel(tiny_test_config())
    variables = jax.jit(model.init)(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_variables(path, variables)

    template = jax.jit(model.init)(jax.random.PRNGKey(1))  # other init
    restored = load_variables(path, template)
    orig = jax.tree_util.tree_leaves(variables)
    back = jax.tree_util.tree_leaves(restored)
    assert len(orig) == len(back) > 0
    for a, b in zip(orig, back):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_and_mismatched_keys(tmp_path):
    model = GVDModel(tiny_test_config())
    variables = jax.jit(model.init)(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_variables(path, {"params": variables["params"]})  # no state
    with pytest.raises(KeyError):
        load_variables(path, variables)

    bigger = GVDModel(tiny_test_config().replace(rnn_size=128))
    tmpl2 = jax.jit(bigger.init)(jax.random.PRNGKey(0))
    save_variables(path, variables)
    with pytest.raises((ValueError, KeyError)):
        load_variables(path, tmpl2)
