"""Shared, cached test fixtures: on this 1-core CI box eager dispatch
is ~100x slower than jitted execution, so every model call in tests
goes through jax.jit and model/variable construction is memoized."""

import functools
from functools import partial

import jax
import jax.numpy as jnp

from grounded_video_description_tpu.config import tiny_test_config
from grounded_video_description_tpu.data import synthetic_batch
from grounded_video_description_tpu.models import GVDModel


@functools.lru_cache(maxsize=None)
def setup(**cfg_overrides):
    cfg = tiny_test_config(**cfg_overrides)
    model = GVDModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0))
    fns = {
        "mle_train": jax.jit(partial(model.forward, mode="MLE", train=True)),
        "mle_eval": jax.jit(partial(model.forward, mode="MLE", train=False)),
        "grd": jax.jit(partial(model.forward, mode="GRD")),
        "greedy": jax.jit(model.sample_greedy),
    }
    return cfg, model, variables, fns


def batch_for(cfg, B=2, seed=0):
    return {k: jnp.asarray(v) for k, v in
            synthetic_batch(cfg, B, seed=seed).items() if k != "seg_id"}
