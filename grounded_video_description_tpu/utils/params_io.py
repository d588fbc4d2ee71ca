"""Flat-npz save/load for variable trees (params / model_state).

The Orbax CheckpointManager (engine/checkpoint.py) is the production
resume path; this is the lightweight tool-to-tool format the perf /
agreement tools use to share a TRAINED flagship checkpoint
(tools/overfit_checkpoint.py -> tools/encoder_agreement.py,
tools/quantize_report.py, tools/bench_decode_kernel.py): one .npz
keyed by the jax.tree_util key-path string, dtypes preserved, no
template needed to inspect, loadable without building a Trainer.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def save_variables(path: str, variables: Dict[str, Any]) -> None:
    """Writes {'params': tree, 'state': tree, ...} as one flat npz."""
    flat = {}
    for top, tree in variables.items():
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            flat[top + jax.tree_util.keystr(kp)] = np.asarray(leaf)
    np.savez(path, **flat)


def load_variables(path: str, template: Dict[str, Any]
                   ) -> Dict[str, Any]:
    """Restores onto `template`'s structure (an init() result); every
    template leaf must be present in the file and shape-match."""
    with np.load(path) as z:
        data = dict(z)

    out = {}
    for top, tree in template.items():
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        vals = []
        for kp, leaf in leaves:
            key = top + jax.tree_util.keystr(kp)
            if key not in data:
                raise KeyError(f"checkpoint missing {key}")
            v = data[key]
            if v.shape != leaf.shape:
                raise ValueError(
                    f"{key}: shape {v.shape} != template {leaf.shape}")
            vals.append(v.astype(leaf.dtype))
        out[top] = jax.tree_util.tree_unflatten(
            treedef, [v for v in vals])
    return out
