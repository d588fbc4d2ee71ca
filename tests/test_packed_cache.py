"""Pack-once ingest cache: byte parity with the live assembly path,
Loader integration, and fingerprint-driven rebuild."""

import os

import numpy as np
import pytest

from grounded_video_description_tpu.config import tiny_test_config
from grounded_video_description_tpu.data.dataset import (
    ARRAY_KEYS, AnetDataset, Loader)
from grounded_video_description_tpu.data.packed_cache import (
    PackedDataset, build_cache, open_or_build)
from grounded_video_description_tpu.data.synthetic_files import (
    write_synthetic_dataset)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("packed_cache")
    cfg = tiny_test_config()
    paths = write_synthetic_dataset(str(root), cfg, n_train=4, n_val=2)
    cfg = cfg.replace(**{k: v for k, v in paths.items()
                         if k != "densecap_references"})
    return cfg, str(root)


def test_cache_matches_live_assembly(synth, tmp_path):
    cfg, _ = synth
    ds = AnetDataset(cfg, split="training")
    packed = build_cache(ds, str(tmp_path / "cache"))
    assert len(packed) == len(ds)
    for i in range(len(ds)):
        live = ds[i]
        cached = packed[i]
        assert cached["seg_id"] == live["seg_id"]
        for k in ARRAY_KEYS:
            np.testing.assert_array_equal(
                np.asarray(cached[k]), np.asarray(live[k]),
                err_msg=f"{k} differs at segment {i}")


def test_loader_one_copy_over_cache(synth, tmp_path):
    """Loader's get_into fast path must serve identical batches from
    the cache as from the live dataset."""
    cfg, _ = synth
    ds = AnetDataset(cfg, split="training")
    packed = build_cache(ds, str(tmp_path / "cache"))
    a = list(Loader(ds, 2, shuffle=False, num_threads=1))
    b = list(Loader(packed, 2, shuffle=False, num_threads=1))
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        assert ba["seg_id"] == bb["seg_id"]
        for k in ARRAY_KEYS:
            np.testing.assert_array_equal(ba[k], bb[k])


def test_iter_batches_zero_copy_eval_feed(synth, tmp_path):
    """Sequential batches must equal the per-item rows, pad correctly,
    and stay views of the memmap (the zero-copy contract)."""
    cfg, _ = synth
    ds = AnetDataset(cfg, split="training")
    packed = build_cache(ds, str(tmp_path / "cache"))
    n = len(packed)
    bs = n - 1                                       # force a remainder
    assert n >= 3

    batches = list(packed.iter_batches(bs))
    assert [b["n_valid"] for b in batches] == [bs, 1]
    for bi, b in enumerate(batches):
        for r in range(b["n_valid"]):
            item = packed[bi * bs + r]
            assert b["seg_id"][r] == item["seg_id"]
            for k in ARRAY_KEYS:
                np.testing.assert_array_equal(b[k][r], item[k])
        # unpadded batches are views into the mmap, not copies
        for k in ARRAY_KEYS:
            assert b[k].base is not None

    last = list(packed.iter_batches(bs, pad_last=True))[-1]
    assert last["n_valid"] == 1 and last["seg_feat"].shape[0] == bs
    for k in ARRAY_KEYS:                             # pad = repeat last
        np.testing.assert_array_equal(last[k][1], last[k][0])
    assert last["seg_id"] == [packed.seg_ids[n - 1]] * bs

    assert [b["n_valid"] for b in packed.iter_batches(bs, drop_last=True)
            ] == [bs]


def test_open_or_build_reuses_and_rebuilds(synth, tmp_path):
    cfg, _ = synth
    ds = AnetDataset(cfg, split="validation")
    d = str(tmp_path / "cache")
    p1 = open_or_build(ds, d)
    stamp = os.path.getmtime(os.path.join(d, "meta.json"))
    p2 = open_or_build(ds, d)                      # reuse, no rewrite
    assert os.path.getmtime(os.path.join(d, "meta.json")) == stamp
    assert isinstance(p2, PackedDataset)
    assert p2.seg_ids == p1.seg_ids

    # packing-relevant config change -> fingerprint mismatch -> rebuild
    cfg2 = cfg.replace(prop_thresh=cfg.prop_thresh + 0.05)
    ds2 = AnetDataset(cfg2, split="validation")
    p3 = open_or_build(ds2, d)
    assert p3.fingerprint["prop_thresh"] == cfg2.prop_thresh
