"""Native C++ batch-assembler tests: build, parity with numpy, pipeline use."""

import numpy as np
import pytest

from ircolor_tpu.data import native


def test_native_builds_and_loads():
    assert native.available(), "g++ build of native/batchops.cpp failed"


def test_assemble_matches_numpy():
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, (16, 20, 3), np.uint8) for _ in range(5)]
    flips = [False, True, False, True, True]
    got = native.assemble_batch(imgs, flips, nthreads=3)
    assert got.shape == (5, 16, 20, 3) and got.dtype == np.float32
    for i, img in enumerate(imgs):
        arr = img[:, ::-1] if flips[i] else img
        want = arr.astype(np.float32) / 255.0 * 2.0 - 1.0
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_assemble_grayscale_channel():
    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 256, (8, 10, 1), np.uint8) for _ in range(3)]
    got = native.assemble_batch(imgs, None, nthreads=2)
    assert got.shape == (3, 8, 10, 1)
    np.testing.assert_allclose(
        got[0], imgs[0].astype(np.float32) / 255 * 2 - 1, atol=1e-6
    )


def test_loader_native_path_matches_python(kaist_tree):
    from ircolor_tpu.data import BatchLoader, KAISTPairDataset

    root, _ = kaist_tree
    ds = KAISTPairDataset.from_roots([str(root / "set00")], size_hw=(32, 32), augment=False)
    nat = list(BatchLoader(ds, 2, drop_last=True, use_native=True))
    py = list(BatchLoader(ds, 2, drop_last=True, use_native=False))
    assert len(nat) == len(py) > 0
    for a, b in zip(nat, py):
        np.testing.assert_allclose(a["ir"], b["ir"], atol=1e-6)
        np.testing.assert_allclose(a["rgb"], b["rgb"], atol=1e-6)


def test_loader_falls_back_for_16bit(tmp_path):
    from ircolor_tpu.data import BatchLoader, KAISTPairDataset
    from ircolor_tpu.data.synthetic import make_kaist_tree

    root = tmp_path / "k16"
    make_kaist_tree(str(root), {"set00": {"V000": 4}}, size_hw=(32, 32), ir_16bit=True)
    ds = KAISTPairDataset.from_roots([str(root / "set00")], size_hw=(32, 32), augment=False)
    batches = list(BatchLoader(ds, 2, drop_last=True, use_native=True))
    assert len(batches) == 2
    for b in batches:
        assert b["ir"].dtype == np.float32
        assert np.isfinite(b["ir"]).all()
