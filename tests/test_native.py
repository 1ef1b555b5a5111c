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


def test_assemble_rejects_mismatched_shapes_and_bad_out():
    """The C++ kernel strides every source by h*w*c and writes through a raw
    pointer — mismatched inputs / wrong `out` must raise, not corrupt."""
    rng = np.random.RandomState(2)
    ok = [rng.randint(0, 256, (8, 10, 1), np.uint8) for _ in range(2)]
    bad = [ok[0], rng.randint(0, 256, (8, 12, 1), np.uint8)]
    with pytest.raises(ValueError, match="expected"):
        native.assemble_batch(bad, None)
    with pytest.raises(ValueError, match="C-contiguous float32"):
        native.assemble_batch(ok, None, out=np.empty((2, 8, 10, 1), np.float64))
    with pytest.raises(ValueError, match="C-contiguous float32"):
        native.assemble_batch(ok, None, out=np.empty((3, 8, 10, 1), np.float32))


def test_native_path_honors_max_le_1_quirk(tmp_path):
    """An IR frame whose uint8 values are all 0/1 skips the /255 in the
    reference (ref :822-827: value 1 maps to +1.0, not -0.992). raw_item
    must return None for such frames so the native path falls back to the
    exact float path — the C++ kernel always divides."""
    import cv2

    from ircolor_tpu.data import BatchLoader, KAISTPairDataset

    root = tmp_path / "kq"
    seq = root / "set00" / "V000"
    (seq / "lwir").mkdir(parents=True)
    (seq / "visible").mkdir(parents=True)
    rng = np.random.RandomState(3)
    for i in range(4):
        ir = (
            rng.randint(0, 2, (32, 32), np.uint8)        # max <= 1 frames
            if i % 2 == 0
            else rng.randint(0, 256, (32, 32), np.uint8)  # normal frames
        )
        # Constant blocks survive INTER_AREA exactly at same-size resize.
        cv2.imwrite(str(seq / "lwir" / f"I{i:05d}.png"), ir)
        cv2.imwrite(
            str(seq / "visible" / f"I{i:05d}.png"),
            rng.randint(0, 256, (32, 32, 3), np.uint8),
        )
    ds = KAISTPairDataset.from_roots([str(root / "set00")], size_hw=(32, 32), augment=False)
    quirky = [i for i in range(4) if ds.raw_item(i) is None]
    assert quirky, "no max<=1 frame triggered the fallback"
    nat = list(BatchLoader(ds, 2, drop_last=True, use_native=True))
    py = list(BatchLoader(ds, 2, drop_last=True, use_native=False))
    for a, b in zip(nat, py):
        np.testing.assert_allclose(a["ir"], b["ir"], atol=1e-6)
        np.testing.assert_allclose(a["rgb"], b["rgb"], atol=1e-6)
    # The quirky frames' +1.0 mapping is present (value 1 -> +1.0 exactly).
    assert max(float(b["ir"].max()) for b in py) == 1.0
