"""Data-layer tests with synthetic KAIST trees (SURVEY.md §4 plan):
recursive discovery, pairing-by-intersection, seed-42 split, 16-bit TIFFs,
paired flip augmentation, loader batching/sharding.
"""

import os
import random

import numpy as np
import pytest

from ircolor_tpu.data import (
    BatchLoader,
    KAISTPairDataset,
    collect_kaist_ir_files_from_sets,
    load_ir_image,
    scan_kaist_pairs,
    split_train_val,
)
from ircolor_tpu.data.io import array_to_rgb_image, float01_to_uint8_rgb, ir_to_array
from ircolor_tpu.data.synthetic import make_kaist_tree


def test_collector_finds_nested_sequences(kaist_tree):
    root, n_pairs = kaist_tree
    entries = collect_kaist_ir_files_from_sets([str(root / "set00"), str(root / "set02")])
    # Collector counts ALL lwir frames (including unpaired extras).
    set_names = {e[1] for e in entries}
    assert set_names == {"set00", "set02"}
    seq_rels = {e[2] for e in entries if e[1] == "set02"}
    assert seq_rels == {"V000", os.path.join("V001", "nested")}
    assert all(os.path.isfile(e[0]) for e in entries)


def test_collector_warns_on_missing_root(kaist_tree, caplog):
    root, _ = kaist_tree
    entries = collect_kaist_ir_files_from_sets([str(root / "set00"), str(root / "does_not_exist")])
    assert len(entries) > 0


def test_pairing_by_intersection_excludes_unpaired(kaist_tree):
    root, n_pairs = kaist_tree
    ir, rgb = scan_kaist_pairs([str(root / "set00"), str(root / "set02")])
    assert len(ir) == len(rgb) == n_pairs  # unpaired extras excluded
    assert all(os.path.basename(a) == os.path.basename(b) for a, b in zip(ir, rgb))


def test_split_matches_reference_seed42():
    n, ratio = 100, 0.1
    train_idx, val_idx = split_train_val(n, ratio)
    # Bit-exact reproduction of ref :1558-1568.
    idxs = list(range(n))
    random.seed(42)
    random.shuffle(idxs)
    assert train_idx == idxs[:90]
    assert val_idx == idxs[90:]
    assert len(val_idx) == max(1, int(n * ratio))


def test_16bit_tiff_loading(tmp_path):
    root = tmp_path / "k16"
    make_kaist_tree(str(root), {"set00": {"V000": 2}}, size_hw=(32, 32), ir_16bit=True)
    ir_paths, _ = scan_kaist_pairs([str(root / "set00")])
    img = load_ir_image(ir_paths[0], (32, 32))
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert img.max() > 0.2  # ÷65535 path produced sane values, not ÷255 overflow clip


def test_dataset_getitem_ranges_and_shapes(kaist_tree):
    root, _ = kaist_tree
    ds = KAISTPairDataset.from_roots([str(root / "set00")], size_hw=(48, 56), augment=False)
    s = ds[0]
    assert s["ir"].shape == (48, 56, 1)
    assert s["rgb"].shape == (48, 56, 3)
    for k in ("ir", "rgb"):
        assert s[k].min() >= -1.0 and s[k].max() <= 1.0


def test_paired_flip_augmentation(kaist_tree):
    root, _ = kaist_tree
    ds_plain = KAISTPairDataset.from_roots([str(root / "set00")], size_hw=(32, 32), augment=False)
    ds_aug = KAISTPairDataset.from_roots([str(root / "set00")], size_hw=(32, 32), augment=True, seed=7)
    base = ds_plain[0]
    found_flip = found_same = False
    for epoch in range(20):  # flips are deterministic per (seed, epoch, idx)
        ds_aug.set_epoch(epoch)
        s = ds_aug[0]
        if np.allclose(s["ir"], base["ir"]):
            found_same = True
            np.testing.assert_allclose(s["rgb"], base["rgb"])
        elif np.allclose(s["ir"], base["ir"][:, ::-1]):
            found_flip = True
            # flip must be PAIRED: rgb flipped too (ref :1165-1167)
            np.testing.assert_allclose(s["rgb"], base["rgb"][:, ::-1])
        else:
            raise AssertionError("augmented sample is neither identity nor h-flip")
    assert found_flip and found_same


def test_batch_loader_shapes_and_drop_last(kaist_tree):
    root, n_pairs = kaist_tree
    ds = KAISTPairDataset.from_roots(
        [str(root / "set00"), str(root / "set02")], size_hw=(32, 32), augment=False
    )
    loader = BatchLoader(ds, 4, shuffle=True, drop_last=True, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == len(ds) // 4 == len(loader)
    for b in batches:
        assert b["ir"].shape == (4, 32, 32, 1)
        assert b["rgb"].shape == (4, 32, 32, 3)
    # keep-last variant yields the remainder
    loader2 = BatchLoader(ds, 4, drop_last=False)
    total = sum(b["ir"].shape[0] for b in loader2)
    assert total == len(ds)


def test_batch_loader_epoch_shuffle_deterministic(kaist_tree):
    root, _ = kaist_tree
    ds = KAISTPairDataset.from_roots([str(root / "set00")], size_hw=(32, 32), augment=False)
    loader = BatchLoader(ds, 2, shuffle=True, drop_last=True, seed=3)
    loader.set_epoch(1)
    a = [b["ir"].sum() for b in loader]
    loader.set_epoch(1)
    b = [b["ir"].sum() for b in loader]
    loader.set_epoch(2)
    c = [b["ir"].sum() for b in loader]
    np.testing.assert_allclose(a, b)
    assert not np.allclose(a, c)


def test_batch_loader_sharding(kaist_tree):
    root, _ = kaist_tree
    ds = KAISTPairDataset.from_roots(
        [str(root / "set00"), str(root / "set02")], size_hw=(32, 32), augment=False
    )
    shards = [
        list(BatchLoader(ds, 4, drop_last=True, shard_index=i, shard_count=2))
        for i in range(2)
    ]
    assert len(shards[0]) == len(shards[1])
    for b0, b1 in zip(*shards):
        assert b0["ir"].shape[0] == b1["ir"].shape[0] == 2
        assert not np.allclose(b0["ir"], b1["ir"])


def test_normalization_roundtrips():
    """[0,1] ↔ [-1,1] ↔ uint8 golden-file semantics (ref :855-876)."""
    img = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    arr = ir_to_array(img)
    assert arr.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(arr.min(), -1.0, atol=1e-6)
    np.testing.assert_allclose(arr.max(), 1.0, atol=1e-6)

    rgb = np.stack([img, img, img], axis=2)[None] * 2 - 1  # (1,8,8,3) in [-1,1]
    u8 = array_to_rgb_image(rgb)
    assert u8.dtype == np.uint8
    # truncation semantics: (x+1)/2*255 floored
    expected = (np.clip((rgb[0] + 1) / 2, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(u8, expected)

    gray_u8 = float01_to_uint8_rgb(img)
    assert gray_u8.shape == (8, 8, 3)
    assert (gray_u8[:, :, 0] == gray_u8[:, :, 1]).all()


def test_empty_roots_raise(tmp_path):
    with pytest.raises(RuntimeError, match="No IR-RGB pairs"):
        KAISTPairDataset.from_roots([str(tmp_path / "nope")])


def test_augmentation_deterministic_across_threads(kaist_tree):
    """Flips derive from (seed, epoch, index) — identical batches regardless
    of decode-thread scheduling (ADVICE r1: a shared random.Random stream
    consumed by pool workers made 'reproducible' augmentation a lie)."""
    from ircolor_tpu.data.pipeline import BatchLoader

    root, _ = kaist_tree

    def run(num_workers, use_native):
        ds = KAISTPairDataset.from_roots(
            [str(root / "set00")], size_hw=(32, 32), augment=True, seed=7
        )
        loader = BatchLoader(
            ds, 4, shuffle=False, num_workers=num_workers, use_native=use_native
        )
        loader.set_epoch(3)
        return [b for b in loader]

    ref_float = run(1, False)
    ref_native = run(1, True)
    # Same path, different thread counts → bit-identical.
    for ref, native in ((ref_float, False), (ref_native, True)):
        got = run(4, native)
        assert len(got) == len(ref)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a["ir"], b["ir"])
            np.testing.assert_array_equal(a["rgb"], b["rgb"])
    # Across paths (C++ assembler vs numpy): same flips, 1-ULP float slack.
    for a, b in zip(ref_float, ref_native):
        np.testing.assert_allclose(a["ir"], b["ir"], atol=2e-7)
        np.testing.assert_allclose(a["rgb"], b["rgb"], atol=2e-7)

    # And the stream must CHANGE with the epoch (flips re-drawn per epoch).
    ds2 = KAISTPairDataset.from_roots(
        [str(root / "set00")], size_hw=(32, 32), augment=True, seed=7
    )
    flips_by_epoch = set()
    for epoch in range(8):
        ds2.set_epoch(epoch)
        flips_by_epoch.add(tuple(ds2._flip(i) for i in range(len(ds2))))
    assert len(flips_by_epoch) > 1


def test_int_item_encodes_getitem_exactly(kaist_tree):
    """uint16/uint8 transport decodes to the exact float values __getitem__
    produces (train/step.py:_decode_transport contract)."""
    root, _ = kaist_tree
    ds = KAISTPairDataset.from_roots([os.path.join(root, "set00")],
                                     size_hw=(32, 32), augment=True, seed=3)
    ds.set_epoch(2)
    for idx in range(min(4, len(ds))):
        f = ds[idx]
        i = ds.int_item(idx)
        assert i["ir"].dtype == np.uint16 and i["rgb"].dtype == np.uint8
        ir_dec = i["ir"].astype(np.float32) / 65535.0 * 2.0 - 1.0
        rgb_dec = i["rgb"].astype(np.float32) / 255.0 * 2.0 - 1.0
        np.testing.assert_array_equal(ir_dec, f["ir"])
        np.testing.assert_array_equal(rgb_dec, f["rgb"])


def test_batch_loader_int_transport(kaist_tree):
    root, _ = kaist_tree
    ds = KAISTPairDataset.from_roots([os.path.join(root, "set00")],
                                     size_hw=(32, 32), augment=False)
    loader = BatchLoader(ds, 2, transport="int", num_workers=2)
    batch = next(iter(loader))
    assert batch["ir"].dtype == np.uint16 and batch["ir"].shape == (2, 32, 32, 1)
    assert batch["rgb"].dtype == np.uint8 and batch["rgb"].shape == (2, 32, 32, 3)


def test_save_rgb_bare_filename_and_fallback(tmp_path, monkeypatch):
    """save_rgb on a path with no directory component must not crash
    (os.makedirs('') raises), and an extension cv2 has no writer for must
    hit the PIL fallback (cv2.imwrite RAISES, it does not return False)."""
    from PIL import Image

    from ircolor_tpu.data.io import save_rgb

    monkeypatch.chdir(tmp_path)
    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    save_rgb("bare.png", img)
    assert (tmp_path / "bare.png").is_file()
    save_rgb("anim.gif", img)  # cv2 has no GIF writer (raises) -> PIL fallback
    assert (tmp_path / "anim.gif").is_file()
    got = np.asarray(Image.open(tmp_path / "anim.gif").convert("RGB"))
    assert got.shape == img.shape
