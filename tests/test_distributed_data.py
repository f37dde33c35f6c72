"""Per-process data sharding (DistributedSampler equivalent) and eval-merge
ordering tests.

The reference shards datasets per rank with torch's DistributedSampler
(search_lip_sync.py:208-233) and merges eval results through per-rank CSVs
+ a barrier + a filesystem glob (core/function.py:997-1013). Our loader
slices a globally-shuffled index order per process (padded to equal
counts), and validate() merges predictions by dataset index.
"""
import numpy as np

from npp_tpu.data.loader import DataLoader
from npp_tpu.data.synthetic import SyntheticDataset
import pytest

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow


def _all_indices(loader):
    return np.concatenate([g for g in loader._indices()]) \
        if loader._indices() else np.array([], np.int64)


def test_process_sharding_partitions_dataset():
    ds = SyntheticDataset(length=22, crop_size=(32, 32), num_joints=4,
                          num_classes=5)
    world = 3
    shards = []
    for rank in range(world):
        loader = DataLoader(ds, 2, shuffle=True, drop_last=False,
                            num_workers=1, seed=7, process_index=rank,
                            process_count=world)
        loader.set_epoch(3)
        shards.append(_all_indices(loader))
    # Equal per-process counts (padded like DistributedSampler).
    counts = {len(s) for s in shards}
    assert counts == {8}, counts  # ceil(22/3) = 8
    # Union covers the whole dataset.
    union = np.unique(np.concatenate(shards))
    assert set(union) == set(range(22))
    # Overlap is only the wrap padding (total 24 - 22 = 2 duplicates).
    total = np.concatenate(shards)
    assert len(total) - len(np.unique(total)) == 2


def test_process_sharding_same_shuffle_across_ranks():
    """All ranks must derive their slice from the SAME global permutation
    (same seed+epoch), or samples would repeat/drop."""
    ds = SyntheticDataset(length=16, crop_size=(32, 32), num_joints=4,
                          num_classes=5)
    perms = []
    for rank in range(2):
        loader = DataLoader(ds, 2, shuffle=True, num_workers=1, seed=5,
                            process_index=rank, process_count=2)
        loader.set_epoch(1)
        perms.append(_all_indices(loader))
    interleaved = np.empty(16, np.int64)
    interleaved[0::2] = perms[0]
    interleaved[1::2] = perms[1]
    # Interleaving the strided shards reconstructs one permutation.
    assert sorted(interleaved.tolist()) == list(range(16))


def test_single_process_default_unchanged():
    ds = SyntheticDataset(length=10, crop_size=(32, 32), num_joints=4,
                          num_classes=5)
    loader = DataLoader(ds, 2, shuffle=False, num_workers=1,
                        process_index=0, process_count=1)
    assert len(loader) == 5
    np.testing.assert_array_equal(_all_indices(loader), np.arange(10))


def test_loader_yields_dataset_indices():
    ds = SyntheticDataset(length=6, crop_size=(32, 32), num_joints=4,
                          num_classes=5)
    loader = DataLoader(ds, 2, shuffle=False, num_workers=1)
    seen = []
    for batch in loader:
        assert "index" in batch
        seen.extend(np.asarray(batch["index"]).tolist())
    assert seen == list(range(6))


def test_merge_eval_shards_restores_dataset_order():
    from npp_tpu.core.evaluate import merge_eval_shards

    rng = np.random.default_rng(0)
    # Two simulated strided shards with one wrap-padding duplicate (idx 0).
    idxs = np.array([0, 2, 4, 1, 3, 0])
    preds = rng.random((6, 16, 3))
    names = [f"im{i}" for i in idxs]
    merged, mnames = merge_eval_shards(preds, idxs, names)
    assert merged.shape == (5, 16, 3)
    assert mnames == ["im0", "im1", "im2", "im3", "im4"]
    np.testing.assert_array_equal(merged[1], preds[3])  # idx 1
    np.testing.assert_array_equal(merged[2], preds[1])  # idx 2


def test_validate_returns_canonical_order_with_shuffled_loader():
    """validate() must emit predictions in dataset order even when the
    loader iterates in a shuffled order (the reference's CSV merge gets
    this wrong for strided shards)."""
    from npp_tpu.core.evaluate import validate

    class FakeLoader:
        def __init__(self, order):
            self.order = order

        def __iter__(self):
            for i in self.order:
                yield {
                    "names": [f"im{i}"],
                    "index": np.array([i]),
                    "image": np.full((1, 4, 4, 3), float(i), np.float32),
                }

    def fake_step(params, batch_stats, batch):
        i = float(batch["image"][0, 0, 0, 0])
        return {"loss": np.float32(0.0),
                "cm": np.zeros((3, 3), np.float64),
                "pose_pred": np.full((1, 16, 3), i, np.float32)}

    order = [3, 0, 2, 1]
    result = validate(fake_step, {}, {}, FakeLoader(order), num_classes=3,
                      log_fn=lambda s: None)
    assert result["names"] == ["im0", "im1", "im2", "im3"]
    np.testing.assert_allclose(result["pose_preds"][:, 0, 0],
                               [0.0, 1.0, 2.0, 3.0])


def test_cache_batches_replays_identically():
    """cache_batches=True must replay the exact same batches on the second
    epoch without touching the dataset again."""
    ds = SyntheticDataset(length=6, crop_size=(32, 32), num_joints=4,
                          num_classes=5, is_train=False)
    loader = DataLoader(ds, 2, shuffle=False, num_workers=1,
                        cache_batches=True)
    first = [{k: np.asarray(v) for k, v in b.items() if k != "names"}
             for b in loader]
    assert loader._batch_cache is not None

    calls = {"n": 0}
    orig = ds.__getitem__

    def counting(i):
        calls["n"] += 1
        return orig(i)

    ds.__getitem__ = counting
    second = [{k: np.asarray(v) for k, v in b.items() if k != "names"}
              for b in loader]
    assert calls["n"] == 0  # replay did not touch the dataset
    assert len(first) == len(second)
    for a, b in zip(first, second):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
