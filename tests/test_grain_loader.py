"""Grain input-pipeline tests: sharding, shuffle determinism, infinite
iteration, O(1) resume, e2e pipeline run with loader: grain."""

import numpy as np
import pytest

from vitcap_tpu.data.grain_loader import GrainDataLoader


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.asarray([i], np.int64), "key": f"k{i}"}


def _ids(batches):
    return [b["x"][:, 0].tolist() for b in batches]


def test_test_mode_sequential_covers_all():
    dl = GrainDataLoader(_ToyDataset(10), 4)
    batches = _ids(list(dl))
    assert sum(batches, []) == list(range(10))
    assert len(dl) == 3
    # string fields collate as lists
    b0 = next(iter(dl))
    assert b0["key"] == ["k0", "k1", "k2", "k3"]


def test_sharding_partitions():
    seen = []
    for shard in range(2):
        dl = GrainDataLoader(_ToyDataset(10), 2, shard_index=shard,
                             shard_count=2)
        seen += sum(_ids(list(dl)), [])
    assert sorted(seen) == list(range(10))


def test_infinite_reshuffles_and_len():
    dl = GrainDataLoader(_ToyDataset(8), 4, shuffle=True, seed=3,
                         infinite=True, max_iter=6)
    batches = _ids(list(dl))
    assert len(batches) == 6 == len(dl)
    # every epoch (2 batches) covers the dataset exactly
    for e in range(3):
        assert sorted(batches[2 * e] + batches[2 * e + 1]) == list(range(8))
    # epochs are re-shuffled (astronomically unlikely to all repeat)
    assert not all(batches[0] == batches[2 * e] for e in (1, 2))
    # deterministic across constructions
    dl2 = GrainDataLoader(_ToyDataset(8), 4, shuffle=True, seed=3,
                          infinite=True, max_iter=6)
    assert _ids(list(dl2)) == batches


def test_start_iter_resume_matches_continuation():
    full = _ids(list(GrainDataLoader(_ToyDataset(16), 4, shuffle=True,
                                     seed=7, infinite=True, max_iter=10)))
    resumed = _ids(list(GrainDataLoader(_ToyDataset(16), 4, shuffle=True,
                                        seed=7, infinite=True, max_iter=10,
                                        start_iter=6)))
    assert resumed == full[6:]


# the e2e pipeline run with `loader: grain` lives in test_pipeline_e2e.py
# (it reuses that module's workdir fixture)
