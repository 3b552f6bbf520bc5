"""Grain host input pipeline (opt-in alternative to the thread-pool loader).

The reference feeds training with torch DataLoader (8 fork workers) over the
TSV datasets (reference uni_pipeline.py:321-338).  The thread-pool
`data.dataset.DataLoader` here mirrors that; this module offers the same
surface on Google Grain — process-parallel preprocessing, deterministic
per-host sharding (`ShardOptions(process_index, process_count)`), seeded
global shuffle, infinite epoch re-iteration for iteration-based training,
and O(1)-resume via Grain's iterator state (replacing
IterationBasedBatchSampler's skip-ahead).

Select with `loader: grain` in the pipeline YAML (`num_workers` maps to
grain worker processes; 0 = in-process).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Iterator, Optional

from .dataset import collate_numpy


class GrainDataLoader:
    """grain.python.DataLoader over a map-style (dataset[i] -> sample dict).

    Train (`infinite=True`): sharded + seeded shuffle, re-shuffled each
    epoch, yields exactly `max_iter - start_iter` batches, resumable in O(1)
    by iterator state.  Test: one sequential epoch, keep remainder.
    """

    def __init__(self, dataset, batch_size: int, *,
                 shuffle: bool = False, seed: int = 0,
                 infinite: bool = False, max_iter: Optional[int] = None,
                 start_iter: int = 0,
                 shard_index: int = 0, shard_count: int = 1,
                 num_workers: int = 0,
                 collate_fn: Callable = collate_numpy,
                 read_buffer: int = 64):
        import grain.python as pg
        self.dataset = dataset
        self.batch_size = batch_size
        self.start_iter = start_iter
        self._infinite = infinite
        n = len(dataset)

        if infinite:
            assert max_iter is not None
            per_shard = n // shard_count if shard_count > 1 else n
            self._len = max_iter - start_iter
            batches_per_epoch = per_shard // batch_size
            if batches_per_epoch == 0:
                raise ValueError(
                    f"shard has {per_shard} records < batch_size "
                    f"{batch_size}: with drop_remainder the loader would "
                    f"never emit a batch")
            epochs = math.ceil(max_iter / batches_per_epoch) + 1
        else:
            per_shard = int(math.ceil(n / shard_count))
            self._len = int(math.ceil(per_shard / batch_size))
            epochs = 1

        sampler = pg.IndexSampler(
            num_records=n,
            shard_options=pg.ShardOptions(shard_index=shard_index,
                                          shard_count=shard_count,
                                          drop_remainder=infinite),
            shuffle=shuffle,
            num_epochs=epochs,
            seed=seed)
        if start_iter:
            # O(1) resume: samplers are random-access by global index, so
            # restart = view the sequence shifted by start_iter batches
            sampler = _OffsetSampler(sampler, start_iter * batch_size)

        class _Fetch(pg.MapTransform):
            def __init__(self, ds):
                self._ds = ds

            def map(self, idx):
                return self._ds[idx]

        # Batch in the PARENT, not in a pg.Batch operation: operations run
        # inside each worker process on its strided record subsequence, so
        # per-worker batching emits worker_count partial batches per epoch
        # (e.g. 8 workers x 256 records at batch 64 -> eight 32-row
        # batches), breaking both the batch count and the jit-friendly
        # static batch shape.  Grain's output stream is reassembled in
        # sampler order regardless of worker_count, so chunking it here
        # yields batches identical to the worker_count=0 run while the
        # per-record preprocessing still parallelizes across workers.
        self._collate = collate_fn
        self._loader = pg.DataLoader(
            data_source=_IndexSource(n),
            sampler=sampler,
            operations=[_Fetch(dataset)],
            worker_count=num_workers,
            read_options=pg.ReadOptions(prefetch_buffer_size=read_buffer))

    def __len__(self) -> int:
        return self._len

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        it = iter(self._loader)
        for i in range(self._len):
            buf = []
            try:
                while len(buf) < self.batch_size:
                    buf.append(next(it))
            except StopIteration:
                if self._infinite:
                    raise RuntimeError(      # never silently under-train
                        f"grain pipeline exhausted after {i} of "
                        f"{self._len} batches")
                if not buf:
                    return
            yield self._collate(buf)

    def checkpointable_iter(self):
        """Raw grain RECORD iterator (get_state/set_state for exact
        mid-epoch checkpointing beyond the O(1) start_iter resume); the
        caller batches `batch_size` records per step."""
        return iter(self._loader)


class _OffsetSampler:
    """View of a random-access sampler shifted by `offset` records; grain
    requires the returned metadata's index to equal the queried index."""

    def __init__(self, base, offset: int):
        self._base = base
        self._offset = offset

    def __getattr__(self, name):
        # forward sampler metadata (e.g. _shard_options, which DataLoader
        # introspects) to the wrapped sampler.  Never forward dunders:
        # pickle's __getstate__/__reduce__ lookups must see the wrapper
        # itself or unpickled copies lose _base and recurse forever.
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return getattr(self.__dict__["_base"], name)

    def __getstate__(self):
        return self.__dict__

    def __setstate__(self, state):
        self.__dict__.update(state)

    def __len__(self) -> int:
        return max(0, len(self._base) - self._offset)

    def __getitem__(self, index: int):
        import grain.python as pg
        md = self._base[index + self._offset]
        return pg.RecordMetadata(index=index, record_key=md.record_key,
                                 rng=md.rng)


class _IndexSource:
    """RandomAccessDataSource of bare indices: the real record fetch happens
    inside the _Fetch operation so grain workers re-open TSV files lazily
    (fork-safe, like the reference's pid-checked TSVFile)."""

    def __init__(self, n: int):
        self._n = n

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, idx: int) -> int:
        return idx


def _skip(it) -> None:
    try:
        next(it)
    except StopIteration:
        pass
