"""Host-side data loader with threaded prefetch.

Replaces torch's DataLoader (reference `src/data/base_datamodule.py:104-126`).
Dataset __getitem__ work (h5 slicing, numpy transforms, voxel hashing) is
numpy-bound and largely releases the GIL, so a thread pool pipelines sample
construction and collation ahead of the accelerator without multiprocessing.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator

import numpy as np

from pointcloudmatters_tpu.data.collate import default_collate


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        num_workers: int = 0,
        collate_fn: Callable | None = None,
        drop_last: bool = False,
        seed: int = 0,
        prefetch_batches: int = 2,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.collate_fn = collate_fn or default_collate
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch_batches = max(1, prefetch_batches)
        self.epoch = 0
        # multi-process data parallelism (the DistributedSampler analog,
        # reference `configs/trainer/ddp.yaml:4-13`): every process builds
        # the SAME epoch permutation (seed+epoch); each global batch of
        # world*batch_size rows is split into contiguous per-process blocks
        # (block p -> process p). batch_size stays per-process like Lightning
        # DDP, and the assembled global batch (process-order concat in
        # Trainer.shard_batch) reproduces the single-process row order
        # exactly — which makes multi-process training bitwise-comparable.
        self.process_index = process_index
        self.process_count = process_count

    def _proc(self) -> tuple[int, int]:
        if self.process_count is not None:
            return self.process_index or 0, self.process_count
        try:
            import jax

            return jax.process_index(), jax.process_count()
        except Exception:  # pragma: no cover - jax uninitialized
            return 0, 1

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        _, world = self._proc()
        if world > 1:
            # only full global batches: every process must yield the same
            # number of batches or collectives deadlock
            return len(self.dataset) // (self.batch_size * world)
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self) -> list[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState((self.seed + self.epoch) % (2**31))
            rng.shuffle(idx)
        rank, world = self._proc()
        if world > 1:
            gb = self.batch_size * world
            lo = rank * self.batch_size
            return [
                idx[i * gb + lo : i * gb + lo + self.batch_size]
                for i in range(len(idx) // gb)
            ]
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def _make_batch(self, indices: np.ndarray):
        return self.collate_fn([self.dataset[int(i)] for i in indices])

    def __iter__(self) -> Iterator:
        batches = self._index_batches()
        self.epoch += 1
        if self.num_workers <= 0:
            for b in batches:
                yield self._make_batch(b)
            return
        # pipelined prefetch: workers build batches a bounded window ahead of
        # consumption (submitting the whole epoch upfront would accumulate
        # every completed batch in memory)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()
        window = max(self.num_workers + self.prefetch_batches, 2)

        def producer():
            from collections import deque

            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                pending: deque = deque()
                it = iter(batches)
                try:
                    while True:
                        while len(pending) < window:
                            nxt = next(it, None)
                            if nxt is None:
                                break
                            pending.append(pool.submit(self._make_batch, nxt))
                        if not pending:
                            break
                        fut = pending.popleft()
                        if stop.is_set():
                            for f in pending:
                                f.cancel()
                            return
                        q.put(("ok", fut.result()))
                except Exception as e:  # propagate to consumer
                    q.put(("err", e))
                    return
            q.put(("done", None))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "done":
                    return
                if kind == "err":
                    raise payload
                yield payload
        finally:
            stop.set()
