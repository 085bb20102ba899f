"""Training batch loader: multiprocess prefetching, iteration-based sampling.

Replaces torch DataLoader + DistributedSampler + IterationBasedBatchSampler
(/root/reference/datasets/dataloader.py:12-36, samplers/*): an infinite,
deterministically-seeded stream of host numpy batches. Epoch-shuffled
indices, per-sample RNG derived from (seed, iteration, position), and a
process pool that keeps ``prefetch`` batches in flight while the TPU step
runs.

Multi-host data sharding: pass (shard_id, num_shards) to give each host a
disjoint slice of every batch's sample stream (the DistributedSampler
equivalent).
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Dict, Iterator

import numpy as np

_WORKER_DATASET = None


def _worker_init(dataset_factory):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset_factory()


def sample_with_rng(dataset, idx: int, seed: int, it: int):
    """The loader's determinism contract: one RNG per (seed, iter, index)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, it, idx]))
    return dataset.sample(rng, idx, it)


def _worker_sample(args):
    idx, seed, it = args
    return sample_with_rng(_WORKER_DATASET, idx, seed, it)


class EpochShuffler:
    """Epoch-seeded shuffled index stream (samplers/distributed.py:11-67)."""

    def __init__(self, n: int, seed: int, start_pos: int = 0):
        self.n = n
        self.seed = seed
        self.pos = start_pos

    def take(self, count: int):
        out = []
        while count > 0:
            epoch, off = divmod(self.pos, self.n)
            perm = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])
            ).permutation(self.n)
            grab = min(count, self.n - off)
            out.extend(int(i) for i in perm[off : off + grab])
            self.pos += grab
            count -= grab
        return out


class TrainLoader:
    """Infinite batch iterator.

    dataset_factory: zero-arg callable building the dataset inside each
    worker (datasets hold PIL/cv2 state that should not cross fork
    boundaries mid-use). batch: per-host batch size. start_iter resumes the
    data schedule exactly (dataloader.py:27).
    """

    def __init__(self, dataset_factory, batch: int, *, seed: int = 123,
                 num_workers: int = 8, start_iter: int = 0,
                 shard_id: int = 0, num_shards: int = 1, prefetch: int = 2):
        self.factory = dataset_factory
        self.batch = batch
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.it = start_iter
        probe = dataset_factory()
        n = len(probe)
        global_batch = batch * num_shards
        self.shuffler = EpochShuffler(n, seed, start_pos=start_iter * global_batch)
        self.shard_id = shard_id
        self.num_shards = num_shards
        self._pool = None
        self._local_dataset = probe if num_workers == 0 else None
        self._stop = None
        self._thread = None

    def _ensure_pool(self):
        if self.num_workers > 0 and self._pool is None:
            # spawn: forking after the TPU backend initializes can deadlock
            # the child; a fresh interpreter only re-imports (lazy jax init).
            # Requires the dataset factory to be picklable.
            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_worker_init, initargs=(self.factory,)
            )

    def _batch_indices(self):
        all_idx = self.shuffler.take(self.batch * self.num_shards)
        return all_idx[self.shard_id :: self.num_shards]

    def _make_batch(self, indices, it) -> Dict[str, np.ndarray]:
        args = [(idx, self.seed, it) for idx in indices]
        if self.num_workers == 0:
            samples = [_collect(self._local_dataset, a) for a in args]
        else:
            samples = self._pool.map(_worker_sample, args)
        return {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._ensure_pool()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        self._stop = stop

        def producer():
            while not stop.is_set():
                it = self.it
                indices = self._batch_indices()
                self.it += 1
                try:
                    b = self._make_batch(indices, it)
                except BaseException as e:  # propagate instead of hanging the consumer
                    b = e
                while not stop.is_set():
                    try:
                        q.put(b, timeout=1)
                        break
                    except queue.Full:
                        continue
                if isinstance(b, BaseException):
                    return

        t = threading.Thread(target=producer, daemon=True)
        self._thread = t
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def close(self):
        """Stop the producer thread AND the worker pool.

        The generator's own ``finally`` only fires when the iterator is
        garbage-collected; a caller that merely stops pulling batches would
        otherwise leave a daemon thread building one more batch in the
        background (stealing host cores from whatever runs next — found as
        cross-stage pollution in scripts/loader_bench.py)."""
        if self._stop is not None:
            self._stop.set()
        if self._pool is not None:
            self._pool.terminate()  # unblocks a producer stuck in pool.map
            self._pool = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


def _collect(dataset, args):
    idx, seed, it = args
    return sample_with_rng(dataset, idx, seed, it)
