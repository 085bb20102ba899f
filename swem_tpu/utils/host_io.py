"""Host-side IO overlap for evaluation: decode-ahead + async PNG writes.

The reference overlaps test-video decoding with GPU compute via
``DataLoader(..., num_workers=4)`` (basic_evaluator.py:62) — while video N
runs on device, workers decode video N+1's JPEG/PNG frames. Our evaluator
iterates datasets directly (whole videos, variable shapes, no collate), so
this module supplies the same overlap TPU-natively:

* :func:`prefetch` — decode up to ``depth`` videos ahead on a background
  thread (PIL/cv2 decode and ``np`` stacking release the GIL, so the decode
  genuinely overlaps the host's dispatch/fetch work for the current video).
* :class:`AsyncWriter` — palette-PNG saves run on writer threads, so disk
  encode/IO of video N's masks overlaps video N+1's compute instead of
  serializing after every video (the reference saves synchronously,
  basic_evaluator.py:186-206; FPS semantics are unchanged — PNG IO sits
  outside the fps tic/toc span either way).

Both are plain ThreadPoolExecutor plumbing: exceptions propagate (at the
blocking ``__next__`` for prefetch, at :meth:`AsyncWriter.flush` for
writes), and bounded queues cap host RAM (a decoded 480p video is ~100 MB).
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, TypeVar

K = TypeVar("K")
V = TypeVar("V")


def prefetch(fetch: Callable[[K], V], keys: Iterable[K], depth: int = 2
             ) -> Iterator[V]:
    """Yield ``fetch(k)`` for each key, fetching up to ``depth`` ahead.

    One background thread fetches in order (decode order == iteration
    order, like a ``num_workers`` loader with a per-item queue); the
    generator blocks only when the consumer outruns the decoder. ``depth``
    bounds host RAM at ``depth + 1`` decoded items. Closing the generator
    early (``break``) drains pending futures before shutdown.
    """
    keys = list(keys)
    if not keys:
        return
    with ThreadPoolExecutor(max_workers=1,
                            thread_name_prefix="swem-prefetch") as ex:
        pending: deque = deque()
        it = iter(keys)
        for _ in range(min(depth, len(keys))):
            pending.append(ex.submit(fetch, next(it)))
        for k in it:
            out = pending.popleft().result()
            pending.append(ex.submit(fetch, k))
            yield out
        while pending:
            yield pending.popleft().result()


class AsyncWriter:
    """Background writer pool for per-frame mask PNGs.

    ``submit(fn, *args)`` enqueues ``fn(*args)`` on the pool, blocking only
    when ``max_pending`` writes are already in flight (bounds the retained
    prediction arrays). ``flush()`` waits for everything and re-raises the
    first failure — call it before reading the files back (metrics) or
    returning. Usable as a context manager (flushes on exit).
    """

    def __init__(self, workers: int = 2, max_pending: int = 256):
        self._ex = ThreadPoolExecutor(max_workers=workers,
                                      thread_name_prefix="swem-write")
        self._pending: deque = deque()
        self._max_pending = max_pending

    def submit(self, fn: Callable, *args) -> None:
        while len(self._pending) >= self._max_pending:
            self._pending.popleft().result()
        self._pending.append(self._ex.submit(fn, *args))

    def flush(self) -> None:
        while self._pending:
            self._pending.popleft().result()

    def close(self) -> None:
        self.flush()
        self._ex.shutdown()

    def __enter__(self) -> "AsyncWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        # on error, still drain so partial files finish before unwinding
        self.close()
