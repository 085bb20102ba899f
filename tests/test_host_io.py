"""Host-IO overlap plumbing (utils/host_io.py): the evaluator's decode-ahead
prefetch and async PNG writer (the reference's DataLoader num_workers=4
equivalent, basic_evaluator.py:62). Output correctness of the wired-in
evaluator paths is covered by tests/test_eval_e2e.py; these pin the
primitives' ordering, bounding, and error contracts."""

import os
import threading
import time

import numpy as np
import pytest

from swem_tpu.utils.host_io import AsyncWriter, prefetch


class TestPrefetch:
    def test_order_preserved(self):
        assert list(prefetch(lambda i: i * i, range(10), depth=3)) == [
            i * i for i in range(10)
        ]

    def test_empty(self):
        assert list(prefetch(lambda i: i, [], depth=2)) == []

    def test_fetch_runs_ahead(self):
        """While the consumer sits on item 0, the decoder thread must
        already be pulling later keys (that's the whole point)."""
        started = []
        gate = threading.Event()

        def fetch(i):
            started.append(i)
            if i >= 2:
                gate.set()
            return i

        gen = prefetch(fetch, range(5), depth=3)
        first = next(gen)
        assert gate.wait(timeout=5.0), f"no lookahead, started={started}"
        assert first == 0 and started[0] == 0
        assert list(gen) == [1, 2, 3, 4]

    def test_depth_bounds_lookahead(self):
        """At most depth items are fetched beyond what was consumed."""
        fetched = []

        def fetch(i):
            fetched.append(i)
            return i

        gen = prefetch(fetch, range(20), depth=2)
        next(gen)
        time.sleep(0.2)  # give the worker time to overrun if it were going to
        assert max(fetched) <= 3, fetched  # 1 yielded + 2 ahead (+1 in flight)
        gen.close()

    def test_exception_propagates(self):
        def fetch(i):
            if i == 3:
                raise ValueError("decode failed")
            return i

        gen = prefetch(fetch, range(6), depth=2)
        got = [next(gen), next(gen), next(gen)]
        assert got == [0, 1, 2]
        with pytest.raises(ValueError, match="decode failed"):
            next(gen)


class TestAsyncWriter:
    def test_writes_complete_on_flush(self, tmp_path):
        from PIL import Image

        from swem_tpu.data.palette import davis_palette, save_seg_mask

        pal = davis_palette()
        arrs = [np.full((8, 8), i % 4, np.uint8) for i in range(12)]
        with AsyncWriter(workers=2) as w:
            for i, a in enumerate(arrs):
                w.submit(save_seg_mask, a, str(tmp_path / f"{i}.png"), pal)
        for i, a in enumerate(arrs):
            back = np.array(Image.open(tmp_path / f"{i}.png"))
            np.testing.assert_array_equal(back, a)

    def test_flush_reraises(self):
        def boom():
            raise OSError("disk full")

        w = AsyncWriter()
        w.submit(boom)
        with pytest.raises(OSError, match="disk full"):
            w.flush()
        w.close()

    def test_max_pending_bounds_queue(self):
        """submit() blocks (drains) rather than growing without bound."""
        release = threading.Event()
        done = []

        def slow(i):
            release.wait(5.0)
            done.append(i)

        w = AsyncWriter(workers=1, max_pending=4)
        for i in range(4):
            w.submit(slow, i)
        assert len(w._pending) <= 4
        release.set()
        w.submit(slow, 4)
        assert len(w._pending) <= 4
        w.close()
        assert sorted(done) == list(range(5))
