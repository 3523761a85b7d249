"""Async artifact saving pool (reference MultiprocessManager /
multiprocess_run_tqdm, `utils/commons/multiprocess_utils.py:141-230`, used for
test-time wav/plot dumps). Thread-based here: the save workload is IO +
scipy/matplotlib C code, and threads avoid re-initializing JAX in children."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor


class AsyncSaver:
    def __init__(self, workers: int = 4):
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._futures = []

    def submit(self, fn, *args, **kwargs) -> None:
        self._futures.append(self._pool.submit(fn, *args, **kwargs))

    def join(self) -> list:
        out = [f.result() for f in self._futures]
        self._futures.clear()
        return out

    def close(self) -> None:
        self.join()
        self._pool.shutdown()
