"""Async scene loading + host-side sorting (H6/H7: PlyLoaderAsync,
SplatSorterAsync).

- :class:`AsyncSceneLoader`: worker-thread file loading with progress/cancel
  (ply_loader_async.h loadScene/getStatus/consume protocol) so a UI or
  training loop keeps running while 100M-splat PLYs parse.
- :class:`AsyncHostSorter`: the reference's CPU sorting path
  (splat_sorter_async.{h,cpp}) — plane-distance keys + argsort on a worker
  thread, lazy restart on camera movement, double-buffered consume. The
  device pipelines take the resulting order as a pre-sorted index array
  (SortMethod.HOST), trading sort-on-device time for sort staleness exactly
  like the reference's CPU-sort mode.
"""

from __future__ import annotations

import threading

import numpy as np


class LoadStatus:
    IDLE = 0
    LOADING = 1
    READY = 2
    FAILED = 3
    CANCELLED = 4


class AsyncSceneLoader:
    """Background file loader (PlyLoaderAsync protocol)."""

    def __init__(self):
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._status = LoadStatus.IDLE
        self._progress = 0.0
        self._result = None
        self._error: Exception | None = None
        self._cancel = False

    def load_scene(self, path: str) -> bool:
        with self._lock:
            if self._status == LoadStatus.LOADING:
                return False
            self._status = LoadStatus.LOADING
            self._progress = 0.0
            self._result = None
            self._error = None
            self._cancel = False
        self._thread = threading.Thread(target=self._inner_load, args=(path,),
                                        daemon=True)
        self._thread.start()
        return True

    def _inner_load(self, path: str):
        from vk_gaussian_splatting_tpu.io import load_scene
        try:
            with self._lock:
                self._progress = 0.1
            result = load_scene(path)
            with self._lock:
                if self._cancel:
                    self._status = LoadStatus.CANCELLED
                else:
                    self._result = result
                    self._progress = 1.0
                    self._status = LoadStatus.READY
        except Exception as e:  # surfaced via status/consume
            with self._lock:
                self._error = e
                self._status = LoadStatus.FAILED

    def get_status(self) -> tuple[int, float]:
        with self._lock:
            return self._status, self._progress

    def cancel(self):
        with self._lock:
            self._cancel = True

    def consume(self):
        """Returns the loaded SplatSet once READY (and resets), else None.
        Raises the captured exception on FAILED."""
        if self._thread is not None:
            if self.get_status()[0] == LoadStatus.LOADING:
                return None
            self._thread.join()
            self._thread = None
        with self._lock:
            if self._status == LoadStatus.FAILED:
                err = self._error
                self._status = LoadStatus.IDLE
                raise err
            if self._status != LoadStatus.READY:
                return None
            out = self._result
            self._result = None
            self._status = LoadStatus.IDLE
            return out


class AsyncHostSorter:
    """Reference CPU sorting path (SplatSorterAsync).

    Depth keys are the view-plane distance dot(mean, view_dir)
    (splat_sorter_async.cpp:118-125); sorting runs std-sort style on a worker
    thread; `sort_async` is lazy — a new request while a sort is running is
    remembered and started when the current one finishes (h:84-113)."""

    def __init__(self, means: np.ndarray):
        self.means = np.asarray(means, np.float32)
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None
        self._pending_dir = None
        self._running = False
        self._result: np.ndarray | None = None
        self._result_dir = None

    def sort_async(self, view_dir) -> None:
        view_dir = np.asarray(view_dir, np.float64)
        with self._lock:
            if self._running:
                self._pending_dir = view_dir
                return
            self._running = True
        self._start(view_dir)

    def _start(self, view_dir):
        self._thread = threading.Thread(target=self._inner_sort,
                                        args=(view_dir,), daemon=True)
        self._thread.start()

    def _inner_sort(self, view_dir):
        from vk_gaussian_splatting_tpu import native

        dist = self.means @ view_dir.astype(np.float32)
        if native.available():
            order = native.radix_argsort_f32(dist)  # vrdx-parity radix path
        else:
            order = np.argsort(dist, kind="stable").astype(np.int32)
        restart = None
        with self._lock:
            self._result = order
            self._result_dir = view_dir
            if self._pending_dir is not None:
                restart = self._pending_dir
                self._pending_dir = None
            else:
                self._running = False
        if restart is not None:
            self._start(restart)

    def consume(self):
        """(order, view_dir) of the most recent completed sort, or None."""
        with self._lock:
            if self._result is None:
                return None
            out = self._result, self._result_dir
            self._result = None
            return out

    def join(self):
        while True:
            with self._lock:
                t = self._thread
                running = self._running
            if t is not None:
                t.join()
            with self._lock:
                if not self._running or self._thread is None:
                    break
                if self._thread is t and not self._pending_dir:
                    self._running = False
                    break
