"""Background-thread batch prefetching.

The reference overlaps host data work with GPU compute via torch
DataLoader worker processes (num_workers=2, persistent_workers=True in
the dataset configs). Image decode/resize here goes through cv2, which
releases the GIL, so a small thread pool overlaps the host pipeline with
device steps without multiprocessing.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator


class PrefetchLoader:
    """Wrap a DetLoader; a worker thread keeps ``buffer_size`` batches ready.

    ``transfer_fn`` (optional) is applied to each yielded batch INSIDE the
    worker thread — pass the runner's ``_device_batch`` so the host→device
    upload of batch N+1 overlaps the device step on batch N (on a tunneled
    TPU the upload is the single largest per-step cost; on a real TPU VM it
    still hides the PCIe copy).
    """

    def __init__(self, loader, buffer_size: int = 2, transfer_fn=None):
        self.loader = loader
        self.buffer_size = buffer_size
        self.transfer_fn = transfer_fn

    def __len__(self):
        return len(self.loader)

    def set_epoch(self, epoch: int):
        self.loader.set_epoch(epoch)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.buffer_size)
        sentinel = object()
        error = []
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put so a consumer that stopped iterating early
            # (max_batches caps, benchmark break) releases the worker —
            # otherwise it would pin buffer_size uploaded batches forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in self.loader:
                    if self.transfer_fn is not None:
                        batch, meta = item
                        item = (self.transfer_fn(batch), meta)
                    if not put(item):
                        return
            except BaseException as e:  # surface worker errors to the consumer
                error.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            stop.set()
            while True:  # drain so the worker's pending put unblocks
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join()
        if error:
            raise error[0]
