"""Prefetching host->device loader.

Replaces torch DataLoader worker processes + the CUDA PrefetchLoader
(/root/reference/main.py:395-448): a thread pool decodes/augments into
pinned numpy batches while the device computes; batches cross as uint8 NHWC
(4x less PCIe/ICI traffic than float32) and are normalized on device
(see data/mixup.py). ``device_prefetch`` keeps N batches in flight.

Multi-host: each process reads its own shard (rank-strided indices), the
same convention as torch DistributedSampler — but sharding here is by host,
with per-host batches concatenated into the global jit batch by pjit.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

try:
    import jax
    HAS_JAX = True
except ImportError:  # pragma: no cover
    HAS_JAX = False


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_threads: int = 4,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
        collate_fn: Optional[Callable] = None,
        device_put: bool = False,
        device_prefetch: int = 2,
        num_procs: int = 0,
        dataset_spec=None,
    ):
        """num_procs > 0 decodes in WORKER PROCESSES instead of threads —
        the GIL-free path (PIL releases the GIL inside libjpeg but the
        numpy augment ops do not, so thread decode tops out at ~1 core;
        see scripts/loaderbench.py).

        With ``dataset_spec`` (a data.spawn.DatasetSpec), workers are
        SPAWNED in fresh interpreters that build the dataset themselves —
        safe after JAX backend init (forking a JAX-initialized
        multithreaded process can deadlock; VERDICT r3). Without a spec,
        workers fall back to fork-inheriting the dataset (only safe
        before any JAX computation)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.num_procs = num_procs
        self.dataset_spec = dataset_spec
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.collate_fn = collate_fn or default_collate
        self.device_put = device_put and HAS_JAX
        self.device_prefetch = device_prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.world_size
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        return idx[self.rank::self.world_size]

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        return self.iter_batches(0)

    def iter_batches(self, start: int = 0) -> Iterator[Dict[str, Any]]:
        """Iterate from batch index ``start`` of this epoch's (seeded)
        batch order WITHOUT decoding the skipped batches — mid-epoch
        recovery resume consumes exactly the batches the crashed run
        would have, at zero decode cost for the already-trained ones."""
        if self.num_procs > 0:
            yield from self._iter_procs(start)
            return
        idx = self._indices()
        nb = len(self)
        sample_q: "queue.Queue" = queue.Queue(maxsize=self.num_threads * 8)
        done = object()

        def producer(tid: int):
            for bi in range(start + tid, nb, self.num_threads):
                batch_idx = idx[bi * self.batch_size:(bi + 1) * self.batch_size]
                samples = [self.dataset[int(i)] for i in batch_idx]
                sample_q.put((bi, self.collate_fn(samples)))
            sample_q.put(done)

        threads = [threading.Thread(target=producer, args=(t,), daemon=True)
                   for t in range(self.num_threads)]
        for t in threads:
            t.start()

        # reorder into sequential batches
        pending: Dict[int, Any] = {}
        finished = 0
        want = start
        inflight = []
        while finished < self.num_threads or pending or want < nb:
            if want >= nb:
                break
            if want in pending:
                batch = pending.pop(want)
                want += 1
                if self.device_put:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                    inflight.append(batch)
                    if len(inflight) > self.device_prefetch:
                        yield inflight.pop(0)
                else:
                    yield batch
                continue
            item = sample_q.get()
            if item is done:
                finished += 1
                continue
            pending[item[0]] = item[1]
        yield from inflight


    def _iter_procs(self, start: int = 0) -> Iterator[Dict[str, Any]]:
        """Worker-process decode (GIL-free). Each worker handles a stride
        of the batch indices and pushes collated numpy batches through an
        mp.Queue; the parent reorders into sequential batch order (same
        contract as the thread path). Spawn + DatasetSpec when available
        (safe after JAX init); fork-inherit otherwise."""
        import multiprocessing as mp

        idx = self._indices()
        nb = len(self)
        if self.dataset_spec is not None:
            ctx = mp.get_context("spawn")
            out_q: "mp.Queue" = ctx.Queue(maxsize=self.num_procs * 4)
            procs = [
                ctx.Process(
                    target=_spawn_worker,
                    args=(self.dataset_spec, idx, start + w, nb,
                          self.num_procs, self.batch_size, out_q),
                    daemon=True)
                for w in range(self.num_procs)]
            yield from self._drain_procs(procs, out_q, start, nb)
            return
        ctx = mp.get_context("fork")
        out_q = ctx.Queue(maxsize=self.num_procs * 4)

        def worker(wid: int):
            for bi in range(start + wid, nb, self.num_procs):
                lo = bi * self.batch_size
                batch_idx = idx[lo:lo + self.batch_size]
                samples = [self.dataset[int(i)] for i in batch_idx]
                out_q.put((bi, self.collate_fn(samples)))
            out_q.put(None)

        procs = [ctx.Process(target=worker, args=(w,), daemon=True)
                 for w in range(self.num_procs)]
        yield from self._drain_procs(procs, out_q, start, nb)

    def _drain_procs(self, procs, out_q, start: int, nb: int):
        for p in procs:
            p.start()
        try:
            pending: Dict[int, Any] = {}
            finished = 0
            want = start
            while want < nb:
                if want in pending:
                    batch = pending.pop(want)
                    want += 1
                    yield batch
                    continue
                if finished >= self.num_procs and want not in pending:
                    break  # workers died early; don't hang
                item = out_q.get()
                if item is None:
                    finished += 1
                    continue
                pending[item[0]] = item[1]
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)


def _spawn_worker(spec, idx, first, nb, stride, batch_size, out_q):
    """Module-level target for spawn workers: builds the dataset from its
    picklable spec (fresh interpreter, no JAX import) and streams collated
    batches. idx is the epoch's full index permutation."""
    dataset = spec.build()
    for bi in range(first, nb, stride):
        lo = bi * batch_size
        batch_idx = idx[lo:lo + batch_size]
        samples = [dataset[int(i)] for i in batch_idx]
        out_q.put((bi, default_collate(samples)))
    out_q.put(None)


class DevicePrefetcher:
    """Host->device transfer pipelining: a background thread pulls numpy
    batches from ``raw_iter`` and applies ``put`` (jax.device_put /
    make_array_from_process_local_data), keeping up to ``depth`` device
    batches in flight. Decouples a BLOCKING transfer from the dispatch
    loop — on hosts where the H2D link is slow relative to the step
    (measured: the axon remote-TPU tunnel), the copy then overlaps the
    device step instead of serializing with it. The torch-prefetcher
    role in the reference (main.py:404 use_prefetcher)."""

    def __init__(self, raw_iter, put: Callable, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._done = object()
        self._stop = threading.Event()

        def worker():
            # Worker failures must surface at the consumer, not vanish into
            # a clean StopIteration (which silently truncates an epoch /
            # reports metrics over a partial dataset).
            try:
                for batch in raw_iter:
                    if self._stop.is_set():
                        return
                    item = {k: put(v) for k, v in batch.items()}
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            except BaseException as exc:  # noqa: BLE001 — re-raised in __next__
                self._q.put(("__prefetch_error__", exc))
            finally:
                try:
                    self._q.put_nowait(self._done)
                except queue.Full:
                    pass

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        if isinstance(item, tuple) and len(item) == 2 \
                and item[0] == "__prefetch_error__":
            raise item[1]
        return item

    def close(self):
        """Unblock and retire the worker thread so an unconsumed prefetcher
        (e.g. --steps-per-epoch < len(loader)) doesn't pin ``depth`` device
        batches for the rest of the epoch."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._t.join(timeout=5)


def default_collate(samples) -> Dict[str, np.ndarray]:
    imgs, labels = zip(*samples)
    imgs = np.stack([np.asarray(im, dtype=np.uint8) for im in imgs])
    return {"image": imgs, "label": np.asarray(labels, dtype=np.int32)}


def create_loader(dataset, batch_size: int, is_training: bool = False,
                  **kwargs) -> Loader:
    return Loader(dataset, batch_size, shuffle=is_training,
                  drop_last=is_training, **kwargs)
