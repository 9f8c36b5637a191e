"""Host-side audio dataset + prefetching dataloader.

Capabilities of the reference data pipeline (reference: audiolm_pytorch/
data.py:35-164): recursive audio glob, mono downmix, resample to the max
target rate, random-crop-or-pad to max_length, then emit N copies resampled
to N target rates each curtailed to its own frame multiple; pad-to-longest or
curtail-to-shortest collation that transparently handles tuples and strings.

TPU-first differences: no torch DataLoader — a thread-pool prefetcher feeds
pinned numpy batches (the device copy happens once per batch in the trainer),
and host resampling uses scipy's polyphase resampler. FLAC/MP3 decode is
provided by the native C++ loader when built (see native/); WAV is decoded
in-process.
"""
from __future__ import annotations

import math
import queue as queue_mod
import random
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ..utils.audio_io import load_audio

__all__ = ["SoundDataset", "get_dataloader", "collate_one_or_multiple_tensors"]


def _cast_tuple(v, n=1):
    return v if isinstance(v, tuple) else (v,) * n


def _resample_np(x: np.ndarray, orig: int, new: int) -> np.ndarray:
    if orig == new:
        return x
    from scipy.signal import resample_poly
    g = math.gcd(int(orig), int(new))
    return resample_poly(x, new // g, orig // g).astype(np.float32)


def _curtail_to_multiple(x: np.ndarray, mult: Optional[int]) -> np.ndarray:
    if not mult or mult <= 1:
        return x
    n = (x.shape[-1] // mult) * mult
    return x[..., :n]


class SoundDataset:
    """(reference: data.py:35-126)."""

    def __init__(self, folder, *, target_sample_hz, max_length: Optional[int] = None,
                 seq_len_multiple_of=None, exts=None,
                 seed: int = 0):
        if exts is None:
            # reference glob: flac/wav/mp3/webm (data.py:49). mp3/webm join
            # the default only when the FFmpeg-backed decoder built, so a
            # missing FFmpeg degrades to wav+flac instead of crashing
            from . import native_loader
            exts = ("flac", "wav")
            if native_loader.ff_available():
                exts = exts + ("mp3", "webm")
        folder = Path(folder)
        assert folder.exists(), f"folder {folder} does not exist"
        files = []
        for ext in exts:
            files.extend(folder.glob(f"**/*.{ext}"))
        assert len(files) > 0, "no sound files found"
        self.files = sorted(files)

        self.target_sample_hz = _cast_tuple(target_sample_hz)
        num_outputs = len(self.target_sample_hz)
        self.seq_len_multiple_of = _cast_tuple(seq_len_multiple_of, num_outputs)
        assert len(self.seq_len_multiple_of) == num_outputs
        self.max_length = max_length
        self.max_target_sample_hz = max(self.target_sample_hz)
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.files)

    def _load_mono(self, file):
        """Decode + downmix, via the native C++ loader when available."""
        if Path(file).suffix.lower() in (".wav", ".flac"):
            from . import native_loader
            if native_loader.native_available():
                length, rate, _ = native_loader.probe(file)
                out, _, _ = native_loader.load_batch([file], length)
                return out[0], rate
        data, sample_hz = load_audio(file)
        if data.shape[0] > 1:
            data = np.mean(data, axis=0, keepdims=True)  # mono downmix (:76-78)
        return data[0], sample_hz

    def __getitem__(self, idx):
        file = self.files[idx]
        data, sample_hz = self._load_mono(file)

        # resample to the highest target rate first (:82-87)
        data = _resample_np(data, sample_hz, self.max_target_sample_hz)
        sample_hz = self.max_target_sample_hz

        # random crop or right-pad to max_length (:89-96)
        if self.max_length is not None:
            audio_length = data.shape[-1]
            if audio_length > self.max_length:
                max_start = audio_length - self.max_length
                start = self.rng.randint(0, max_start)
                data = data[start: start + self.max_length]
            else:
                data = np.pad(data, (0, self.max_length - audio_length))

        # N outputs at N rates, each curtailed to its multiple (:100-126)
        outputs = []
        for rate, mult in zip(self.target_sample_hz, self.seq_len_multiple_of):
            out = _resample_np(data, sample_hz, rate)
            out = _curtail_to_multiple(out, mult)
            outputs.append(out.astype(np.float32))
        if len(outputs) == 1:
            return outputs[0]
        return tuple(outputs)


def _pad_to_longest(arrs):
    maxlen = max(a.shape[-1] for a in arrs)
    out = np.zeros((len(arrs), maxlen), np.float32)
    for i, a in enumerate(arrs):
        out[i, : a.shape[-1]] = a
    return out


def _curtail_to_shortest(arrs):
    minlen = min(a.shape[-1] for a in arrs)
    return np.stack([a[..., :minlen] for a in arrs])


def collate_one_or_multiple_tensors(items, pad_to_longest: bool = True):
    """Transparently collate tuples / arrays / strings (reference: data.py:130-160)."""
    fuse = _pad_to_longest if pad_to_longest else _curtail_to_shortest
    first = items[0]
    if isinstance(first, str):
        return list(items)
    if isinstance(first, (tuple, list)):
        cols = []
        for field in zip(*items):
            if isinstance(field[0], str):
                cols.append(list(field))
            else:
                cols.append(fuse([np.asarray(f) for f in field]))
        return tuple(cols)
    return fuse([np.asarray(i) for i in items])


class _WorkerError:
    """Exception captured in a loader worker, published under its ticket."""

    def __init__(self, exc):
        self.exc = exc


class _Loader:
    """Thread-prefetching infinite loader over a dataset.

    Batch ORDER is fully deterministic (seeded shuffle + ticketed delivery):
    workers claim a monotonically increasing ticket together with that
    ticket's index slice under one lock, and the consumer releases batches
    strictly in ticket order. Without this, multi-threaded prefetch delivers
    batches in racy completion order — which silently desynchronizes
    multi-process data parallelism, where every process must consume the
    SAME global batch at the same step (examples/multiprocess_dp.py)."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 drop_last: bool = True, pad_to_longest: bool = True,
                 num_workers: int = 2, prefetch: int = 4, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_to_longest = pad_to_longest
        self.prefetch = prefetch
        self.rng = random.Random(seed)
        self._stop = threading.Event()
        self._cv = threading.Condition()
        self._order = []
        self._ticket = 0      # next ticket a worker will claim
        self._next_out = 0    # next ticket the consumer will release
        self._done = {}       # ticket -> batch
        self.threads = [threading.Thread(target=self._worker, daemon=True)
                        for _ in range(max(1, num_workers))]
        for t in self.threads:
            t.start()

    def _claim(self):
        """Claim (ticket, indices) atomically; bounded by `prefetch`."""
        with self._cv:
            while (self._ticket - self._next_out >= self.prefetch
                   and not self._stop.is_set()):
                self._cv.wait(timeout=1.0)
            if self._stop.is_set():
                return None, None
            ticket = self._ticket
            self._ticket += 1
            while len(self._order) < self.batch_size:
                idxs = list(range(len(self.dataset)))
                if self.shuffle:
                    self.rng.shuffle(idxs)
                self._order.extend(idxs)
            batch = self._order[: self.batch_size]
            del self._order[: self.batch_size]
            return ticket, batch

    def _worker(self):
        while not self._stop.is_set():
            ticket, idxs = self._claim()
            if ticket is None:
                return
            # publish exceptions under the ticket instead of dying with it
            # unfilled: an undecodable file would otherwise leave __next__
            # waiting on that ticket forever (silent training hang)
            try:
                items = [self.dataset[i] for i in idxs]
                batch = collate_one_or_multiple_tensors(items, self.pad_to_longest)
            except BaseException as e:  # noqa: BLE001 — re-raised in __next__
                batch = _WorkerError(e)
            with self._cv:
                self._done[ticket] = batch
                self._cv.notify_all()

    def __iter__(self):
        return self

    def __next__(self):
        with self._cv:
            while self._next_out not in self._done:
                if self._stop.is_set():
                    raise StopIteration
                self._cv.wait(timeout=60)
            batch = self._done.pop(self._next_out)
            self._next_out += 1
            self._cv.notify_all()
        if isinstance(batch, _WorkerError):
            raise RuntimeError(
                f"dataloader worker failed on ticket {self._next_out - 1}"
            ) from batch.exc
        return batch

    def stop(self):
        self._stop.set()
        with self._cv:
            self._cv.notify_all()


def get_dataloader(ds, *, batch_size: int, pad_to_longest: bool = True,
                   shuffle: bool = True, drop_last: bool = True,
                   num_workers: int = 2, **kwargs):
    """(reference: data.py:162-164)."""
    return _Loader(ds, batch_size, shuffle=shuffle, drop_last=drop_last,
                   pad_to_longest=pad_to_longest, num_workers=num_workers)
