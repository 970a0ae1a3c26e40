"""Waveform loading, padding policies, and device-feeding batchers.

TPU-first counterpart of the reference data layer
(`/root/reference/data_utils.py:45-213` + DataLoader assembly at
`main.py:262-344`):

  * audio decode happens on host threads (aasist_tpu.data.audio_io: native
    C++ FLAC decoder / NumPy WAV reader), standing in for the reference's
    soundfile DataLoader workers;
  * padding policies are reproduced: fixed 64,600-sample crop-or-tile for
    dev/eval (``pad`` -> :func:`pad_to_fixed`), random crop/tile
    (``pad_random``), and dynamic chunk size (DCS, ``dynamic_chunk_size``);
  * where the reference fed XLA-hostile ragged batches (`pad_sequence`
    collate, zero-padded to a per-batch max length — `data_utils.py:100-119`),
    DCS lengths here are snapped to a small fixed set of bucket lengths so
    jit recompiles a bounded number of times (SURVEY.md §7 "hard parts");
  * batches land on device sharded along the batch axis of a
    `jax.sharding.Mesh` (data parallelism), with an async prefetch depth
    of 2 so host decode overlaps device compute.

The reference's silent zero-tensor-on-error path (`data_utils.py:189-194`,
which mislabeled corrupt files as bonafide) is intentionally NOT
replicated: read errors raise.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from pathlib import Path
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from aasist_tpu.data import audio_io

FIXED_EVAL_LEN = 64600      # ~4.04 s @ 16 kHz (data_utils.py:45)
FIXED_TRAIN_LEN = 96000     # 6 s  @ 16 kHz (data_utils.py:128)


# ------------------------------------------------------------- pad policies
def pad_to_fixed(x: np.ndarray, max_len: int = FIXED_EVAL_LEN) -> np.ndarray:
    """Crop, or tile-repeat then crop, to exactly ``max_len`` samples."""
    n = x.shape[0]
    if n >= max_len:
        return x[:max_len]
    reps = max_len // n + 1
    return np.tile(x, reps)[:max_len]


def pad_random(x: np.ndarray, max_len: int,
               rng: np.random.Generator) -> np.ndarray:
    """Random-crop when long; tile-repeat when short (data_utils.py:55-65)."""
    n = x.shape[0]
    if n > max_len:
        start = rng.integers(0, n - max_len)
        return x[start:start + max_len]
    if n == max_len:
        return x
    reps = max_len // n + 1
    return np.tile(x, reps)[:max_len]


def bucket_lengths(min_samples: int, max_samples: int,
                   num_buckets: int) -> np.ndarray:
    """Static DCS length buckets, multiples of 4 (collate rule kept from
    data_utils.py:106-109 so time dims stay divisible through the model)."""
    ls = np.linspace(min_samples, max_samples, num_buckets)
    # ceil so the top bucket always covers max_samples (per-sample DCS
    # targets are drawn up to max_samples and must fit in some bucket)
    return (np.ceil(ls / 4).astype(np.int64) * 4)


def dynamic_chunk(x: np.ndarray, rng: np.random.Generator,
                  target: int, pad_to: int) -> Tuple[np.ndarray, float]:
    """Per-sample dynamic chunk size (reference data_utils.py:68-97).

    Crops (random start) or tile-repeats the waveform to ``target``
    samples, then zero-pads to ``pad_to`` — the reference collate does the
    same zero-pad to the batch max length (data_utils.py:100-119); here
    ``pad_to`` is the batch's bucket length so shapes stay static for XLA.
    Returns (wave (pad_to,), duration_seconds) with
    duration = target/16000, the per-sample value the duration-adaptive
    ALMFT margin consumes.
    """
    duration = target / 16000.0
    n = x.shape[0]
    if n >= target:
        start = rng.integers(0, n - target + 1)
        row = x[start:start + target]
    else:
        reps = target // n + 1
        row = np.tile(x, reps)[:target]
    if target < pad_to:
        row = np.concatenate(
            [row, np.zeros(pad_to - target, dtype=row.dtype)])
    return row, duration


def draw_chunk_targets(rng: np.random.Generator, n: int, min_samples: int,
                       max_samples: int) -> np.ndarray:
    """Per-sample target lengths ~ U{min..max}, the reference's draw
    (data_utils.py:84: np.random.randint(min, max+1))."""
    return rng.integers(min_samples, max_samples + 1, size=n)


def snap_up_to_bucket(value: int, buckets: np.ndarray) -> int:
    """Smallest bucket >= value (buckets sorted ascending)."""
    idx = int(np.searchsorted(buckets, value, side="left"))
    return int(buckets[min(idx, len(buckets) - 1)])


# ------------------------------------------------------------- audio store
class AudioStore:
    """Reads waveforms for utterance ids from a dataset directory.

    Layout matches ASVspoof2019: ``{base_dir}/flac/{utt_id}.flac``; plain
    ``.wav`` files are also accepted (used by the synthetic test fixture).
    """

    def __init__(self, base_dir):
        self.base_dir = Path(base_dir)
        self._flac = self.base_dir / "flac"

    def read(self, utt_id: str) -> np.ndarray:
        p = self._flac / f"{utt_id}.flac"
        if p.exists():
            # hot path: single-pass native decode to float32 (exact for
            # <=24-bit PCM; the pipeline is float32 downstream anyway)
            from aasist_tpu.data.flac_native import read_flac_f32
            data, _sr = read_flac_f32(p)
            data = np.asarray(data)
            if data.ndim > 1:
                # stereo/multichannel: mean-downmix, matching the WAV
                # reader (round-4 review: FLAC used to return (n, ch)
                # while the same audio as WAV came back mono)
                data = data.mean(axis=1, dtype=np.float32)
            return data
        p = self._flac / f"{utt_id}.wav"
        if p.exists():
            data, _sr = audio_io.read_audio(p)
            return np.asarray(data)
        raise FileNotFoundError(
            f"no audio for {utt_id!r} under {self._flac}")


# ---------------------------------------------------------------- batchers
class _ConsumerGone(BaseException):
    """Raised inside a producer thread when its consumer went away."""


def _iter_prefetched(produce: Callable, prefetch: int) -> Iterator:
    """Items produced on a daemon thread, with bounded prefetch.

    ``produce(emit)`` is run on the thread and calls ``emit(item)`` once
    per batch; producer errors re-raise in the consumer.  Closing the
    returned generator (or abandoning iteration — ``break``, an exception,
    garbage collection) sets a stop flag that ``emit`` polls while blocked
    on the bounded queue, so the producer thread and its prefetch buffers
    are reclaimed promptly instead of leaking for the life of the process.
    """
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()
    done = object()

    def emit(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue
        raise _ConsumerGone

    def run():
        try:
            produce(emit)
        except _ConsumerGone:
            return
        except BaseException as e:  # surface worker errors to consumer
            item = e
        else:
            item = done
        try:
            emit(item)
        except _ConsumerGone:
            pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is done:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def _device_put_sharded(batch_np: np.ndarray, sharding=None):
    import jax
    if sharding is None:
        return jax.device_put(batch_np)
    return jax.device_put(batch_np, sharding)


def _pad_batch_rows(rows: List[np.ndarray], pad_rows_to: int
                    ) -> Tuple[np.ndarray, int]:
    """Stack rows, padding the batch dim to ``pad_rows_to`` by repeating the
    last row (keeps shapes static for jit; callers mask out the tail)."""
    n_real = len(rows)
    if n_real < pad_rows_to:
        rows = rows + [rows[-1]] * (pad_rows_to - n_real)
    # copy=False: FLAC-path rows are already float32 — avoid a full
    # redundant batch copy on the loader hot path (round-4 review)
    return np.stack(rows).astype(np.float32, copy=False), n_real


class EvalBatcher:
    """Deterministic fixed-length batches for dev/eval scoring.

    Equivalent of ``Dataset_ASVspoof2019_deveval`` + its DataLoader
    (data_utils.py:196-213, main.py:321-342), with: fixed 64,600-sample
    padding, static batch shapes (tail batch padded by repetition and
    masked), threaded decode, and prefetch onto the device mesh.
    """

    def __init__(self, store: AudioStore, utt_ids: Sequence[str],
                 batch_size: int, sharding=None,
                 num_threads: Optional[int] = None,
                 fixed_len: int = FIXED_EVAL_LEN, prefetch: int = 2):
        self.store = store
        self.utt_ids = list(utt_ids)
        self.batch_size = batch_size
        self.sharding = sharding
        self.fixed_len = fixed_len
        self.num_threads = (num_threads if num_threads is not None
                            else min(8, os.cpu_count() or 1))
        self.prefetch = prefetch

    def __len__(self):
        return -(-len(self.utt_ids) // self.batch_size)

    def _load_one(self, utt_id: str) -> np.ndarray:
        return pad_to_fixed(self.store.read(utt_id), self.fixed_len)

    def __iter__(self) -> Iterator[Tuple[object, List[str], int]]:
        """Yields (device_batch (B, L), utt_ids, n_real)."""
        def produce(emit):
            with cf.ThreadPoolExecutor(self.num_threads) as pool:
                for i in range(0, len(self.utt_ids), self.batch_size):
                    ids = self.utt_ids[i:i + self.batch_size]
                    rows = list(pool.map(self._load_one, ids))
                    batch, n_real = _pad_batch_rows(rows, self.batch_size)
                    emit((batch, ids, n_real))

        for batch, ids, n_real in _iter_prefetched(produce, self.prefetch):
            yield _device_put_sharded(batch, self.sharding), ids, n_real


class TrainBatcher:
    """Shuffled training batches with fixed-length or bucketed-DCS windows.

    Equivalent of ``Dataset_ASVspoof2019_train`` + train DataLoader
    (data_utils.py:121-194, main.py:297-312): per-epoch shuffle with a
    seeded generator, drop_last semantics, labels taken from the protocol
    (bonafide=1 — fixing fork drift #2), waveform windows either fixed
    96,000 samples or DCS-bucketed with per-sample durations for ALMFT.
    """

    def __init__(self, store: AudioStore, utt_ids: Sequence[str],
                 labels: dict, batch_size: int, seed: int,
                 dcs_buckets: Optional[np.ndarray] = None,
                 dcs_min: int = 16000, dcs_max: int = 96000,
                 fixed_len: int = FIXED_TRAIN_LEN,
                 sharding=None, num_threads: Optional[int] = None,
                 prefetch: int = 2):
        self.store = store
        self.utt_ids = list(utt_ids)
        self.labels = labels
        self.batch_size = batch_size
        self.seed = seed
        self.dcs_buckets = (np.sort(np.asarray(dcs_buckets))
                            if dcs_buckets is not None else None)
        if (self.dcs_buckets is not None
                and int(self.dcs_buckets[-1]) < dcs_max):
            # snap_up_to_bucket clamps to the top bucket; a bucket set
            # that doesn't cover dcs_max would silently produce rows
            # shorter than their chunk target and crash np.stack with
            # ragged shapes mid-epoch (round-4 review) — fail at build
            raise ValueError(
                f"dcs_buckets top ({int(self.dcs_buckets[-1])}) must"
                f" cover dcs_max ({dcs_max})")
        self.dcs_min = dcs_min
        self.dcs_max = dcs_max
        self.fixed_len = fixed_len
        self.sharding = sharding
        self.num_threads = (num_threads if num_threads is not None
                            else min(8, os.cpu_count() or 1))
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        return len(self.utt_ids) // self.batch_size  # drop_last

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_rng(self) -> np.random.Generator:
        return np.random.default_rng((self.seed, self.epoch))

    def __iter__(self):
        """Yields (x_dev (B, L), y_dev (B,), durations (B,)) on device.

        DCS mode reproduces the reference per-SAMPLE: each row draws its
        own target_len ~ U{min..max} (data_utils.py:84), crops/tiles to
        it, and carries its own duration into the ALMFT margin; the batch
        is zero-padded (like the reference collate, data_utils.py:100-119)
        to the smallest bucket covering the batch's longest target, so XLA
        sees at most ``len(buckets)`` static shapes.
        """
        rng = self._epoch_rng()
        order = rng.permutation(len(self.utt_ids))
        n_batches = len(self)

        def load_row(utt_id: str, target: int, pad_to: int,
                     row_rng: np.random.Generator):
            x = self.store.read(utt_id)
            if self.dcs_buckets is not None:
                row, dur = dynamic_chunk(x, row_rng, target, pad_to)
                return row, dur
            return pad_random(x, target, row_rng), target / 16000.0

        def produce(emit):
            with cf.ThreadPoolExecutor(self.num_threads) as pool:
                for b in range(n_batches):
                    idx = order[b * self.batch_size:
                                (b + 1) * self.batch_size]
                    ids = [self.utt_ids[i] for i in idx]
                    row_rngs = [np.random.default_rng(
                        (self.seed, self.epoch, b, j))
                        for j in range(len(ids))]
                    if self.dcs_buckets is not None:
                        targets = [int(draw_chunk_targets(
                            r, 1, self.dcs_min, self.dcs_max)[0])
                            for r in row_rngs]
                        pad_to = snap_up_to_bucket(max(targets),
                                                   self.dcs_buckets)
                    else:
                        targets = [self.fixed_len] * len(ids)
                        pad_to = self.fixed_len
                    out = list(pool.map(load_row, ids, targets,
                                        [pad_to] * len(ids), row_rngs))
                    x = np.stack([r for r, _ in out]).astype(
                        np.float32, copy=False)
                    y = np.asarray([self.labels[u] for u in ids],
                                   np.int32)
                    dur = np.asarray([d for _, d in out], np.float32)
                    emit((x, y, dur))

        for x, y, dur in _iter_prefetched(produce, self.prefetch):
            yield (_device_put_sharded(x, self.sharding),
                   _device_put_sharded(y, self.sharding),
                   _device_put_sharded(dur, self.sharding))
