"""Long-audio inference: chunked windowing with score aggregation.

The reference caps every utterance at 64,600 samples by crop-or-tile
(`/root/reference/data_utils.py:45-52`) — audio beyond ~4 s is simply
discarded at eval.  SURVEY.md §2's parallelism table specifies the
TPU-native replacement for sequence scaling: strided fixed-length windows
over the time axis, batched through the (static-shape) model as extra
batch rows, aggregated back per utterance.  This keeps every XLA shape
static while covering arbitrarily long audio.

Aggregation follows common CM practice: mean of window scores (the
bonafide log-odds); ``"max"`` / ``"min"`` are available for
worst-case-window policies.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np

WINDOW = 64600


def window_count(n_samples: int, window: int = WINDOW,
                 hop: int = WINDOW // 2) -> int:
    if n_samples <= window:
        return 1
    return 1 + -(-(n_samples - window) // hop)


def make_windows(x: np.ndarray, window: int = WINDOW,
                 hop: int = WINDOW // 2) -> np.ndarray:
    """(n,) waveform -> (n_windows, window) matrix.

    Shorter-than-window audio is tile-repeated exactly like the
    reference's eval padding; the final window is right-aligned so the
    tail is always covered.
    """
    n = x.shape[0]
    if n <= window:
        reps = window // n + 1
        return np.tile(x, reps)[None, :window]
    starts = [i * hop for i in range(window_count(n, window, hop) - 1)]
    starts.append(n - window)
    return np.stack([x[s:s + window] for s in starts])


def score_long_audio(
    waveforms: Sequence[np.ndarray],
    batched_scorer: Callable[[np.ndarray], np.ndarray],
    *,
    window: int = WINDOW,
    hop: int = WINDOW // 2,
    batch_size: int = 64,
    aggregate: str = "mean",
) -> List[float]:
    """Score utterances of arbitrary length.

    ``batched_scorer``: (B, window) -> (B,) bonafide scores (typically a
    jitted ``logits[:, 1]`` forward).  Windows from all utterances are
    packed into fixed-size batches (the tail batch padded by repetition)
    so the scorer compiles exactly once.
    """
    agg = {"mean": np.mean, "max": np.max, "min": np.min}[aggregate]
    all_windows = []
    spans: List[Tuple[int, int]] = []
    for x in waveforms:
        w = make_windows(np.asarray(x), window, hop)
        spans.append((len(all_windows), len(all_windows) + len(w)))
        all_windows.extend(w)
    windows = np.stack(all_windows).astype(np.float32)

    # dispatch pipelined 2 deep (utils/dispatch): converting batch k's
    # scores overlaps device compute of batch k+1
    from aasist_tpu.utils.dispatch import pipelined

    scores = np.empty(len(windows), np.float64)

    from aasist_tpu.parallel.mesh import pad_batch_to_multiple

    def dispatch(i):
        # repeat-last-row padding shared with the mesh layer (the tail
        # batch keeps the jitted scorer's static shape)
        chunk, n_real = pad_batch_to_multiple(
            windows[i:i + batch_size], batch_size)
        return batched_scorer(chunk), i, n_real

    def drain(ticket):
        out, i, n_real = ticket
        scores[i:i + n_real] = np.asarray(out)[:n_real]

    pipelined(range(0, len(windows), batch_size), dispatch, drain)
    return [float(agg(scores[a:b])) for a, b in spans]
