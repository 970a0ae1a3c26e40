"""Pipelined async-dispatch helper.

JAX dispatch is asynchronous: a jitted call returns device futures
immediately, and the host blocks only when it converts a result.  On
tunneled TPU backends that conversion is a ~27 ms RPC (docs/PERF.md), so
every batched driver in this repo keeps ``depth`` calls in flight and
drains the oldest — fetching batch k's result overlaps device compute of
batches k+1..k+depth.  This module is the single implementation of that
loop (used by ``train.loop.produce_scores``, ``serving.Scorer`` and
``ops.long_audio``).
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Iterable


def pipelined(items: Iterable[Any],
              dispatch: Callable[[Any], Any],
              drain: Callable[[Any], None],
              depth: int = 2) -> None:
    """Run ``dispatch(item)`` for every item, calling ``drain(ticket)``
    on each dispatch's return value in order, with up to ``depth``
    tickets in flight.  ``depth=0`` degenerates to fully synchronous.
    """
    pending = collections.deque()
    for it in items:
        pending.append(dispatch(it))
        if len(pending) > depth:
            drain(pending.popleft())
    while pending:
        drain(pending.popleft())
