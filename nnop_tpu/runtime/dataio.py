"""Training data pipeline: token packing, shuffled batching, host->device
prefetch.

North-star framework scope (the reference is a kernel library with no IO
layer). Design: documents are tokenized (runtime/tokenizer.py), packed
into fixed-length rows separated by an EOS id (standard LM packing — no
padding waste), shuffled at the row level, and yielded as (tokens,
targets) next-token pairs. `prefetch_to_device` overlaps host batch prep
with device steps via a one-deep pipeline.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax
import numpy as np


def pack_tokens(streams: Iterable[list[int]], seq_len: int,
                eos_id: int = 0) -> np.ndarray:
    """Concatenate token lists (EOS-separated) and cut into (N, seq_len+1)
    rows (the +1 column provides next-token targets)."""
    buf: list[int] = []
    rows = []
    width = seq_len + 1
    for toks in streams:
        buf.extend(toks)
        buf.append(eos_id)
        while len(buf) >= width:
            rows.append(buf[:width])
            # overlap one token so every position has a target
            buf = buf[seq_len:]
    if not rows:
        raise ValueError("not enough tokens for a single row")
    return np.asarray(rows, np.int32)


def batches(rows: np.ndarray, batch_size: int, *, shuffle: bool = True,
            seed: int = 0, drop_remainder: bool = True
            ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (tokens (B, L), targets (B, L)) epoch batches."""
    n = rows.shape[0]
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    stop = (n // batch_size) * batch_size if drop_remainder else n
    for i in range(0, stop, batch_size):
        chunk = rows[order[i : i + batch_size]]
        yield chunk[:, :-1], chunk[:, 1:]


def prefetch_to_device(it: Iterator, sharding=None, depth: int = 2):
    """Move batches to device ahead of consumption (overlaps H2D with
    compute). `sharding` optionally places batches on a mesh."""

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    queue = collections.deque()
    for batch in it:
        queue.append(put(batch))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def pack_tokens_segmented(streams: Iterable[list[int]], seq_len: int,
                          eos_id: int = 0):
    """Document-aware LM packing: like pack_tokens, but also returns
    per-position SEGMENT ids (1-based document index within the row) and
    per-position POSITIONS (index within the document), so the model can
    mask cross-document attention (flash_attention segment_ids) and
    reset rope per document. Returns (rows, segments, positions), each
    (N, seq_len + 1) int32.
    """
    width = seq_len + 1
    buf: list[int] = []
    seg: list[int] = []
    pos: list[int] = []
    rows, segs, poss = [], [], []
    doc = 1
    for toks in streams:
        start = len(buf)
        buf.extend(toks)
        buf.append(eos_id)
        seg.extend([doc] * (len(buf) - start))
        pos.extend(range(len(buf) - start))
        doc += 1
        while len(buf) >= width:
            rows.append(buf[:width])
            # renumber the row's segments from 1 (ids are row-local)
            s0 = seg[0]
            segs.append([s - s0 + 1 for s in seg[:width]])
            poss.append(pos[:width])
            buf, seg, pos = buf[seq_len:], seg[seq_len:], pos[seq_len:]
            # the carried overlap token keeps its original doc/pos
    if not rows:
        raise ValueError("not enough tokens for a single row")
    return (
        np.asarray(rows, np.int32),
        np.asarray(segs, np.int32),
        np.asarray(poss, np.int32),
    )
