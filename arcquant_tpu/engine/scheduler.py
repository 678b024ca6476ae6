"""Continuous-batching scheduler over the InferenceEngine.

The reference has no scheduler at all — its e2e benchmark drives a
fixed batch through prefill-then-decode (benchmark_e2e_arc.py:
134-166), and its page-table logic builds one static table per run
(modeling_arc.py:372-410). This module is the serving loop that turns
those pieces into a system: a request queue, slot allocation over the
fixed-size device batch, prefill admission, batched decode stepping,
and completion/retirement — all host-side logic around the two jitted
engine steps, so nothing here recompiles.

Design notes (TPU-first):
  - The device batch has a FIXED width (EngineConfig.max_batch); slots
    are activated/retired via the decode step's `active` mask, so the
    decode step never recompiles as requests come and go.
  - New requests are admitted by running a prefill for the joining
    slots only (padded to the slot batch width with len-0 rows); the
    paged cache lets the joining sequences land in their own pages
    without touching running ones.
  - Prefill lengths are bucketed to powers of two to bound the number
    of prefill compilations.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .engine import InferenceEngine


@dataclass
class Request:
    prompt: List[int]
    max_new_tokens: int = 128
    eos_id: Optional[int] = None
    request_id: int = field(default_factory=itertools.count().__next__)
    output: List[int] = field(default_factory=list)
    done: bool = False
    error: Optional[str] = None


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class ContinuousBatcher:
    """Admits requests into engine slots and steps the batch."""

    def __init__(self, engine: InferenceEngine):
        self.engine = engine
        self.state = engine.new_state()
        b = engine.ecfg.max_batch
        self.slots: List[Optional[Request]] = [None] * b
        self.next_token = np.zeros((b,), np.int32)
        self.queue: List[Request] = []
        self.finished: List[Request] = []

    # -- admission ----------------------------------------------------------

    def submit(self, req: Request) -> None:
        self.queue.append(req)

    def _free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self.slots) if s is None]

    def _admit(self) -> None:
        """Move queued requests into free slots and prefill them."""
        free = self._free_slots()
        if not free or not self.queue:
            return
        # KV-capacity admission check: reject prompts that cannot fit
        # (the reference raises on overflow, kv_cache.py:174-188; a
        # server must not silently drop the prompt head — round-1
        # ADVICE). max_seq_len - 1 leaves room for >=1 decoded token.
        cap = self.engine.ecfg.max_seq_len - 1
        joining: List[tuple] = []
        while free and self.queue:
            req = self.queue.pop(0)
            if len(req.prompt) > cap:
                req.done = True
                req.error = (f"prompt length {len(req.prompt)} exceeds "
                             f"KV capacity {cap}")
                self.finished.append(req)
                continue
            slot = free.pop(0)
            self.slots[slot] = req
            joining.append((slot, req))
        if not joining:
            return
        b = self.engine.ecfg.max_batch
        tmax = _bucket(max(len(r.prompt) for _, r in joining))
        tmax = min(tmax, self.engine.ecfg.max_seq_len)
        toks = np.zeros((b, tmax), np.int32)
        lens = np.zeros((b,), np.int32)
        for slot, req in joining:
            p = req.prompt
            toks[slot, :len(p)] = p
            lens[slot] = len(p)
        # Prefill only joining slots (len-0 rows are inert: their
        # appends are masked and their logits unused). seq_lens of
        # running slots must survive — engine.prefill takes max().
        logits, self.state = self.engine.prefill(
            self.state, jnp.asarray(toks), jnp.asarray(lens))
        first = np.asarray(jnp.argmax(logits, -1), np.int32)
        for slot, req in joining:
            self.next_token[slot] = first[slot]

    # -- stepping -----------------------------------------------------------

    def _retire(self, slot: int) -> None:
        req = self.slots[slot]
        req.done = True
        self.finished.append(req)
        self.slots[slot] = None

    def step(self) -> List[Request]:
        """Admit + one decode step. Returns requests finished in this
        step."""
        before = len(self.finished)
        self._admit()
        active_slots = [i for i, s in enumerate(self.slots)
                        if s is not None]
        if not active_slots:
            return self.finished[before:]
        # record the token produced by the previous step (or prefill)
        for i in active_slots:
            req = self.slots[i]
            tok = int(self.next_token[i])
            if req.eos_id is not None and tok == req.eos_id:
                self._retire(i)
                continue
            req.output.append(tok)
            if len(req.output) >= req.max_new_tokens:
                self._retire(i)
        # KV capacity guard: retire any sequence about to overflow its
        # page range (reference kv_cache.py:174-188 raises instead;
        # retiring keeps the batch serving)
        _, _, seq_lens = self.state
        lens_np = np.asarray(seq_lens)
        for i in list(range(len(self.slots))):
            if (self.slots[i] is not None
                    and lens_np[i] >= self.engine.ecfg.max_seq_len - 1):
                self._retire(i)
        active = np.asarray([s is not None for s in self.slots])
        if active.any():
            logits, self.state = self.engine.decode_step(
                self.state, jnp.asarray(self.next_token),
                jnp.asarray(active))
            nxt = np.asarray(jnp.argmax(logits, -1), np.int32)
            self.next_token = np.where(active, nxt, self.next_token)
        return self.finished[before:]

    def run(self) -> List[Request]:
        """Drain queue + slots to completion."""
        while self.queue or any(s is not None for s in self.slots):
            self.step()
        return self.finished
