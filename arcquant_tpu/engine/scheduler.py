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
  - With EngineConfig.dynamic_pages, a host-side PageAllocator
    free-lists the pool: prompt pages are mapped at admission, decode
    growth maps one page at a time, retirement frees, and requests
    QUEUE when the pool is exhausted (admission) or preempt the
    youngest running sequence (growth). The page table is host state
    (tiny [B, pps] i32), pushed to the device on change; the device
    arrays never see allocation logic, so both engine steps stay
    jitted exactly as in static mode.
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
    # per-request sampling (engine/sampling.py): 0 = greedy; top_k is
    # batcher-level (static — it shapes the jitted sampler)
    temperature: float = 0.0
    top_p: float = 1.0
    # stop token SEQUENCES: generation ends when the output ends with
    # any of them; the stop suffix itself is trimmed (OpenAI/vLLM
    # convention). Host-side bookkeeping — works in spec mode too.
    stop: Optional[List[List[int]]] = None
    # additive per-token logit bias {token_id: bias} applied on
    # device before sampling; -100-ish bans a token (OpenAI semantics)
    logit_bias: Optional[dict] = None
    # eos is suppressed (logit -inf) until this many tokens exist
    min_new_tokens: int = 0
    # OpenAI-style repetition controls, recomputed from the output
    # every step: logits[tok] -= presence + frequency * count(tok)
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # per-request sampling seed: row keys derive from (seed, tokens
    # generated so far), making this request's sampled stream
    # reproducible REGARDLESS of batch composition (None = draw from
    # the batcher's shared stream)
    seed: Optional[int] = None
    # serving metrics (wall-clock, filled by the batcher): admission,
    # first token, completion; preemption count (a preempted request's
    # t_done - t_first includes requeue + re-prefill time, so decode-
    # rate aggregates skip it)
    t_submit: Optional[float] = None
    t_first: Optional[float] = None
    t_done: Optional[float] = None
    preempts: int = 0
    # cooperative cancellation: set (e.g. on client disconnect) and
    # the batcher retires the request at its next step, freeing the
    # slot and its pages
    cancelled: bool = False

    def tokens_so_far(self) -> List[int]:
        """Prompt + everything generated; what a (re-)prefill replays.
        `.prompt` is never mutated — `.output` alone is the
        authoritative generation (survives preemption cycles)."""
        return list(self.prompt) + list(self.output)


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class PageAllocator:
    """Refcounted free-list allocator over the KV page pool (page 0 =
    reserved scatter sink). Fulfils the promise in cache/paged.py:
    allocation, free lists, and per-request page lists live here,
    host-side.

    Prefix sharing (round-2 VERDICT missing #6): immutable full-page
    prompt prefixes register under a chain key (hash of ALL tokens up
    to the page end — K/V at position i depends on the whole prefix);
    `lookup_shared` + `share` bump a page's refcount instead of
    copying it. Released pages whose refcount hits 0 stay CACHED
    (content intact, reusable) and are evicted FIFO only under pool
    pressure — vLLM-style prefix caching, beyond the reference."""

    def __init__(self, num_pages: int):
        self.capacity = num_pages - 1    # page 0 is the sink
        self.free: List[int] = list(range(num_pages - 1, 0, -1))
        self.owned: dict = {}            # slot -> [page ids]
        self.ref: dict = {}              # page -> refcount
        self.cached: dict = {}           # chain key -> page (FIFO)
        self.page_key: dict = {}         # page -> chain key

    def available(self) -> int:
        """Pages allocatable right now: free + evictable cached."""
        evictable = sum(1 for p in self.page_key
                        if self.ref.get(p, 0) == 0)
        return len(self.free) + evictable

    def _evict_one(self) -> Optional[int]:
        for key, page in list(self.cached.items()):
            if self.ref.get(page, 0) == 0:
                del self.cached[key]
                del self.page_key[page]
                self.ref.pop(page, None)
                return page
        return None

    def alloc(self, slot: int, n: int) -> Optional[List[int]]:
        """Map n more pages to `slot`; None (and no change) if the
        pool cannot satisfy the request (after evicting unreferenced
        cached pages)."""
        if n > self.available():
            return None
        got: List[int] = []
        while len(got) < n:
            if self.free:
                got.append(self.free.pop())
            else:
                got.append(self._evict_one())
        for p in got:
            self.ref[p] = 1
        self.owned.setdefault(slot, []).extend(got)
        return got

    def lookup_shared(self, key) -> Optional[int]:
        return self.cached.get(key)

    def share(self, slot: int, page: int) -> None:
        """Map an existing cached page into `slot` (refcount +1)."""
        self.ref[page] = self.ref.get(page, 0) + 1
        self.owned.setdefault(slot, []).append(page)

    def register(self, key, page: int) -> None:
        """Publish an immutable full prompt page for future sharing."""
        if key not in self.cached and page not in self.page_key:
            self.cached[key] = page
            self.page_key[page] = key

    def release(self, slot: int) -> None:
        for p in reversed(self.owned.pop(slot, [])):
            rc = self.ref.get(p, 1) - 1
            if rc > 0:
                self.ref[p] = rc
            else:
                self.ref.pop(p, None)
                if p not in self.page_key:
                    self.free.append(p)
                # else: stays cached (evictable) for future sharing


class ContinuousBatcher:
    """Admits requests into engine slots and steps the batch."""

    def __init__(self, engine: InferenceEngine, top_k: int = 0,
                 seed: int = 0, spec_window: int = 0, drafter=None,
                 decode_burst: int = 0):
        self.engine = engine
        self.state = engine.new_state()
        e = engine.ecfg
        b = e.max_batch
        self.slots: List[Optional[Request]] = [None] * b
        self.next_token = np.zeros((b,), np.int32)
        self.queue: List[Request] = []
        self.finished: List[Request] = []
        self.top_k = top_k
        import jax
        self._rng = jax.random.PRNGKey(seed)
        self._sample_jit: dict = {}      # bias-width bucket -> jit
        self._spec_sample_jit = None     # stochastic spec verify
        self._pen_counts: List[Optional[dict]] = [None] * b
        # spec_window >= 2: decode via greedy SPECULATIVE verify
        # rounds (engine.verify_step) — each step commits 1..W tokens
        # per slot; drafter needs a draft(seq, k) -> k tokens method
        self.spec_window = spec_window
        if spec_window:
            if spec_window < 2:
                raise ValueError("spec_window must be >= 2")
            if drafter is None:
                from .spec import NgramDrafter
                drafter = NgramDrafter()
            self.spec_stats = {"rounds": 0, "proposed": 0,
                               "accepted": 0}
        self.drafter = drafter
        # decode_burst > 1: when the queue is empty and every active
        # request is greedy (no bias/min-tokens), decode N tokens per
        # step() via the on-device decode_scan — ONE host dispatch
        # per N tokens (vLLM multi-step scheduling analog; through a
        # ~30 ms host<->device tunnel this is the dominant serving-
        # throughput lever). Rows retiring mid-burst (eos/stop/
        # max_new) drop their tail tokens; the tail K/V is stale-
        # overwritten (same absolute-position-append invariant as
        # speculative rollback). Exclusive with spec_window.
        self.decode_burst = decode_burst
        if decode_burst and spec_window:
            raise ValueError("decode_burst and spec_window are "
                             "exclusive decode strategies")
        self.allocs: Optional[List[PageAllocator]] = None
        self._stamp = itertools.count()     # admission order
        self._admitted_at: dict = {}        # slot -> stamp
        if e.dynamic_pages:
            # dp-sharded engines expose independent page-pool groups
            # (one per dp shard: local page ids, local free lists);
            # the single-chip engine is the 1-group case
            ngroups, pages_per_group, self._slots_per_group = \
                engine.page_groups()
            self.allocs = [PageAllocator(pages_per_group)
                           for _ in range(ngroups)]
            self._pt = np.zeros((b, e.pages_per_seq), np.int32)
            self._pt_dirty = False

    @property
    def alloc(self) -> Optional[PageAllocator]:
        """The single allocator (dp=1 engines); None in grouped mode."""
        if self.allocs is not None and len(self.allocs) == 1:
            return self.allocs[0]
        return None

    def _galloc(self, slot: int) -> PageAllocator:
        return self.allocs[slot // self._slots_per_group]

    # -- admission ----------------------------------------------------------

    def submit(self, req: Request) -> None:
        if self.spec_window and (req.logit_bias or req.min_new_tokens
                                 or req.presence_penalty
                                 or req.frequency_penalty
                                 or req.seed is not None):
            # sampled requests ARE supported (stochastic speculative
            # sampling, spec.sample_verify); bias/min-tokens would
            # need per-POSITION logit edits inside the verify window
            raise ValueError(
                "logit_bias / min_new_tokens / repetition penalties "
                "/ per-request seeds are not supported with "
                "speculative batching (spec_window=0 supports them)")
        import time
        req.t_submit = time.perf_counter()
        self.queue.append(req)

    def _free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self.slots) if s is None]

    def _bias_entries(self):
        """Per-slot (token, bias) pairs: request logit_bias plus the
        min_new_tokens eos suppression (eos is -inf-banned until the
        output can reach min_new_tokens)."""
        entries = []
        for i, s in enumerate(self.slots):
            e = []
            if s is not None:
                if s.logit_bias:
                    e += [(int(t), float(v))
                          for t, v in s.logit_bias.items()]
                # a token sampled now is recorded on top of the
                # CURRENT output (the previous pending token is
                # already in it), so eos stays banned while
                # len(output) < min (an eos retire never appends)
                if (s.eos_id is not None and s.min_new_tokens
                        and len(s.output) < s.min_new_tokens):
                    e.append((int(s.eos_id), -1e9))
                if s.presence_penalty or s.frequency_penalty:
                    counts = self._pen_counts[i] or {}
                    e += [(int(t), -(s.presence_penalty
                                     + s.frequency_penalty * c))
                          for t, c in counts.items()]
            entries.append(e)
        return entries

    def _sample_rows(self, logits) -> np.ndarray:
        """Per-REQUEST sampling over a [B, V] logits batch: each
        slot's temperature/top_p/logit-bias ride as traced per-row
        data (compiles per bias-width BUCKET only); batches with no
        sampling and no bias skip the sampler."""
        temps = np.asarray([s.temperature if s else 0.0
                            for s in self.slots], np.float32)
        entries = self._bias_entries()
        m = max(len(e) for e in entries)
        if not temps.any() and m == 0:
            return np.asarray(jnp.argmax(logits, -1), np.int32)
        import jax
        b = len(self.slots)
        tps = np.asarray([s.top_p if s else 1.0
                          for s in self.slots], np.float32)
        mb = 1
        while mb < m:
            mb *= 2
        bt = np.full((b, mb), -1, np.int32)
        bv = np.zeros((b, mb), np.float32)
        for i, e in enumerate(entries):
            for j, (t, v) in enumerate(e):
                bt[i, j], bv[i, j] = t, v
        has_seed = np.asarray([s is not None and s.seed is not None
                               for s in self.slots])
        seeds = np.asarray([s.seed if (s and s.seed is not None)
                            else 0 for s in self.slots], np.int32)
        steps = np.asarray([len(s.output) if s else 0
                            for s in self.slots], np.int32)
        if mb not in self._sample_jit:
            from .sampling import sample_with_keys
            tk = self.top_k

            def f(lg, k, t, p, bt, bv, hs, sd, st):
                rows = jnp.arange(lg.shape[0])
                safe = jnp.where(bt >= 0, bt, 0)
                add = jnp.where(bt >= 0, bv, 0.0)
                lg = lg.at[rows[:, None], safe].add(add)
                # per-row keys: seeded rows derive from (seed, step)
                # — batch-composition-independent; the rest fold the
                # row index into the batcher's stream
                kb = jax.vmap(lambda i: jax.random.fold_in(k, i))(
                    rows)
                ks = jax.vmap(lambda s_, t_: jax.random.fold_in(
                    jax.random.PRNGKey(s_), t_))(sd, st)
                keys = jnp.where(hs[:, None], ks, kb)
                return sample_with_keys(lg, keys, t, tk, p)
            self._sample_jit[mb] = jax.jit(f)
        self._rng, sk = jax.random.split(self._rng)
        return np.asarray(self._sample_jit[mb](
            logits, sk, jnp.asarray(temps), jnp.asarray(tps),
            jnp.asarray(bt), jnp.asarray(bv),
            jnp.asarray(has_seed), jnp.asarray(seeds),
            jnp.asarray(steps)), np.int32)

    def _map_pages(self, slot: int, pages: List[int]) -> None:
        """Record newly allocated pages in the host page table."""
        row = self._pt[slot]
        used = int(np.count_nonzero(row))
        row[used:used + len(pages)] = pages
        self._pt_dirty = True

    def _set_pages(self, slot: int, pages: List[int]) -> None:
        """Replace a slot's page row (admission with shared prefix)."""
        self._pt[slot] = 0
        self._pt[slot, :len(pages)] = pages
        self._pt_dirty = True

    @staticmethod
    def _chain_keys(tokens: List[int], ps: int) -> List[str]:
        """Prefix-chain keys, one per FULL page: key j digests ALL
        tokens up to the page end (K/V at position i depends on the
        entire prefix, so pages only match when the whole prefix
        does)."""
        import hashlib
        h = hashlib.sha1()
        keys = []
        for j in range(len(tokens) // ps):
            h.update(np.asarray(tokens[j * ps:(j + 1) * ps],
                                np.int64).tobytes())
            keys.append(h.hexdigest())
        return keys

    def _push_pt(self) -> None:
        if self.allocs is not None and self._pt_dirty:
            cache, _, seq_lens = self.state
            self.state = (cache, jnp.asarray(self._pt), seq_lens)
            self._pt_dirty = False

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
        ps = self.engine.ecfg.page_size
        joining: List[tuple] = []
        while free and self.queue:
            req = self.queue.pop(0)
            # a preempted request replays prompt + prior output
            nprefill = len(req.tokens_so_far())
            need = -(-(nprefill + 1) // ps)
            if nprefill > cap or (
                    self.allocs is not None
                    and need > self.allocs[0].capacity):
                req.done = True
                req.error = (f"prompt length {nprefill} exceeds "
                             f"KV capacity")
                self.finished.append(req)
                continue
            slot = free[0]
            start = 0
            if self.allocs is not None:
                # prompt pages + the first decode token's page; a
                # slot's pages come from ITS dp group's pool — try
                # other free slots (other groups) before giving up.
                # With prefix_sharing, reuse each group's cached
                # prefix pages (refcount++) and allocate only the
                # suffix + growth pages.
                sharing = self.engine.ecfg.prefix_sharing
                keys = (self._chain_keys(req.tokens_so_far(), ps)
                        if sharing else [])
                max_share = (nprefill - 1) // ps
                placed = False
                for cand in free:
                    ga = self._galloc(cand)
                    nshared = 0
                    for j in range(max_share):
                        pg = ga.lookup_shared(keys[j]) \
                            if j < len(keys) else None
                        if pg is None:
                            break
                        ga.share(cand, pg)   # protects from eviction
                        nshared += 1
                    pages = ga.alloc(cand, need - nshared)
                    if pages is None:
                        ga.release(cand)     # undo the shares
                        continue
                    slot = cand
                    start = nshared * ps
                    self._set_pages(slot, ga.owned[slot])
                    placed = True
                    break
                if not placed:
                    # every group exhausted: requeue, stop (FIFO)
                    self.queue.insert(0, req)
                    break
            free.remove(slot)
            self.slots[slot] = req
            self._admitted_at[slot] = next(self._stamp)
            if req.presence_penalty or req.frequency_penalty:
                # incremental occurrence counts (O(1) per token in
                # _record_token; re-seeded from output on re-admission
                # after preemption)
                c: dict = {}
                for tk in req.output:
                    c[tk] = c.get(tk, 0) + 1
                self._pen_counts[slot] = c
            else:
                self._pen_counts[slot] = None
            joining.append((slot, req, start))
        if not joining:
            return
        b = self.engine.ecfg.max_batch
        # rows carry only each request's SUFFIX (prefix sharing skips
        # the shared pages' forward entirely); lens stay ABSOLUTE
        tmax = _bucket(max(len(r.tokens_so_far()) - s
                           for _, r, s in joining))
        tmax = min(tmax, self.engine.ecfg.max_seq_len)
        toks = np.zeros((b, tmax), np.int32)
        lens = np.zeros((b,), np.int32)
        starts = np.zeros((b,), np.int32)
        for slot, req, start in joining:
            p = req.tokens_so_far()
            toks[slot, :len(p) - start] = p[start:]
            lens[slot] = len(p)
            starts[slot] = start
        # Prefill only joining slots (len-0 rows are inert: their
        # appends are masked and their logits unused). seq_lens of
        # running slots must survive — engine.prefill takes max().
        self._push_pt()
        logits, self.state = self.engine.prefill(
            self.state, jnp.asarray(toks), jnp.asarray(lens),
            starts=jnp.asarray(starts) if starts.any() else None)
        first = self._sample_rows(logits)
        import time
        now = time.perf_counter()
        for slot, req, start in joining:
            self.next_token[slot] = first[slot]
            if req.t_first is None:     # preserved across preemption
                req.t_first = now
            if self.engine.ecfg.prefix_sharing:
                # publish this request's fresh IMMUTABLE full pages
                # (decode appends land at >= nprefill, never in them)
                p = req.tokens_so_far()
                keys = self._chain_keys(p, self.engine.ecfg.page_size)
                ga = self._galloc(slot)
                ps = self.engine.ecfg.page_size
                for j in range(start // ps, len(p) // ps):
                    ga.register(keys[j], int(self._pt[slot, j]))

    # -- stepping -----------------------------------------------------------

    def _release_slot(self, slot: int) -> None:
        if self.allocs is not None:
            self._galloc(slot).release(slot)
            self._pt[slot] = 0
            self._pt_dirty = True
        self.slots[slot] = None
        self._admitted_at.pop(slot, None)
        self._pen_counts[slot] = None

    def _retire(self, slot: int) -> None:
        import time
        req = self.slots[slot]
        req.done = True
        req.t_done = time.perf_counter()
        self.finished.append(req)
        self._release_slot(slot)

    def _record_token(self, i: int, tok: int) -> bool:
        """Record one produced token for slot i (eos / stop-sequence /
        max_new_tokens bookkeeping). Returns True while the slot
        keeps running."""
        req = self.slots[i]
        if req.eos_id is not None and tok == req.eos_id:
            self._retire(i)
            return False
        req.output.append(tok)
        c = self._pen_counts[i]
        if c is not None:
            c[tok] = c.get(tok, 0) + 1
        if self._hit_stop(req) or len(req.output) >= req.max_new_tokens:
            self._retire(i)
            return False
        return True

    @staticmethod
    def _hit_stop(req: Request) -> bool:
        """True when output ends with one of the request's stop
        sequences; the stop suffix is trimmed from the output."""
        if not req.stop:
            return False
        out = req.output
        for s in req.stop:
            n = len(s)
            if n and len(out) >= n and out[-n:] == list(s):
                del out[len(out) - n:]
                return True
        return False

    def _preempt(self, slot: int) -> None:
        """Pool exhausted mid-decode: free this sequence's pages and
        requeue it (re-prefills prompt + output when pages free up;
        `.prompt` stays immutable — see Request.tokens_so_far)."""
        req = self.slots[slot]
        req.preempts += 1
        self._release_slot(slot)
        self.queue.insert(0, req)

    def _youngest(self, group: int) -> int:
        """Running slot in `group` admitted most recently — the
        preemption victim (minimises wasted re-prefill work vs
        evicting the oldest)."""
        pool = {s: t for s, t in self._admitted_at.items()
                if s // self._slots_per_group == group}
        return max(pool, key=pool.get)

    def _grow_pages(self, ahead: int = 1) -> None:
        """Dynamic mode: before a decode step, every active slot must
        have pages mapped for append positions seq_len .. seq_len +
        ahead - 1 (ahead = 1 for plain decode; a spec verify round
        appends up to spec_window tokens, committed or not); allocate
        on demand, preempting the YOUNGEST running sequence on pool
        exhaustion (not whichever slot happened to need the page)."""
        if self.allocs is None:
            return
        ps = self.engine.ecfg.page_size
        pps = self.engine.ecfg.pages_per_seq
        _, _, seq_lens = self.state
        lens_np = np.asarray(seq_lens)
        for i, req in enumerate(self.slots):
            if req is None:
                continue
            have = int(np.count_nonzero(self._pt[i]))
            need = min((int(lens_np[i]) + ahead - 1) // ps + 1, pps)
            while have < need and self.slots[i] is not None:
                pages = self._galloc(i).alloc(i, 1)
                if pages is not None:
                    self._map_pages(i, pages)
                    have += 1
                    continue
                victim = self._youngest(i // self._slots_per_group)
                self._preempt(victim)
                if victim == i:
                    break           # evicted the requester itself

    def step(self) -> List[Request]:
        """Admit + one decode step. Returns requests finished in this
        step."""
        before = len(self.finished)
        # cooperative cancellation: drop queued, retire running
        for r in [r for r in self.queue if r.cancelled]:
            self.queue.remove(r)
            r.done = True
            r.error = r.error or "cancelled"
            self.finished.append(r)
        for i, s in enumerate(self.slots):
            if s is not None and s.cancelled:
                s.error = s.error or "cancelled"
                self._retire(i)
        self._admit()
        active_slots = [i for i, s in enumerate(self.slots)
                        if s is not None]
        if not active_slots:
            return self.finished[before:]
        # record the token produced by the previous step (or prefill)
        for i in active_slots:
            self._record_token(i, int(self.next_token[i]))
        # KV capacity guard: retire any sequence about to overflow its
        # page range (reference kv_cache.py:174-188 raises instead;
        # retiring keeps the batch serving). Spec mode needs headroom
        # for a full verify window's appends (committed or not).
        w = self.spec_window or 1
        _, _, seq_lens = self.state
        lens_np = np.asarray(seq_lens)
        for i in list(range(len(self.slots))):
            if (self.slots[i] is not None
                    and lens_np[i] >= self.engine.ecfg.max_seq_len - w):
                self._retire(i)
        bn = 0 if self.spec_window else self._burst_size()
        self._grow_pages(ahead=max(w, bn or 1))
        if bn and self.queue:
            # growth preempted someone: admission first, burst later
            bn = 0
        active = np.asarray([s is not None for s in self.slots])
        if active.any():
            self._push_pt()
            if self.spec_window:
                self._spec_round(active)
            elif bn:
                toks, self.state = self.engine.decode_scan(
                    self.state, jnp.asarray(self.next_token),
                    jnp.asarray(active), bn)
                toks = np.asarray(toks)
                alive = active.copy()
                # replay the per-step bookkeeping for the first bn-1
                # tokens; the last stays pending (recorded at the
                # next step's start, exactly like per-step decode)
                for j in range(bn - 1):
                    for i in range(len(self.slots)):
                        if alive[i] and self.slots[i] is not None:
                            if not self._record_token(
                                    i, int(toks[i, j])):
                                alive[i] = False
                self.next_token = np.where(
                    alive, toks[:, bn - 1],
                    self.next_token).astype(np.int32)
            else:
                logits, self.state = self.engine.decode_step(
                    self.state, jnp.asarray(self.next_token),
                    jnp.asarray(active))
                nxt = self._sample_rows(logits)
                self.next_token = np.where(active, nxt,
                                           self.next_token)
        return self.finished[before:]

    def _burst_size(self) -> int:
        """Burst length for this step, or 0 to decode per-step: burst
        only with an empty queue (admission must not wait N tokens),
        all-greedy bias-free requests, KV headroom for the whole
        burst on every running row, and — in dynamic-page mode —
        enough ALLOCATABLE pages that provisioning the burst never
        preempts anyone (a per-step decode would not have)."""
        n = self.decode_burst
        if not n or self.queue:
            return 0
        lens_np = None
        ps = self.engine.ecfg.page_size
        extra: dict = {}
        for i, s in enumerate(self.slots):
            if s is None:
                continue
            if (s.temperature > 0 or s.logit_bias or s.min_new_tokens
                    or s.presence_penalty or s.frequency_penalty):
                return 0
            if lens_np is None:
                lens_np = np.asarray(self.state[2])
            if lens_np[i] + n + 1 > self.engine.ecfg.max_seq_len:
                return 0
            if self.allocs is not None:
                have = int(np.count_nonzero(self._pt[i]))
                need = (int(lens_np[i]) + n - 1) // ps + 1 - have
                if need > 0:
                    g = i // self._slots_per_group
                    extra[g] = extra.get(g, 0) + need
        for g, e in extra.items():
            if e > self.allocs[g].available():
                return 0
        return n if lens_np is not None else 0

    def _spec_round(self, active: np.ndarray) -> None:
        """One speculative verify round: draft spec_window-1 tokens
        per active slot (prompt-lookup over prompt+output), verify all
        in ONE multi-token engine step, commit the accepted prefix +
        bonus. Emits the accepted drafts into each request's output
        immediately; the bonus token becomes the pending next_token
        (recorded at the next step's start, exactly like plain
        decode)."""
        w, k = self.spec_window, self.spec_window - 1
        b = self.engine.ecfg.max_batch
        cur = self.next_token
        drafts = np.zeros((b, k), np.int32)
        for i, req in enumerate(self.slots):
            if req is None:
                continue
            # step() already recorded the pending token into
            # req.output, so tokens_so_far() ENDS with cur[i] —
            # appending it again would corrupt the suffix n-gram
            drafts[i] = self.drafter.draft(req.tokens_so_far(), k)
        toksw = np.concatenate([cur[:, None].astype(np.int32),
                                drafts], axis=1)
        valid = np.where(active, w, 1).astype(np.int32)
        logits, self.state = self.engine.verify_step(
            self.state, jnp.asarray(toksw), jnp.asarray(valid))
        temps = np.asarray([s.temperature if s else 0.0
                            for s in self.slots], np.float32)
        if temps.any():
            # per-request stochastic speculative sampling: one
            # vectorized verify; temperature-0 rows degenerate to the
            # greedy comparator exactly (sample_verify docstring)
            import jax
            if self._spec_sample_jit is None:
                from .spec import sample_verify
                tk = self.top_k
                self._spec_sample_jit = jax.jit(
                    lambda lg, d, kk, t, p: sample_verify(
                        lg, d, kk, temperature=t, top_k=tk, top_p=p))
            tps = np.asarray([s.top_p if s else 1.0
                              for s in self.slots], np.float32)
            self._rng, sk = jax.random.split(self._rng)
            n_d, g_d = self._spec_sample_jit(
                logits, jnp.asarray(drafts), sk, jnp.asarray(temps),
                jnp.asarray(tps))
            n_all = np.asarray(n_d)
            g = np.asarray(g_d, np.int32)
        else:
            n_all = None
            g = np.asarray(jnp.argmax(logits, -1), np.int32)
        cache, pt, seq_lens = self.state
        commit = np.zeros((b,), np.int32)
        for i in range(b):
            req = self.slots[i]
            if req is None or not active[i]:
                continue
            if n_all is not None:
                n = int(n_all[i])
            else:
                n = 0
                while n < k and toksw[i, n + 1] == g[i, n]:
                    n += 1
            commit[i] = n + 1
            self.spec_stats["proposed"] += k
            self.spec_stats["accepted"] += n
            # accepted drafts are final now; the bonus g[i, n] waits
            # as the pending token
            for j in range(n):
                if not self._record_token(i, int(g[i, j])):
                    break
            self.next_token[i] = g[i, n]
        self.spec_stats["rounds"] += 1
        self.state = (cache, pt, seq_lens + jnp.asarray(commit))

    def run(self) -> List[Request]:
        """Drain queue + slots to completion."""
        while self.queue or any(s is not None for s in self.slots):
            self.step()
        return self.finished
