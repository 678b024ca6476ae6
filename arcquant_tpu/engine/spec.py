"""Greedy speculative decoding over the paged int4 engine.

Beyond the reference (its decode loop is strictly one token per step,
benchmarks/modeling_arc.py:436 / benchmark_e2e_arc.py): speculative
decoding verifies W tokens per target forward, raising the decode
GEMM M-dim from B to B*W — the single biggest lever on a
weight-bandwidth-bound decode (the W4 weights are read ONCE per W
tokens). Greedy acceptance keeps the output token-identical to plain
greedy decode (tests/test_spec.py pins this).

TPU-shaped design:
  - verify = the paged flash-prefill chunk step (engine.verify_step):
    one jitted multi-token forward whose per-row origin is traced
    data, attending directly over the int4 pool — no new kernel.
  - KV rollback is FREE: appends address absolute positions, so a
    rejected draft's K/V is simply overwritten by the next round's
    appends and never attended (seq_lens masks every kernel read).
    The same trick rolls back the draft model's cache — its seq_lens
    is host-side metadata, reset per round.
  - the draft loop is one verify_step (catch-up) + one decode_scan
    (on-device lax.scan) per round, not W host round-trips.

Token-identity caveat: it requires per-ROW activation scales (the
engine default) — a token's quantization grid is then independent of
what else shares the forward. Under a TENSOR act scale the W verify
tokens share one scale, so spec decode is approximate there (same
class of deviation as chunked-vs-one-shot prefill).

Two drafters:
  - NgramDrafter: prompt-lookup decoding (match the context's last
    n-gram against itself, propose the continuation) — zero extra
    FLOPs/weights, wins on repetitive text.
  - EngineDrafter: any smaller InferenceEngine (e.g. fewer layers, or
    a W4 version of a larger bf16 target) drafts autoregressively.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .engine import InferenceEngine


class NgramDrafter:
    """Prompt-lookup drafting: the longest suffix n-gram (n ≤
    max_ngram) of each row's context that re-occurs earlier proposes
    the k tokens that followed its most recent earlier occurrence.
    Host-side, model-free; wrong drafts cost nothing extra (the
    verify width is static)."""

    def __init__(self, max_ngram: int = 4):
        self.max_ngram = max_ngram
        self.ctx: List[List[int]] = []

    def begin(self, prompts: Sequence[Sequence[int]], max_batch: int):
        self.ctx = [list(p) for p in prompts]
        self.ctx += [[] for _ in range(max_batch - len(self.ctx))]

    def draft(self, seq, k: int) -> List[int]:
        """k draft tokens continuing `seq` (stateless helper — also
        the ContinuousBatcher spec-mode entry point; runs every
        decode round, so the match is numpy-vectorized)."""
        out = [int(seq[-1])] * k         # fallback: repeat last token
        hit = self._match(np.asarray(seq, np.int64))
        if hit is not None:
            got = [int(t) for t in seq[hit:hit + k]]
            out[:len(got)] = got
        return out

    def propose(self, cur: np.ndarray, k: int,
                active: np.ndarray) -> np.ndarray:
        out = np.zeros((len(self.ctx), k), np.int32)
        for b, c in enumerate(self.ctx):
            if not active[b]:
                continue
            out[b, :] = self.draft(c + [int(cur[b])], k)
        return out

    def _match(self, seq: np.ndarray) -> Optional[int]:
        """Index just past the most recent earlier occurrence of the
        longest matching suffix n-gram, or None. Vectorized: O(n·L)
        numpy compares per n, no Python-level window scan."""
        L = len(seq)
        for n in range(min(self.max_ngram, L - 1), 0, -1):
            pat = seq[L - n:]
            ok = np.ones(L - n, bool)    # starts 0..L-n-1 (not the
            for j in range(n):           # suffix itself)
                ok &= seq[j:L - n + j] == pat[j]
            hits = np.flatnonzero(ok)
            if hits.size:
                return int(hits[-1]) + n
        return None

    def commit(self, committed: List[List[int]], accepted: np.ndarray,
               new_lens: np.ndarray, active: np.ndarray):
        for b, toks in enumerate(committed):
            self.ctx[b].extend(toks)


class EngineDrafter:
    """Draft-model drafting over a second InferenceEngine.

    Cache-coherence invariant (per row, at round start): the draft
    cache's committed prefix equals the target's committed tokens,
    except possibly the LAST one (when every draft was accepted the
    final draft token's K/V never entered the draft cache) — that
    token rides `self._catchup` and is fed through the draft's
    verify_step next round. Rollback after partial acceptance is a
    host-side seq_lens reset (absolute-position appends make stale
    K/V harmless, engine.verify_step docstring)."""

    def __init__(self, engine: InferenceEngine):
        if engine.ecfg.dynamic_pages:
            raise ValueError("EngineDrafter needs a static page "
                             "layout (it manages no allocator)")
        self.eng = engine
        self.state = None
        self._catchup: Optional[np.ndarray] = None
        self._drafts: Optional[np.ndarray] = None

    def begin(self, prompts: Sequence[Sequence[int]], max_batch: int):
        e = self.eng.ecfg
        assert max_batch <= e.max_batch
        toks, lens, _ = self.eng._pad_prompts(list(prompts))
        state = self.eng.new_state()
        _, self.state = self.eng.prefill(state, jnp.asarray(toks),
                                         jnp.asarray(lens))
        self._catchup = np.full((e.max_batch,), -1, np.int32)

    def propose(self, cur: np.ndarray, k: int,
                active: np.ndarray) -> np.ndarray:
        cache, pt, dlens = self.state
        catch = self._catchup
        # catch-up + first draft in ONE ragged verify step: rows with
        # a pending token feed [catchup, cur], the rest [cur, pad]
        col0 = np.where(catch >= 0, catch, cur).astype(np.int32)
        col1 = np.where(catch >= 0, cur, 0).astype(np.int32)
        valid = np.where(catch >= 0, 2, 1).astype(np.int32)
        toks2 = np.stack([col0, col1], axis=1)
        logits, (cache, pt, dlens) = self.eng.verify_step(
            (cache, pt, dlens), jnp.asarray(toks2), jnp.asarray(valid))
        # verify_step leaves seq_lens alone; the fed tokens (catchup +
        # cur) are all known-good here, commit them now
        dlens = dlens + jnp.asarray(valid)
        last = jnp.take_along_axis(
            logits, jnp.asarray(valid - 1)[:, None, None], axis=1
        )[:, 0]
        d1 = jnp.argmax(last, -1).astype(jnp.int32)
        if k > 1:
            rest, (cache, pt, dlens) = self.eng.decode_scan(
                (cache, pt, dlens), d1, jnp.asarray(active),
                num_steps=k - 1)
            drafts = np.concatenate(
                [np.asarray(d1)[:, None], np.asarray(rest)], axis=1)
        else:
            drafts = np.asarray(d1)[:, None]
        self.state = (cache, pt, dlens)
        self._drafts = drafts
        return drafts

    def commit(self, committed: List[List[int]], accepted: np.ndarray,
               new_lens: np.ndarray, active: np.ndarray):
        cache, pt, dlens = self.state
        k = self._drafts.shape[1]
        full = accepted >= k          # every draft accepted
        self._catchup = np.where(
            active & full, self._drafts[:, k - 1], -1).astype(np.int32)
        want = np.where(full, new_lens - 1, new_lens)
        dl = np.where(active, want, np.asarray(dlens)).astype(np.int32)
        self.state = (cache, pt, jnp.asarray(dl))


def sample_verify(logits: jax.Array, drafts: jax.Array,
                  key: jax.Array, params=None, temperature=1.0,
                  top_k: int = 0, top_p=1.0) -> tuple:
    """Stochastic speculative verify for a DETERMINISTIC proposal
    (both drafters here are deterministic given the context: n-gram
    lookup, greedy draft model), per Leviathan et al. 2023 adapted to
    a point-mass q: accept draft d_i with probability p_{i-1}(d_i)
    under the WARPED target distribution (sampling.warp_logits — the
    exact distribution plain sampled decode draws from); on the first
    rejection, resample from p with the rejected token masked out
    (the (p - q)+ residual for q = delta_d); if all drafts survive,
    the bonus token is a plain sample. Every emitted token is then
    EXACTLY target-distributed (tests/test_spec.py pins the marginal
    against direct sampling).

    temperature/top_p may be per-ROW [B] arrays (per-request sampled
    speculative batching). Temperature-0 rows take the EXACT greedy
    comparator (raw-logit argmax acceptance + argmax final token) —
    not merely the point-mass limit of the warp, which diverges from
    argmax on exact logit ties.

    logits [B, W, V] raw verify logits; drafts [B, W-1].
    Returns (n_acc [B] i32, out_tok [B, W] i32): out_tok[:, :n_acc]
    are the accepted drafts, out_tok[:, n_acc] the resample/bonus."""
    b, w, v = logits.shape
    k = w - 1
    if params is not None:
        temperature, top_k, top_p = (params.temperature,
                                     params.top_k, params.top_p)
    t = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (b,))
    tp = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))
    from .sampling import warp_logits
    x = warp_logits(logits.reshape(b * w, v), jnp.repeat(t, w),
                    top_k, jnp.repeat(tp, w)).reshape(b, w, v)
    p = jax.nn.softmax(x, -1)
    pd = jnp.take_along_axis(p[:, :k], drafts[..., None],
                             axis=-1)[..., 0]            # [B, k]
    ku, kr = jax.random.split(key)
    u = jax.random.uniform(ku, (b, k))
    acc = (u < pd).astype(jnp.int32)
    # temperature-0 rows take the EXACT greedy comparator (argmax on
    # raw logits): the point-mass-warp argument breaks on exact logit
    # ties, where plain argmax deterministically picks the lowest
    # index but the warped p splits mass across the tied tokens
    g = jnp.argmax(logits, -1).astype(jnp.int32)         # [B, W]
    greedy_row = (t <= 0.0)[:, None]
    acc = jnp.where(greedy_row,
                    (drafts == g[:, :-1]).astype(jnp.int32), acc)
    n_acc = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)
    # final-token logits at position n_acc; a rejection masks the
    # rejected draft out (residual renormalization)
    xl = jnp.take_along_axis(x, n_acc[:, None, None], axis=1)[:, 0]
    rejected = n_acc < k
    rej_tok = jnp.take_along_axis(
        drafts, jnp.minimum(n_acc, k - 1)[:, None], axis=1)[:, 0]
    xl = jnp.where(rejected[:, None]
                   & (jnp.arange(v)[None] == rej_tok[:, None]),
                   -jnp.inf, xl)
    fin = jax.random.categorical(kr, xl).astype(jnp.int32)
    fin = jnp.where(greedy_row[:, 0],
                    jnp.take_along_axis(g, n_acc[:, None],
                                        axis=1)[:, 0], fin)
    out = jnp.concatenate(
        [drafts.astype(jnp.int32), jnp.zeros((b, 1), jnp.int32)],
        axis=1)
    out = out.at[jnp.arange(b), n_acc].set(fin)
    return n_acc.astype(jnp.int32), out


def device_ngram_draft(hist: jax.Array, hist_len: jax.Array, k: int,
                       max_ngram: int = 4) -> jax.Array:
    """Prompt-lookup drafting ON DEVICE: for each row, find the most
    recent earlier occurrence of the longest suffix n-gram of
    hist[:hist_len] and propose the k tokens that followed it
    (fallback: repeat the last token). Pure vectorized ops — shifted
    window compares over the history buffer, statically unrolled over
    n — so it runs inside a jitted decode loop.

    hist [B, H] i32 (prompt + generated tokens, right-padded);
    hist_len [B] tokens valid per row (>= 1). Returns [B, k]."""
    b, h = hist.shape
    cur = jnp.take_along_axis(hist, (hist_len - 1)[:, None], axis=1)
    best_end = jnp.full((b,), -1, jnp.int32)
    found_any = jnp.zeros((b,), bool)
    for n in range(max_ngram, 0, -1):          # longest n wins
        pidx = jnp.clip(hist_len[:, None] - n + jnp.arange(n)[None],
                        0, h - 1)
        pat = jnp.take_along_axis(hist, pidx, axis=1)      # [B, n]
        m = jnp.ones((b, h - n + 1), bool)
        for j in range(n):
            m &= hist[:, j:h - n + 1 + j] == pat[:, j:j + 1]
        s = jnp.arange(h - n + 1)[None]
        # starts strictly before the suffix occurrence itself, and
        # only when the row has >= n+1 tokens
        m &= (s < (hist_len - n)[:, None]) \
            & (hist_len[:, None] >= n + 1)
        s_best = jnp.max(jnp.where(m, s, -1), axis=1)
        take = (s_best >= 0) & ~found_any
        best_end = jnp.where(take, (s_best + n).astype(jnp.int32),
                             best_end)
        found_any |= s_best >= 0
    gidx = best_end[:, None] + jnp.arange(k)[None]
    ok = found_any[:, None] & (gidx >= 0) \
        & (gidx < hist_len[:, None])
    d = jnp.take_along_axis(hist, jnp.clip(gidx, 0, h - 1), axis=1)
    return jnp.where(ok, d, cur).astype(jnp.int32)


class SpeculativeEngine:
    """Greedy speculative decoding: token-identical to
    InferenceEngine.generate, ≥1 committed token per verify round.

    window = tokens per verify step (1 carried token + window-1
    drafts). After generate(), `self.stats` holds
    {rounds, proposed, accepted} for acceptance-rate telemetry."""

    def __init__(self, engine: InferenceEngine, drafter,
                 window: int = 4):
        if window < 2:
            raise ValueError("window must be >= 2 (1 carried token "
                             "+ >=1 draft)")
        self.eng = engine
        self.drafter = drafter
        self.window = window
        self.stats = {"rounds": 0, "proposed": 0, "accepted": 0}

    def generate(self, prompts: Sequence[Sequence[int]],
                 max_new_tokens: int,
                 eos_id: Optional[int] = None,
                 sampling=None, seed: int = 0) -> List[List[int]]:
        """Speculative decode. Greedy by default (token-identical to
        plain greedy generate); `sampling` (SamplingParams) switches
        to STOCHASTIC speculative sampling — every emitted token is
        exactly distributed as plain sampled decode's warped target
        distribution (sample_verify), the drafts only change how many
        tokens each verify round commits."""
        eng, e, w = self.eng, self.eng.ecfg, self.window
        stochastic = sampling is not None and not sampling.is_greedy
        rk = jax.random.PRNGKey(seed)
        b = len(prompts)
        toks, lens, _ = eng._pad_prompts(list(prompts))
        cap = e.pages_per_seq * e.page_size
        for i in range(b):
            # stale verify appends can land up to window-1 tokens past
            # the committed length — size for it
            if int(lens[i]) + max_new_tokens + w > cap:
                raise ValueError(
                    f"prompt {i}: {int(lens[i])} + {max_new_tokens} "
                    f"new + window {w} exceeds per-slot KV capacity "
                    f"{cap}")
        state = eng._alloc_prompt_pages(eng.new_state(), lens, b,
                                        max_new_tokens, margin=w)
        logits, state = eng.prefill(state, jnp.asarray(toks),
                                    jnp.asarray(lens))
        self.drafter.begin(prompts, e.max_batch)

        out: List[List[int]] = [[] for _ in range(b)]
        done = np.asarray(lens[:e.max_batch] == 0)
        if stochastic:
            first, rk = eng._sample(logits, sampling, rk)
            cur = np.array(first)
        else:
            cur = np.array(jnp.argmax(logits, -1).astype(jnp.int32))
        # the prefill token is the first emission (mirrors generate())
        for i in range(b):
            if not done[i]:
                tok = int(cur[i])
                if eos_id is not None and tok == eos_id:
                    done[i] = True
                else:
                    out[i].append(tok)
                    if len(out[i]) >= max_new_tokens:
                        done[i] = True
        self.stats = {"rounds": 0, "proposed": 0, "accepted": 0}

        k = w - 1
        while not done.all():
            active = ~done
            drafts = self.drafter.propose(cur, k, active)
            toksw = np.concatenate([cur[:, None], drafts],
                                   axis=1).astype(np.int32)
            valid = np.where(active, w, 1).astype(np.int32)
            logits, state = eng.verify_step(
                state, jnp.asarray(toksw), jnp.asarray(valid))
            if stochastic:
                skey = ("specsample", e.max_batch, w, sampling)
                if skey not in eng._scan_jit:
                    eng._scan_jit[skey] = jax.jit(
                        lambda lg, d, kk: sample_verify(
                            lg, d, kk, sampling))
                rk, sk = jax.random.split(rk)
                n_d, g_d = eng._scan_jit[skey](
                    logits, jnp.asarray(drafts), sk)
                n_all = np.asarray(n_d)
                g = np.asarray(g_d)
            else:
                g = np.asarray(jnp.argmax(logits, -1)
                               .astype(jnp.int32))
            cache, pt, seq_lens = state

            committed: List[List[int]] = []
            commit_n = np.zeros((e.max_batch,), np.int32)
            n_acc = np.zeros((e.max_batch,), np.int32)
            for i in range(e.max_batch):
                if done[i] or i >= b:
                    committed.append([])
                    continue
                if stochastic:
                    n = int(n_all[i])
                else:
                    n = 0
                    while n < k and toksw[i, n + 1] == g[i, n]:
                        n += 1
                n_acc[i] = n
                committed.append([int(x) for x in toksw[i, :n + 1]])
                commit_n[i] = n + 1
                self.stats["proposed"] += k
                self.stats["accepted"] += n
                # emit the n accepted drafts + the bonus token
                for j in range(n + 1):
                    tok = int(g[i, j])
                    if eos_id is not None and tok == eos_id:
                        done[i] = True
                        break
                    out[i].append(tok)
                    if len(out[i]) >= max_new_tokens:
                        done[i] = True
                        break
                cur[i] = g[i, n]
            self.stats["rounds"] += 1
            new_lens = seq_lens + jnp.asarray(commit_n)
            state = (cache, pt, new_lens)
            self.drafter.commit(committed, n_acc,
                                np.asarray(new_lens), active)
        return out

    # -- fully on-device loop ---------------------------------------------

    def generate_ondevice(self, prompts: Sequence[Sequence[int]],
                          max_new_tokens: int,
                          eos_id: Optional[int] = None,
                          max_ngram: int = 4,
                          sampling=None,
                          seed: int = 0) -> List[List[int]]:
        """Speculative decoding with ZERO host round-trips in the
        token loop: drafting (device_ngram_draft over a
        device-resident token history), multi-token verify, prefix
        acceptance, KV commit, and eos/max-token retirement all run
        inside one jitted lax.while_loop. The host only prefills,
        launches the loop, and slices the final history.

        Through a host<->device link with ~30 ms round-trips (this
        environment's TPU tunnel) the host verify loop pays one trip
        PER ROUND; this path pays ONE for the whole generation.
        Greedy (default) is token-identical to plain greedy
        generate(); `sampling` switches to the exact-distribution
        stochastic verify (sample_verify) with the PRNG key in the
        loop carry. self.drafter is not consulted — drafting is the
        device n-gram matcher."""
        eng, e, w = self.eng, self.eng.ecfg, self.window
        if sampling is not None and sampling.is_greedy:
            sampling = None
        if getattr(eng, "mesh", None) is not None:
            raise ValueError(
                "generate_ondevice runs the base single-chip forward "
                "under its own jit; sharded engines (TP/PP) use the "
                "host verify loop (SpeculativeEngine.generate)")
        b = len(prompts)
        toks, lens, _ = eng._pad_prompts(list(prompts))
        cap = e.pages_per_seq * e.page_size
        # the capacity guard below admits prompt+max_new up to cap-w,
        # which can EXCEED max_seq_len when it isn't page-aligned —
        # the history must hold every emitted token
        hist_w = cap
        for i in range(b):
            if int(lens[i]) + max_new_tokens + w > cap:
                raise ValueError(
                    f"prompt {i}: {int(lens[i])} + {max_new_tokens} "
                    f"new + window {w} exceeds per-slot KV capacity "
                    f"{cap}")
        state = eng._alloc_prompt_pages(eng.new_state(), lens, b,
                                        max_new_tokens, margin=w)
        logits, (cache, pt, seq_lens) = eng.prefill(
            state, jnp.asarray(toks), jnp.asarray(lens))
        rk = jax.random.fold_in(jax.random.PRNGKey(seed), 0)
        if sampling is not None:
            cur, rk = eng._sample(logits, sampling, rk)
        else:
            cur = jnp.argmax(logits, -1).astype(jnp.int32)
        plen = jnp.asarray(lens, jnp.int32)
        # history = prompt tokens + the pending prefill token
        hist = jnp.zeros((e.max_batch, hist_w), jnp.int32)
        hist = jax.lax.dynamic_update_slice(
            hist, jnp.asarray(toks, jnp.int32), (0, 0))
        rows = jnp.arange(e.max_batch)
        hist = hist.at[rows, plen].set(cur, mode="drop")
        act0 = jnp.asarray(lens > 0)
        if eos_id is not None:
            act0 &= cur != eos_id
        hist_len = plen + act0.astype(jnp.int32)
        if max_new_tokens <= 1:
            act0 &= jnp.zeros_like(act0)

        key = ("specscan", e.max_batch, w, hist_w, eos_id, max_ngram,
               sampling)
        if key not in eng._scan_jit:
            eng._scan_jit[key] = jax.jit(
                self._ondevice_loop(w, eos_id, max_ngram, hist_w,
                                    sampling),
                donate_argnums=(1,))
        hist, hist_len, cache, seq_lens, st = eng._scan_jit[key](
            eng.qparams, cache, pt, seq_lens, hist, hist_len, plen,
            act0, jnp.int32(max_new_tokens), rk)
        self.stats = {"rounds": int(st[0]), "proposed": int(st[1]),
                      "accepted": int(st[2])}
        hist_np = np.asarray(hist)
        hl = np.asarray(hist_len)
        pl = np.asarray(plen)
        return [[int(t) for t in hist_np[i, pl[i]:hl[i]]]
                for i in range(b)]

    def _ondevice_loop(self, w: int, eos_id, max_ngram: int,
                       hist_w: int, sampling=None):
        """Build the jitted while-loop body (one compile per
        (batch, window, history width, eos, sampling))."""
        eng, k = self.eng, w - 1

        def f(qparams, cache, pt, seq_lens, hist, hist_len, plen,
              act, max_new, rk0):
            b = hist.shape[0]
            rows = jnp.arange(b)

            def cond(c):
                return jnp.any(c[4])

            def body(c):
                cache, seq_lens, hist, hist_len, act, \
                    (rounds, prop, acc), rk = c
                cur = jnp.take_along_axis(
                    hist, jnp.maximum(hist_len - 1, 0)[:, None],
                    axis=1)[:, 0]
                drafts = device_ngram_draft(hist, hist_len, k,
                                            max_ngram)
                toksw = jnp.concatenate([cur[:, None], drafts],
                                        axis=1)
                valid = jnp.where(act, w, 1).astype(jnp.int32)
                logits, cache = eng._prefill_chunk_forward(
                    qparams, cache, pt, toksw, seq_lens + valid,
                    seq_lens, all_logits=True, qcfg=eng.qcfg)
                if sampling is None:
                    g = jnp.argmax(logits, -1).astype(jnp.int32)
                    match = (toksw[:, 1:]
                             == g[:, :-1]).astype(jnp.int32)
                    n_acc = jnp.sum(jnp.cumprod(match, axis=1),
                                    axis=1)
                else:
                    rk, sk = jax.random.split(rk)
                    n_acc, g = sample_verify(logits, drafts, sk,
                                             sampling)
                jr = jnp.arange(w)[None]
                cand = jr <= n_acc[:, None]
                if eos_id is not None:
                    is_eos = (g == eos_id) & cand
                    fe = jnp.min(jnp.where(is_eos, jr, w), axis=1)
                else:
                    fe = jnp.full((b,), w)
                emitted = hist_len - plen
                emit = jnp.minimum(jnp.minimum(n_acc + 1, fe),
                                   max_new - emitted)
                emit = jnp.where(act, jnp.maximum(emit, 0), 0)
                # write the emitted tokens into the history
                widx = jnp.where(jr < emit[:, None],
                                 hist_len[:, None] + jr, hist_w)
                hist = hist.at[rows[:, None], widx].set(
                    g, mode="drop")
                hist_len = hist_len + emit
                seq_lens = seq_lens + jnp.where(act, n_acc + 1, 0)
                prop = prop + k * jnp.sum(act.astype(jnp.int32))
                acc = acc + jnp.sum(jnp.where(act, n_acc, 0))
                act = act & (fe > n_acc) \
                    & (hist_len - plen < max_new)
                return (cache, seq_lens, hist, hist_len, act,
                        (rounds + 1, prop, acc), rk)

            cache, seq_lens, hist, hist_len, act, stats, _ = \
                jax.lax.while_loop(
                    cond, body, (cache, seq_lens, hist, hist_len,
                                 act, (jnp.int32(0), jnp.int32(0),
                                       jnp.int32(0)), rk0))
            return hist, hist_len, cache, seq_lens, stats

        return f
