"""On-device stochastic sampling (temperature / top-k / top-p).

The reference decodes greedily only (its benchmark loop feeds argmax
tokens, benchmarks/benchmark_e2e_arc.py:134-166); a serving engine
needs real samplers. Everything here is jit-compatible and
batch-vectorized: `temperature` and `top_p` may be per-row arrays
(per-REQUEST sampling under continuous batching — rows with
temperature 0 take the greedy token), `top_k` is static (it shapes a
lax.top_k). Sampling itself is `jax.random.categorical` (Gumbel
argmax) — no host round-trip in the token loop, so `decode_scan`
stays a single fused on-device scan with the PRNG key in the carry.

Warp order matches HF transformers: temperature → top-k → top-p
(nucleus mass computed on the temperature-warped distribution)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    """Static (hashable) sampling config for scan-jitted paths.
    temperature 0 = greedy; top_k 0 = off; top_p 1 = off."""
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0

    @property
    def is_greedy(self) -> bool:
        return self.temperature <= 0.0


def warp_logits(logits: jax.Array, temperature=1.0, top_k: int = 0,
                top_p=1.0) -> jax.Array:
    """Apply the temperature → top-k → top-p warps to [B, V] logits,
    returning warped f32 logits (masked entries are -inf). Sampling
    from `softmax(warp_logits(x))` IS the engine's sampled
    distribution — speculative sampling (spec.py) reuses this so its
    acceptance math targets exactly the same distribution."""
    b, v = logits.shape
    x = logits.astype(jnp.float32)
    t = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (b,))
    x = x / jnp.maximum(t, 1e-6)[:, None]
    if top_k and top_k < v:
        kth = jax.lax.top_k(x, top_k)[0][:, -1:]
        x = jnp.where(x < kth, -jnp.inf, x)
    tp = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))
    if not (isinstance(top_p, (int, float)) and top_p >= 1.0):
        probs = jax.nn.softmax(x, -1)
        sp = jnp.sort(probs, -1)[:, ::-1]
        # keep the smallest prefix of the sorted probs reaching top_p
        # mass; the top-1 token is kept UNCONDITIONALLY (HF
        # min_tokens_to_keep=1 — top_p <= 0 must not mask everything)
        prev = jnp.cumsum(sp, -1) - sp
        keep = (prev < tp[:, None]).at[:, 0].set(True)
        cutoff = jnp.min(jnp.where(keep, sp, jnp.inf), -1,
                         keepdims=True)
        x = jnp.where(probs < cutoff, -jnp.inf, x)
    return x


def sample(logits: jax.Array, key: jax.Array, temperature=1.0,
           top_k: int = 0, top_p=1.0) -> jax.Array:
    """Sample one token per row from [B, V] logits.

    temperature / top_p: python floats or [B] arrays (per-request).
    top_k: STATIC int. Rows with temperature <= 0 get argmax.
    Returns [B] i32."""
    b, v = logits.shape
    greedy = jnp.argmax(logits, -1).astype(jnp.int32)
    t = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (b,))
    if (isinstance(temperature, (int, float)) and temperature <= 0.0
            and top_k == 0):
        return greedy
    x = warp_logits(logits, temperature, top_k, top_p)
    sampled = jax.random.categorical(key, x).astype(jnp.int32)
    return jnp.where(t <= 0.0, greedy, sampled)


def sample_with_keys(logits: jax.Array, keys: jax.Array,
                     temperature=1.0, top_k: int = 0,
                     top_p=1.0) -> jax.Array:
    """Like sample(), but with an INDEPENDENT PRNG key per row
    (keys [B, 2] u32). Per-request seeded sampling under continuous
    batching derives row keys from (request seed, tokens generated),
    so a request's sampled stream is reproducible regardless of what
    else shares the batch."""
    b, v = logits.shape
    greedy = jnp.argmax(logits, -1).astype(jnp.int32)
    t = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (b,))
    x = warp_logits(logits, temperature, top_k, top_p)
    sampled = jax.vmap(jax.random.categorical)(keys, x)
    return jnp.where(t <= 0.0, greedy, sampled.astype(jnp.int32))


def sample_p(logits: jax.Array, key: jax.Array,
             p: SamplingParams) -> jax.Array:
    return sample(logits, key, p.temperature, p.top_k, p.top_p)
