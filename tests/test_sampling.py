"""On-device sampling: distributional correctness of the
temperature/top-k/top-p warps, greedy equivalence at temperature 0,
and per-request sampling through decode_scan / generate / the
continuous batcher."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.engine import (InferenceEngine, EngineConfig,
                                 ContinuousBatcher, Request,
                                 SamplingParams)
from arcquant_tpu.engine.sampling import sample
from arcquant_tpu.models import llama, quantized


def _keys(n, seed=0):
    return jax.random.split(jax.random.PRNGKey(seed), n)


def test_temperature_zero_is_greedy():
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    greedy = np.asarray(jnp.argmax(logits, -1))
    for k in _keys(5):
        got = np.asarray(sample(logits, k, temperature=0.0))
        assert (got == greedy).all()
    # per-row: row 0 greedy, row 1 hot — row 0 must stay pinned
    t = jnp.asarray([0.0, 5.0, 0.0, 5.0])
    outs = np.stack([np.asarray(sample(logits, k, temperature=t))
                     for k in _keys(50)])
    assert (outs[:, 0] == greedy[0]).all()
    assert (outs[:, 2] == greedy[2]).all()
    assert len(set(outs[:, 1].tolist())) > 1  # hot row actually varies


def test_top_k_restricts_support():
    logits = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
    topk = set(np.asarray(jax.lax.top_k(logits, 4)[1]).ravel().tolist())
    for k in _keys(200):
        got = np.asarray(sample(logits, k, temperature=2.0, top_k=4))
        assert set(got.tolist()) <= topk


def test_top_p_restricts_support():
    # one dominant token (p ~ 0.97) + noise: top_p=0.5 must always
    # return the dominant token
    logits = jnp.zeros((1, 16)).at[0, 7].set(5.0)
    for k in _keys(100):
        got = np.asarray(sample(logits, k, temperature=1.0, top_p=0.5))
        assert got[0] == 7
    # top_p=1.0 keeps full support: other tokens do appear
    seen = {int(np.asarray(sample(logits, k, temperature=3.0))[0])
            for k in _keys(300)}
    assert len(seen) > 1


def test_sampling_matches_softmax_frequencies():
    """Empirical frequencies over 3000 draws ≈ softmax probs (the
    gumbel/categorical path is an unbiased sampler)."""
    logits = jnp.asarray([[1.0, 0.0, -1.0, 2.0]])
    probs = np.asarray(jax.nn.softmax(logits[0]))
    draws = jax.vmap(lambda k: sample(logits, k)[0])(_keys(3000, 3))
    freq = np.bincount(np.asarray(draws), minlength=4) / 3000.0
    np.testing.assert_allclose(freq, probs, atol=0.04)


# pages are lanes on hardware: interpret mode exercises the
# small-page layout, the real chip needs 128-token pages
PAGE = 128 if os.environ.get("ARC_TEST_TPU") else 16


@pytest.fixture(scope="module")
def eng():
    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=False,
                       kv_quant=False, act_scale="row",
                       w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.125)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, page_size=PAGE)
    return InferenceEngine(cfg, params, calib, qcfg, ecfg)


PROMPTS = [[5, 17, 301, 42, 8], [100, 200, 7]]


def test_generate_sampling(eng):
    """Stochastic generate: reproducible per seed, valid token range,
    and greedy SamplingParams reproduces the greedy path exactly."""
    sp = SamplingParams(temperature=1.0, top_k=8)
    a = eng.generate(PROMPTS, max_new_tokens=6, sampling=sp, seed=1)
    b = eng.generate(PROMPTS, max_new_tokens=6, sampling=sp, seed=1)
    assert a == b
    v = eng.cfg.vocab_size
    assert all(0 <= t < v for row in a for t in row)
    greedy = eng.generate(PROMPTS, max_new_tokens=6)
    g2 = eng.generate(PROMPTS, max_new_tokens=6,
                      sampling=SamplingParams(temperature=0.0))
    assert g2 == greedy


def test_decode_scan_sampling(eng):
    """Sampled decode_scan: same seed → same tokens; temperature 0 →
    exactly the greedy scan."""
    toks = np.zeros((2, 8), np.int32)
    toks[0, :5] = PROMPTS[0]
    toks[1, :3] = PROMPTS[1]
    lens = jnp.asarray([5, 3], jnp.int32)

    def run(sampling, seed=7):
        s = eng.new_state()
        lg, s = eng.prefill(s, jnp.asarray(toks), lens)
        first = jnp.argmax(lg, -1).astype(jnp.int32)
        t, _ = eng.decode_scan(s, first, jnp.asarray([True, True]), 6,
                               sampling=sampling, seed=seed)
        return np.asarray(t)

    sp = SamplingParams(temperature=0.8, top_k=8)
    assert (run(sp) == run(sp)).all()
    assert (run(SamplingParams(temperature=0.0)) == run(None)).all()


def test_batcher_per_request_sampling(eng):
    """Two requests, same prompt: a greedy one and a hot one. The
    greedy request must reproduce the no-sampling batcher output
    bit-for-bit; the hot one must emit valid tokens."""
    ref = ContinuousBatcher(eng)
    ref.submit(Request(prompt=PROMPTS[0], max_new_tokens=6))
    greedy_out = ref.run()[0].output

    bt = ContinuousBatcher(eng, top_k=8, seed=3)
    bt.submit(Request(prompt=PROMPTS[0], max_new_tokens=6))
    bt.submit(Request(prompt=PROMPTS[0], max_new_tokens=6,
                      temperature=1.5, top_p=0.9))
    done = {r.request_id: r for r in bt.run()}
    outs = sorted(done.values(), key=lambda r: r.request_id)
    assert outs[0].output == greedy_out
    v = eng.cfg.vocab_size
    assert all(0 <= t < v for t in outs[1].output)
    assert len(outs[1].output) == 6
