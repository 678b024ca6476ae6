"""Speculative decoding: greedy spec decode must be TOKEN-IDENTICAL
to plain greedy decode (the acceptance rule only ever commits tokens
the target itself would have produced), for every drafter — including
an adversarial one — and verify_step must agree with sequential
decode steps position by position."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.engine import (InferenceEngine, EngineConfig,
                                 SpeculativeEngine, NgramDrafter,
                                 EngineDrafter,
                                 Request as Request_)
from arcquant_tpu.models import llama, quantized


# pages are lanes on hardware: interpret mode exercises the
# small-page layout, the real chip needs 128-token pages
PAGE = 128 if os.environ.get("ARC_TEST_TPU") else 16


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=False,
                       kv_quant=False, act_scale="row",
                       w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.125)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, page_size=PAGE)
    eng = InferenceEngine(cfg, params, calib, qcfg, ecfg)
    return cfg, params, calib, qcfg, eng


def _fresh(setup, **kw):
    cfg, params, calib, qcfg, _ = setup
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, page_size=PAGE,
                        **kw)
    return InferenceEngine(cfg, params, calib, qcfg, ecfg)


PROMPTS = [[5, 17, 301, 42, 8], [100, 200, 7]]


def test_verify_step_matches_sequential_decode(setup):
    """verify_step's W-position logits == W sequential decode_steps
    fed the same tokens (same int4 pool contents, same greedy
    argmax)."""
    _, _, _, _, eng = setup
    toks = np.zeros((2, 8), np.int32)
    toks[0, :5] = PROMPTS[0]
    toks[1, :3] = PROMPTS[1]
    lens = jnp.asarray([5, 3], jnp.int32)
    fed = np.asarray([[9, 15, 33, 2], [4, 88, 12, 51]], np.int32)

    # path A: sequential single-token decode
    sa = eng.new_state()
    _, sa = eng.prefill(sa, jnp.asarray(toks), lens)
    seq_logits = []
    act = jnp.asarray([True, True])
    for i in range(4):
        lg, sa = eng.decode_step(sa, jnp.asarray(fed[:, i]), act)
        seq_logits.append(np.asarray(lg))

    # path B: one verify step over all 4 tokens
    sb = eng.new_state()
    _, sb = eng.prefill(sb, jnp.asarray(toks), lens)
    vlog, sb = eng.verify_step(sb, jnp.asarray(fed),
                               jnp.asarray([4, 4]))
    vlog = np.asarray(vlog)
    for i in range(4):
        assert (vlog[:, i].argmax(-1)
                == seq_logits[i].argmax(-1)).all(), i
        np.testing.assert_allclose(vlog[:, i], seq_logits[i],
                                   rtol=2e-2, atol=2e-2)


def test_verify_step_ragged_valid(setup):
    """Rows with valid < W: logits at positions < valid match the
    sequential decode; extra positions are ignored and seq_lens are
    untouched (the caller commits)."""
    _, _, _, _, eng = setup
    toks = np.zeros((2, 8), np.int32)
    toks[0, :5] = PROMPTS[0]
    toks[1, :3] = PROMPTS[1]
    lens = jnp.asarray([5, 3], jnp.int32)
    fed = np.asarray([[9, 15, 33, 2], [4, 0, 0, 0]], np.int32)

    sa = eng.new_state()
    _, sa = eng.prefill(sa, jnp.asarray(toks), lens)
    lg0, _ = eng.decode_step(sa, jnp.asarray(fed[:, 0]),
                             jnp.asarray([True, True]))

    sb = eng.new_state()
    _, sb = eng.prefill(sb, jnp.asarray(toks), lens)
    vlog, sb = eng.verify_step(sb, jnp.asarray(fed),
                               jnp.asarray([4, 1]))
    assert (np.asarray(vlog)[1, 0].argmax(-1)
            == np.asarray(lg0)[1].argmax(-1))
    assert np.asarray(sb[2]).tolist() == [5, 3]  # lens unchanged


class GarbageDrafter:
    """Adversarial drafter: always proposes token 0 — forces the
    all-reject path every round."""

    def begin(self, prompts, max_batch):
        pass

    def propose(self, cur, k, active):
        return np.zeros((len(cur), k), np.int32)

    def commit(self, committed, accepted, new_lens, active):
        pass


@pytest.mark.parametrize("window", [2, 4])
def test_spec_garbage_drafts_token_identical(setup, window):
    """Pure rollback test: with every draft rejected, output must
    still equal plain greedy decode token for token."""
    _, _, _, _, eng = setup
    ref = eng.generate(PROMPTS, max_new_tokens=10)
    spec = SpeculativeEngine(_fresh(setup), GarbageDrafter(),
                             window=window)
    got = spec.generate(PROMPTS, max_new_tokens=10)
    assert got == ref, (got, ref)
    assert spec.stats["accepted"] == 0


def test_spec_self_draft_token_identical_and_accepting(setup):
    """Draft == target model: drafts are the target's own greedy
    tokens, so near-everything is accepted — and output is identical
    to plain decode (token-identity does not depend on the
    acceptance rate)."""
    _, _, _, _, eng = setup
    ref = eng.generate(PROMPTS, max_new_tokens=12)
    target = _fresh(setup)
    draft = _fresh(setup)
    spec = SpeculativeEngine(target, EngineDrafter(draft), window=4)
    got = spec.generate(PROMPTS, max_new_tokens=12)
    assert got == ref, (got, ref)
    assert spec.stats["accepted"] > 0
    # a perfect drafter should need far fewer rounds than tokens
    assert spec.stats["rounds"] < 12


def test_spec_ngram_token_identical(setup):
    """Prompt-lookup drafter on a repetitive prompt: output identical
    to plain decode regardless of what the drafter proposes."""
    _, _, _, _, eng = setup
    prompts = [[1, 2, 3, 4] * 6, [7, 8, 7, 8, 7, 8]]
    ref = eng.generate(prompts, max_new_tokens=10)
    spec = SpeculativeEngine(_fresh(setup), NgramDrafter(), window=3)
    got = spec.generate(prompts, max_new_tokens=10)
    assert got == ref, (got, ref)


def test_spec_eos_and_dynamic_pages(setup):
    """EOS mid-window stops the row exactly where plain decode does;
    dynamic page mode preallocates the rollback margin."""
    _, _, _, _, eng = setup
    ref = eng.generate(PROMPTS, max_new_tokens=10)
    eos = ref[0][3]  # a token plain decode actually emits
    ref_eos = eng.generate(PROMPTS, max_new_tokens=10, eos_id=eos)
    eng_d = _fresh(setup, dynamic_pages=True, num_pages=9)
    spec = SpeculativeEngine(eng_d, GarbageDrafter(), window=4)
    got = spec.generate(PROMPTS, max_new_tokens=10, eos_id=eos)
    assert got == ref_eos, (got, ref_eos)


def test_ngram_matcher():
    d = NgramDrafter(max_ngram=3)
    d.begin([[1, 2, 3, 4, 1, 2, 3]], max_batch=1)
    # context suffix (2,3) + cur 4 -> trigram (2,3,4) matches at 1..3
    # -> propose what followed: 1, 2, 3
    out = d.propose(np.asarray([4]), 3, np.asarray([True]))
    assert out[0].tolist() == [1, 2, 3]
    # no match at all -> repeat-last fallback
    d2 = NgramDrafter()
    d2.begin([[9, 8, 7]], max_batch=1)
    out = d2.propose(np.asarray([6]), 2, np.asarray([True]))
    assert out[0].tolist() == [6, 6]


def test_batcher_speculative_matches_plain(setup):
    """ContinuousBatcher in speculative mode (dynamic pages, more
    requests than slots): outputs must equal the plain batcher's
    greedy outputs request for request, with drafts actually
    accepted on the repetitive prompts."""
    from arcquant_tpu.engine import ContinuousBatcher
    reqs = lambda: [  # noqa: E731
        Request_(prompt=[1, 2, 3, 4] * 5, max_new_tokens=8),
        Request_(prompt=[7, 8, 7, 8, 7, 8], max_new_tokens=10),
        Request_(prompt=[5, 17, 301, 42, 8], max_new_tokens=6),
    ]
    def run(spec_window):
        eng = _fresh(setup, dynamic_pages=True, num_pages=9)
        bt = ContinuousBatcher(eng, spec_window=spec_window)
        for r in reqs():
            bt.submit(r)
        done = bt.run()
        return {r.prompt[0]: r.output for r in done}, bt
    plain, _ = run(0)
    spec, bt = run(3)
    assert spec == plain, (spec, plain)
    assert bt.spec_stats["accepted"] > 0
    assert bt.spec_stats["rounds"] > 0


def test_batcher_spec_rejects_bias_and_min(setup):
    """Sampled requests are allowed in spec mode (stochastic verify);
    logit_bias / min_new_tokens (per-position edits) are not."""
    from arcquant_tpu.engine import ContinuousBatcher
    bt = ContinuousBatcher(_fresh(setup), spec_window=4)
    bt.submit(Request_(prompt=[1, 2], temperature=0.7))  # fine now
    with pytest.raises(ValueError):
        bt.submit(Request_(prompt=[1, 2], logit_bias={0: 1.0}))
    with pytest.raises(ValueError):
        bt.submit(Request_(prompt=[1, 2], min_new_tokens=3))


def test_device_ngram_matches_host_drafter():
    """device_ngram_draft must agree with the host NgramDrafter on
    random histories (same longest-suffix / most-recent-match /
    repeat-last-fallback semantics)."""
    from arcquant_tpu.engine.spec import device_ngram_draft
    rng = np.random.RandomState(0)
    d = NgramDrafter(max_ngram=4)
    for trial in range(20):
        L = rng.randint(2, 40)
        seq = rng.randint(0, 4, size=L).tolist()  # small vocab: matches
        k = rng.randint(1, 5)
        want = d.draft(seq, k)
        hist = np.zeros((1, 64), np.int32)
        hist[0, :L] = seq
        got = np.asarray(device_ngram_draft(
            jnp.asarray(hist), jnp.asarray([L], jnp.int32), k))
        assert got[0].tolist() == want, (trial, seq, k, got, want)


def test_ondevice_spec_token_identical(setup):
    """The fully on-device spec loop (drafting + verify + accept +
    commit in one lax.while_loop) must reproduce plain greedy
    generate token for token — including eos retirement — while
    needing fewer verify rounds than tokens on looping output."""
    _, _, _, _, eng = setup
    prompts = [[1, 2, 3, 4] * 6, [5, 17, 301, 42, 8]]
    ref = eng.generate(prompts, max_new_tokens=12)
    spec = SpeculativeEngine(_fresh(setup), NgramDrafter(), window=4)
    got = spec.generate_ondevice(prompts, max_new_tokens=12)
    assert got == ref, (got, ref)
    assert spec.stats["rounds"] <= 24  # 2 rows x 12 tokens upper bound

    # eos: stop exactly where greedy decode stops
    eos = ref[1][2]
    ref_eos = eng.generate(prompts, max_new_tokens=12, eos_id=eos)
    got_eos = spec.generate_ondevice(prompts, max_new_tokens=12,
                                     eos_id=eos)
    assert got_eos == ref_eos, (got_eos, ref_eos)


def test_ondevice_spec_accepts_on_looping_output(setup):
    """On output that actually loops, the on-device drafter must win
    rounds: strictly fewer verify rounds than emitted tokens."""
    _, _, _, _, eng = setup
    prompts = [[9, 9, 9, 9], [2, 7, 2, 7, 2, 7]]
    ref = eng.generate(prompts, max_new_tokens=16)
    spec = SpeculativeEngine(_fresh(setup), NgramDrafter(), window=4)
    got = spec.generate_ondevice(prompts, max_new_tokens=16)
    assert got == ref
    total = sum(len(o) for o in got)
    assert spec.stats["rounds"] < total, (spec.stats, total)


def test_batcher_spec_with_prefix_sharing_and_chunked_prefill(setup):
    """Spec verify writes stale (uncommitted) K/V up to window-1
    positions past the committed length — this must never corrupt
    refcounted shared prefix pages (stale appends land beyond the
    full-page prefix region by construction). Two requests share a
    page-aligned prompt prefix; chunked prefill + dynamic pages +
    spec decode together must reproduce the plain batcher."""
    from arcquant_tpu.engine import ContinuousBatcher
    shared = list(range(1, PAGE + 1))    # one full page
    reqs = lambda: [  # noqa: E731
        Request_(prompt=shared + [31, 32], max_new_tokens=8),
        Request_(prompt=shared + [41, 42, 43], max_new_tokens=8),
    ]

    def run(spec_window):
        eng = _fresh(setup, dynamic_pages=True, prefill_chunk=PAGE,
                     prefix_sharing=True, num_pages=12)
        bt = ContinuousBatcher(eng, spec_window=spec_window)
        for r in reqs():
            bt.submit(r)
        done = bt.run()
        return {r.prompt[-1]: r.output for r in done}

    plain = run(0)
    spec = run(3)
    assert spec == plain, (spec, plain)


def test_sample_verify_exact_marginal():
    """Stochastic speculative sampling correctness: the FIRST emitted
    token's marginal must equal the warped target softmax regardless
    of what the (deterministic) drafter proposed — accept-with-p(d) +
    masked-residual-resample is exactly the target distribution."""
    from arcquant_tpu.engine.spec import sample_verify
    from arcquant_tpu.engine.sampling import SamplingParams
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray([[[2.0, 1.0, 0.0, -1.0, 0.5, 1.5, -2.0, 0.2],
                           [0.0] * 8]])        # [1, W=2, V=8]
    params = SamplingParams(temperature=1.0)
    target = np.asarray(jax.nn.softmax(logits[0, 0]))
    for draft_tok in (0, 6):        # high-prob and low-prob proposals
        drafts = jnp.asarray([[draft_tok]], jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(draft_tok + 1),
                                4000)
        n, out = jax.vmap(
            lambda k: sample_verify(logits, drafts, k, params))(keys)
        first = np.asarray(out[:, 0, 0])
        freq = np.bincount(first, minlength=8) / len(first)
        np.testing.assert_allclose(freq, target, atol=0.035), draft_tok
        # and acceptance probability == p(draft)
        acc_rate = float(np.asarray(n[:, 0]).mean())
        np.testing.assert_allclose(acc_rate, target[draft_tok],
                                   atol=0.03)


def test_spec_generate_sampled(setup):
    """Sampled speculative generate: reproducible per seed, valid
    tokens, and a greedy SamplingParams falls back to the
    token-identical greedy path."""
    _, _, _, _, eng = setup
    from arcquant_tpu.engine import SamplingParams
    prompts = [[1, 2, 3, 4] * 5, [5, 17, 301]]
    spec = SpeculativeEngine(_fresh(setup), NgramDrafter(), window=3)
    sp = SamplingParams(temperature=1.0, top_k=8)
    a = spec.generate(prompts, max_new_tokens=8, sampling=sp, seed=3)
    b2 = spec.generate(prompts, max_new_tokens=8, sampling=sp, seed=3)
    assert a == b2
    v = eng.cfg.vocab_size
    assert all(0 <= t < v for row in a for t in row)
    assert all(len(row) == 8 for row in a)
    greedy_ref = eng.generate(prompts, max_new_tokens=8)
    g2 = spec.generate(prompts, max_new_tokens=8,
                       sampling=SamplingParams(temperature=0.0))
    assert g2 == greedy_ref


def test_batcher_spec_sampled_requests(setup):
    """Per-request sampled SPECULATIVE batching: mixed greedy + hot
    requests in one spec-mode batch. The greedy request must still be
    token-identical to the plain batcher (temperature-0 rows
    degenerate to the greedy comparator through the warp); the hot
    one emits valid tokens and is reproducible per batcher seed."""
    from arcquant_tpu.engine import ContinuousBatcher
    _, _, _, _, eng = setup
    plain = ContinuousBatcher(_fresh(setup))
    plain.submit(Request_(prompt=[1, 2, 3, 4] * 5, max_new_tokens=8))
    greedy_out = plain.run()[0].output

    def run():
        bt = ContinuousBatcher(_fresh(setup), top_k=8, seed=11,
                               spec_window=3)
        r1 = Request_(prompt=[1, 2, 3, 4] * 5, max_new_tokens=8)
        r2 = Request_(prompt=[1, 2, 3, 4] * 5, max_new_tokens=8,
                      temperature=1.2, top_p=0.9)
        bt.submit(r1)
        bt.submit(r2)
        bt.run()
        return r1.output, r2.output

    g1, s1 = run()
    g2, s2 = run()
    assert g1 == greedy_out, (g1, greedy_out)
    assert (g1, s1) == (g2, s2)          # seed-reproducible
    v = setup[0].vocab_size
    assert all(0 <= t < v for t in s1) and len(s1) == 8


def test_ondevice_spec_sampled(setup):
    """Sampled on-device spec loop: seed-reproducible, valid tokens,
    exact lengths; greedy SamplingParams still token-identical to
    plain greedy generate."""
    from arcquant_tpu.engine import SamplingParams
    _, _, _, _, eng = setup
    prompts = [[1, 2, 3, 4] * 5, [5, 17, 301]]
    spec = SpeculativeEngine(_fresh(setup), NgramDrafter(), window=3)
    sp = SamplingParams(temperature=1.0, top_k=8)
    a = spec.generate_ondevice(prompts, 8, sampling=sp, seed=5)
    b2 = spec.generate_ondevice(prompts, 8, sampling=sp, seed=5)
    assert a == b2
    v = eng.cfg.vocab_size
    assert all(0 <= t < v for row in a for t in row)
    assert all(len(row) == 8 for row in a)
    ref = eng.generate(prompts, max_new_tokens=8)
    g = spec.generate_ondevice(prompts, 8,
                               sampling=SamplingParams(
                                   temperature=0.0))
    assert g == ref, (g, ref)


def test_spec_sampled_with_engine_drafter(setup):
    """A draft MODEL under stochastic verify: the drafter proposes
    greedily (deterministic given context — a valid point-mass q) and
    its cache stays coherent across partial acceptance + catch-up.
    Seed-reproducible, valid tokens, high acceptance at temperature
    ~0.01 (near-greedy target accepts the greedy drafts)."""
    from arcquant_tpu.engine import SamplingParams
    _, _, _, _, eng = setup
    spec = SpeculativeEngine(_fresh(setup), EngineDrafter(_fresh(setup)),
                             window=4)
    sp = SamplingParams(temperature=0.01)
    a = spec.generate(PROMPTS, max_new_tokens=10, sampling=sp, seed=2)
    b2 = spec.generate(PROMPTS, max_new_tokens=10, sampling=sp,
                       seed=2)
    assert a == b2
    v = setup[0].vocab_size
    assert all(0 <= t < v for row in a for t in row)
    # near-greedy target + greedy self-drafts: most drafts accepted
    assert spec.stats["accepted"] > spec.stats["rounds"]
