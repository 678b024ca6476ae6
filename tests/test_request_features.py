"""Per-request serving features: stop sequences, logit_bias,
min_new_tokens, and latency metrics — OpenAI/vLLM-style request
controls the reference has no analog for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.engine import (InferenceEngine, EngineConfig,
                                 ContinuousBatcher, Request)
from arcquant_tpu.models import llama, quantized


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=False,
                       kv_quant=False, act_scale="row",
                       w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.125)
    return cfg, params, calib, qcfg


def _engine(setup, **kw):
    cfg, params, calib, qcfg = setup
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, page_size=16,
                        **kw)
    return InferenceEngine(cfg, params, calib, qcfg, ecfg)


PROMPT = [5, 17, 301, 42, 8]


def _run_one(setup, **req_kw):
    bt = ContinuousBatcher(_engine(setup))
    bt.submit(Request(prompt=list(PROMPT), max_new_tokens=10,
                      **req_kw))
    return bt.run()[0]


def test_stop_sequence_trims_and_stops(setup):
    base = _run_one(setup).output
    assert len(base) == 10
    # stop on the exact 2-token sequence at positions 2..3: output
    # must end just before it
    stop = [base[2:4]]
    got = _run_one(setup, stop=stop).output
    assert got == base[:2], (got, base)
    # a never-occurring stop changes nothing
    got2 = _run_one(setup, stop=[[999998, 999999]]).output
    assert got2 == base


def test_stop_sequence_in_spec_mode(setup):
    base = _run_one(setup).output
    stop = [base[3:5]]
    eng = _engine(setup)
    bt = ContinuousBatcher(eng, spec_window=3)
    bt.submit(Request(prompt=list(PROMPT), max_new_tokens=10,
                      stop=stop))
    got = bt.run()[0].output
    assert got == base[:3], (got, base)


def test_logit_bias_bans_and_forces(setup):
    base = _run_one(setup).output
    # ban the first greedy token: generation must start differently
    got = _run_one(setup, logit_bias={base[0]: -1e9}).output
    assert got[0] != base[0]
    # +1e9 forces a token everywhere (greedy takes it each step)
    got2 = _run_one(setup, logit_bias={7: 1e9}).output
    assert got2 == [7] * 10


def test_min_new_tokens_suppresses_eos(setup):
    base = _run_one(setup).output
    eos = base[0]
    # without min_new_tokens: eos fires immediately, empty output
    got = _run_one(setup, eos_id=eos).output
    assert got == []
    # with min_new_tokens=4: eos is banned until 4 tokens exist
    got2 = _run_one(setup, eos_id=eos, min_new_tokens=4).output
    assert len(got2) >= 4
    assert eos not in got2[:4]
    # min_new_tokens=1 guarantees at least one token even when the
    # very first greedy token is eos (the off-by-one regression case)
    got3 = _run_one(setup, eos_id=eos, min_new_tokens=1).output
    assert len(got3) >= 1 and got3[0] != eos


def test_latency_metrics_filled(setup):
    r = _run_one(setup)
    assert r.t_submit is not None and r.t_first is not None \
        and r.t_done is not None
    assert r.t_submit <= r.t_first <= r.t_done


def test_spec_mode_rejects_bias_and_min(setup):
    bt = ContinuousBatcher(_engine(setup), spec_window=3)
    with pytest.raises(ValueError):
        bt.submit(Request(prompt=[1], logit_bias={0: 1.0}))
    with pytest.raises(ValueError):
        bt.submit(Request(prompt=[1], min_new_tokens=2))


def test_http_stop_and_bias(setup):
    import http.client
    import json
    import threading
    from arcquant_tpu.engine.server import ServingLoop, make_server
    base = _run_one(setup).output
    loop = ServingLoop(ContinuousBatcher(_engine(setup)))
    srv = make_server(loop, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = http.client.HTTPConnection("127.0.0.1",
                                       srv.server_address[1],
                                       timeout=300)
        # banning a token the greedy chain never picks must not
        # change it (exercises the bias plumbing end-to-end)
        ban = next(t for t in range(512) if t not in base)
        c.request("POST", "/v1/completions", json.dumps(
            {"prompt": PROMPT, "max_tokens": 10,
             "stop": [base[2:4]],
             "logit_bias": {str(ban): -1e9}}))
        out = json.loads(c.getresponse().read())
        c.close()
        assert out["tokens"] == base[:2]
        assert out["ttft_s"] >= 0
    finally:
        srv.shutdown()
        loop.shutdown()


def test_presence_penalty_blocks_repeats(setup):
    """A huge presence penalty makes greedy output repeat-free (each
    emitted token is banned afterwards); small penalties leave a
    non-repeating prefix unchanged."""
    base = _run_one(setup).output
    assert len(set(base)) < len(base)      # random weights do repeat
    got = _run_one(setup, presence_penalty=1e9).output
    assert len(set(got)) == len(got), got
    assert got[0] == base[0]               # first token unaffected


def test_frequency_penalty_scales_with_count(setup):
    """frequency_penalty accumulates per occurrence — with a huge
    value it equals the presence ban; with 0 it changes nothing."""
    base = _run_one(setup).output
    a = _run_one(setup, frequency_penalty=1e9).output
    assert len(set(a)) == len(a)
    b = _run_one(setup, presence_penalty=0.0,
                 frequency_penalty=0.0).output
    assert b == base


def test_http_n_parallel_samples(setup):
    import http.client
    import json
    import threading
    from arcquant_tpu.engine.server import ServingLoop, make_server
    loop = ServingLoop(ContinuousBatcher(_engine(setup), top_k=8))
    srv = make_server(loop, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = http.client.HTTPConnection("127.0.0.1",
                                       srv.server_address[1],
                                       timeout=300)
        c.request("POST", "/v1/completions", json.dumps(
            {"prompt": PROMPT, "max_tokens": 5, "n": 3,
             "temperature": 1.2}))
        out = json.loads(c.getresponse().read())
        c.close()
        assert len(out["choices"]) == 3
        for ch in out["choices"]:
            assert len(ch["tokens"]) == 5
        # hot samples across choices are not all identical
        toks = [tuple(ch["tokens"]) for ch in out["choices"]]
        assert len(set(toks)) > 1
    finally:
        srv.shutdown()
        loop.shutdown()


def test_per_request_seed_batch_independent(setup):
    """A seeded sampled request produces the SAME tokens no matter
    what else shares the batch or what the batcher's own seed is —
    row keys derive from (request seed, tokens generated), not the
    shared stream."""
    def run(batcher_seed, companions):
        bt = ContinuousBatcher(_engine(setup), top_k=8,
                               seed=batcher_seed)
        target = Request(prompt=list(PROMPT), max_new_tokens=8,
                         temperature=1.0, seed=1234)
        bt.submit(target)
        for c in companions:
            bt.submit(c)
        bt.run()
        return target.output

    alone = run(0, [])
    with_greedy = run(7, [Request(prompt=[9, 9, 9],
                                  max_new_tokens=8)])
    with_hot = run(99, [Request(prompt=[3, 1, 4], max_new_tokens=8,
                                temperature=1.5)])
    assert alone == with_greedy == with_hot, (alone, with_greedy,
                                              with_hot)
    # a different request seed gives a different stream
    def run_seed(seed):
        bt = ContinuousBatcher(_engine(setup), top_k=8)
        r = Request(prompt=list(PROMPT), max_new_tokens=8,
                    temperature=1.0, seed=seed)
        bt.submit(r)
        bt.run()
        return r.output
    assert run_seed(1234) == alone
    assert run_seed(4321) != alone
