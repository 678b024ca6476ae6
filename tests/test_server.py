"""HTTP serving front: the serving loop + HTTP layer must produce
the same outputs as driving the ContinuousBatcher directly, under
concurrent clients, per-request sampling, and speculative mode."""

import http.client
import json
import threading

import jax
import jax.numpy as jnp
import pytest

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.engine import (InferenceEngine, EngineConfig,
                                 ContinuousBatcher, Request)
from arcquant_tpu.engine.server import ServingLoop, make_server
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


PROMPTS = [[5, 17, 301, 42, 8], [100, 200, 7], [1, 2, 3, 4] * 4]


def _post(port, obj):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    c.request("POST", "/v1/completions", json.dumps(obj),
              {"Content-Type": "application/json"})
    r = c.getresponse()
    out = json.loads(r.read())
    c.close()
    return r.status, out


@pytest.fixture(scope="module")
def server(setup):
    loop = ServingLoop(ContinuousBatcher(_engine(setup), top_k=8))
    srv = make_server(loop, port=0)          # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], loop
    srv.shutdown()
    loop.shutdown()


def test_http_completions_match_direct_batcher(setup, server):
    port, _ = server
    ref = ContinuousBatcher(_engine(setup))
    for p in PROMPTS:
        ref.submit(Request(prompt=list(p), max_new_tokens=6))
    expect = {tuple(r.prompt): r.output for r in ref.run()}

    results = {}
    def client(p):
        status, out = _post(port, {"prompt": p, "max_tokens": 6})
        results[tuple(p)] = (status, out)
    # concurrent clients: more requests than engine slots
    ts = [threading.Thread(target=client, args=(p,)) for p in PROMPTS]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    for p in PROMPTS:
        status, out = results[tuple(p)]
        assert status == 200
        assert out["tokens"] == expect[tuple(p)], p


def test_http_sampled_and_health(setup, server):
    port, loop = server
    status, out = _post(port, {"prompt": PROMPTS[0], "max_tokens": 5,
                               "temperature": 1.2, "top_p": 0.9})
    assert status == 200 and len(out["tokens"]) == 5
    cfg = setup[0]
    assert all(0 <= t < cfg.vocab_size for t in out["tokens"])

    c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    c.request("GET", "/health")
    r = c.getresponse()
    h = json.loads(r.read())
    c.close()
    assert r.status == 200 and h["ok"]
    assert h["stats"]["finished"] >= 4


def test_http_bad_requests(server):
    port, _ = server
    status, out = _post(port, {"max_tokens": 5})
    assert status == 400
    status, out = _post(port, {"prompt": "hello"})   # no tokenizer
    assert status == 400


def test_http_speculative_server(setup):
    """A spec-mode server returns the greedy outputs."""
    eng = _engine(setup, dynamic_pages=True, num_pages=9)
    loop = ServingLoop(ContinuousBatcher(eng, spec_window=3))
    srv = make_server(loop, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    port = srv.server_address[1]
    try:
        ref = ContinuousBatcher(_engine(setup))
        ref.submit(Request(prompt=list(PROMPTS[2]), max_new_tokens=8))
        expect = ref.run()[0].output
        status, out = _post(port, {"prompt": PROMPTS[2],
                                   "max_tokens": 8})
        assert status == 200 and out["tokens"] == expect
    finally:
        srv.shutdown()
        loop.shutdown()


def test_serving_loop_survives_bad_request(setup):
    """A request the batcher rejects (sampled request on a spec-mode
    batcher) must fail THAT request and leave the loop serving."""
    eng = _engine(setup)
    loop = ServingLoop(ContinuousBatcher(eng, spec_window=3))
    try:
        bad = Request(prompt=[1, 2, 3], max_new_tokens=4,
                      logit_bias={0: 1.0})
        loop.complete(bad, timeout=60)
        assert bad.error and "not supported" in bad.error
        ok = Request(prompt=[5, 17, 301], max_new_tokens=4)
        loop.complete(ok, timeout=300)
        assert ok.error is None and len(ok.output) == 4
        assert loop.error is None
    finally:
        loop.shutdown()


def test_serving_loop_fatal_error_fails_waiters(setup):
    """An exception escaping batcher.step must wake every waiting
    client with an error instead of hanging them, and subsequent
    submits must be rejected."""
    bt = ContinuousBatcher(_engine(setup))
    def boom():
        raise RuntimeError("synthetic engine failure")
    bt.step = boom
    loop = ServingLoop(bt)
    req = Request(prompt=[1, 2, 3], max_new_tokens=4)
    ev = loop.submit(req)
    assert ev.wait(60), "waiter hung after engine failure"
    assert req.error and "synthetic engine failure" in req.error
    assert loop.error is not None
    with pytest.raises(RuntimeError):
        loop.submit(Request(prompt=[4], max_new_tokens=1))


def test_http_streaming_sse(setup, server):
    """stream=true: per-token SSE frames followed by an authoritative
    final frame matching the non-streamed result."""
    port, _ = server
    _, out = _post(port, {"prompt": PROMPTS[0], "max_tokens": 6})
    expect = out["tokens"]

    c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    c.request("POST", "/v1/completions", json.dumps(
        {"prompt": PROMPTS[0], "max_tokens": 6, "stream": True}),
        {"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.getheader("Content-Type") == "text/event-stream"
    frames = [json.loads(line[6:])
              for line in r.read().decode().splitlines()
              if line.startswith("data: ")]
    c.close()
    final = frames[-1]
    assert final["done"] and final["tokens"] == expect
    streamed = [f["token"] for f in frames[:-1]]
    assert streamed == expect
    assert [f["index"] for f in frames[:-1]] == list(range(6))


def test_cancel_frees_slot(setup):
    """Cancelling an in-flight request retires it at the next engine
    step (slot + pages freed) and wakes its waiter with error
    'cancelled'; queued requests behind it then run to completion."""
    import time as _t
    eng = _engine(setup)
    loop = ServingLoop(ContinuousBatcher(eng))
    try:
        slow = Request(prompt=[5, 17, 301], max_new_tokens=500)
        ev = loop.submit(slow)
        # let it get admitted and decode a few tokens
        deadline = _t.time() + 60
        while not slow.output and _t.time() < deadline:
            _t.sleep(0.05)
        assert slow.output, "request never started"
        assert loop.cancel(slow.request_id)
        assert ev.wait(60), "cancelled request never completed"
        assert slow.error == "cancelled"
        assert len(slow.output) < 500
        # the freed slot serves new work
        nxt = Request(prompt=[1, 2, 3], max_new_tokens=4)
        loop.complete(nxt, timeout=300)
        assert nxt.error is None and len(nxt.output) == 4
        assert not loop.cancel(999999)       # unknown id
    finally:
        loop.shutdown()
