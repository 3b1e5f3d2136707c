"""Pallas flash attention vs the XLA reference implementation.

Runs in interpreter mode on CPU (the kernel auto-selects); verifies both
forward values and all five gradients (q, k, v, gate, bias_rel), with and
without key-padding masks and with non-128-aligned sequence lengths.

The kernel consumes the position bias in Toeplitz-generator form
``bias_rel [H, 2T]`` (entry ``[h, T-1+k-q]``); the XLA oracle expands it to
dense ``[H, T, T]`` with ``dense_bias_from_rel`` — differentiating the
oracle through that expansion yields the reference ``d(bias_rel)``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nrse_tpu.ops.attention import gated_bias_attention
from nrse_tpu.ops.flash_attention import (
    _shear_rows,
    _shear_rows_adjoint,
    flash_gated_attention,
)
from nrse_tpu.ops.rel_pos_bias import dense_bias_from_rel

B, H, D = 2, 3, 16


def make_inputs(t, seed=0, masked=False):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, t, D)).astype(np.float32)
    k = rng.standard_normal((B, H, t, D)).astype(np.float32)
    v = rng.standard_normal((B, H, t, D)).astype(np.float32)
    gate = rng.uniform(0.5, 2.5, (B, H, t)).astype(np.float32)
    bias_rel = rng.standard_normal((H, 2 * t)).astype(np.float32)
    mask = None
    if masked:
        mask = np.ones((B, t), np.int32)
        mask[1, t // 2:] = 0
    return tuple(jnp.asarray(x) for x in (q, k, v, gate, bias_rel)), mask


def test_shear_rows_oracle():
    """out[i, j] = w[bq-1-i+j] (the Toeplitz row builder)."""
    rng = np.random.default_rng(0)
    bq, n = 8, 24
    w = rng.standard_normal((1, n)).astype(np.float32)
    out = np.asarray(_shear_rows(jnp.asarray(w), bq))
    for i in range(bq):
        for j in range(n - bq + 1):
            assert out[i, j] == w[0, bq - 1 - i + j]


def test_shear_rows_adjoint_oracle():
    """Adjoint: out[p] = sum of ds over the diagonal bq-1-i+j == p."""
    rng = np.random.default_rng(1)
    bq, bk = 8, 16
    n = bq + bk
    ds = rng.standard_normal((bq, bk)).astype(np.float32)
    out = np.asarray(_shear_rows_adjoint(jnp.asarray(ds), n))[0]
    expected = np.zeros(n, np.float32)
    for i in range(bq):
        for j in range(bk):
            expected[bq - 1 - i + j] += ds[i, j]
    np.testing.assert_allclose(out, expected, rtol=1e-6)


@pytest.mark.parametrize("t,masked", [(64, False), (64, True), (100, False),
                                      (250, True)])
def test_forward_matches_reference(t, masked):
    (q, k, v, gate, bias_rel), mask = make_inputs(t, masked=masked)
    jmask = None if mask is None else jnp.asarray(mask)
    dense = dense_bias_from_rel(bias_rel, t)
    ref = gated_bias_attention(q, k, v, gate, dense, jmask)
    ours = flash_gated_attention(q, k, v, gate, bias_rel, jmask,
                                 block_q=64, block_k=64)
    ref, ours = np.asarray(ref), np.asarray(ours)
    err = np.abs(ours - ref).max()
    assert err < 2e-5, f"max abs err {err}"


def test_gradients_match_reference():
    t = 96
    (q, k, v, gate, bias_rel), mask = make_inputs(t, seed=1, masked=True)
    jmask = jnp.asarray(mask)

    def loss_ref(q, k, v, gate, brel):
        o = gated_bias_attention(q, k, v, gate,
                                 dense_bias_from_rel(brel, t), jmask)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    def loss_flash(q, k, v, gate, brel):
        o = flash_gated_attention(q, k, v, gate, brel, jmask,
                                  block_q=32, block_k=32)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, gate,
                                                        bias_rel)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, gate,
                                                            bias_rel)
    names = ["dq", "dk", "dv", "dgate", "dbias_rel"]
    for name, a, b in zip(names, g_ref, g_flash):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-6
        err = np.abs(a - b).max() / denom
        assert err < 5e-4, f"{name}: rel err {err}"


def test_bf16_score_storage_close_to_f32():
    """score_dtype=bf16 stores the [B,H,T,T] tensors in bf16 (HBM-bandwidth
    knob) while the softmax reductions stay f32 — values and all gradients
    must track the f32-storage path within bf16 rounding."""
    t = 128
    (q, k, v, gate, bias_rel), mask = make_inputs(t, seed=3, masked=True)
    jmask = jnp.asarray(mask)
    dense = dense_bias_from_rel(bias_rel, t)

    def loss(score_dtype, q, k, v, gate):
        o = gated_bias_attention(q, k, v, gate, dense, jmask,
                                 score_dtype=score_dtype)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    ref_o = gated_bias_attention(q, k, v, gate, dense, jmask)
    bf_o = gated_bias_attention(q, k, v, gate, dense, jmask,
                                score_dtype=jnp.bfloat16)
    assert bf_o.dtype == ref_o.dtype
    rel = np.abs(np.asarray(bf_o, np.float32) - np.asarray(ref_o)).max() / (
        np.abs(np.asarray(ref_o)).max() + 1e-6)
    assert rel < 2e-2, f"forward rel err {rel}"

    g_ref = jax.grad(lambda *a: loss(None, *a), argnums=(0, 1, 2, 3))(
        q, k, v, gate)
    g_bf = jax.grad(lambda *a: loss(jnp.bfloat16, *a), argnums=(0, 1, 2, 3))(
        q, k, v, gate)
    for name, a, b in zip(["dq", "dk", "dv", "dgate"], g_ref, g_bf):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 3e-2, f"{name}: rel err {rel}"


def test_score_dtype_none_bitwise_noop():
    """The default (score_dtype=None) must be bit-identical to the
    pre-knob implementation (plain f32 einsum+softmax oracle)."""
    t = 64
    (q, k, v, gate, bias_rel), _ = make_inputs(t, seed=4)
    dense = dense_bias_from_rel(bias_rel, t)
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(d)))
    scores = scores + gate[..., None] * dense[None]
    oracle = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v,
                        preferred_element_type=v.dtype)
    ours = gated_bias_attention(q, k, v, gate, dense)
    assert np.array_equal(np.asarray(ours), np.asarray(oracle))


def test_bf16_inputs():
    t = 64
    (q, k, v, gate, bias_rel), _ = make_inputs(t, seed=2)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = gated_bias_attention(qb, kb, vb, gate,
                               dense_bias_from_rel(bias_rel, t))
    ours = flash_gated_attention(qb, kb, vb, gate, bias_rel)
    err = np.abs(np.asarray(ours, np.float32) - np.asarray(ref, np.float32)).max()
    assert err < 3e-2  # bf16 tolerance


def test_model_parity_with_flash_flag():
    """WavLM forward with flash on == flash off (tiny config, CPU interp)."""
    from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32)
    )
    cfg_ref = WavLMConfig.tiny(layerdrop=0.0)
    model_ref = WavLMModel(cfg_ref)
    params = model_ref.init({"params": jax.random.PRNGKey(0)}, x)

    cfg_flash = WavLMConfig.tiny(layerdrop=0.0, use_flash_attention=True)
    model_flash = WavLMModel(cfg_flash)

    seq_ref, _ = model_ref.apply(params, x)
    seq_flash, _ = model_flash.apply(params, x)
    err = float(jnp.abs(seq_ref - seq_flash).max())
    assert err < 5e-4, err


def test_model_gradient_parity_with_flash_flag():
    """d(table) flows through the kernel's dbias_rel path — compare the
    full-model gradient (incl. the rel_attn_embed table) flash vs XLA."""
    from nrse_tpu.models.wavlm import WavLMConfig, WavLMModel

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 4000)).astype(np.float32)
    )
    cfg_ref = WavLMConfig.tiny(layerdrop=0.0)
    params = WavLMModel(cfg_ref).init({"params": jax.random.PRNGKey(0)}, x)

    def loss(params, cfg):
        _, pooled = WavLMModel(cfg).apply(params, x)
        return jnp.sum(pooled ** 2)

    g_ref = jax.grad(loss)(params, cfg_ref)
    g_flash = jax.grad(loss)(
        params, WavLMConfig.tiny(layerdrop=0.0, use_flash_attention=True))
    ref_leaves = jax.tree.leaves(g_ref)
    for a, b in zip(ref_leaves, jax.tree.leaves(g_flash)):
        a, b = np.asarray(a), np.asarray(b)
        # floor the denominator: leaves with analytically-zero gradients
        # (e.g. k_proj bias — softmax is invariant to per-row score shifts)
        # are pure roundoff in both implementations
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-3)
        assert err < 2e-3, err


def test_streaming_multiblock_path():
    """T > 512 exercises the blockwise streaming softmax (short T takes the
    single-block fast path)."""
    t = 640
    (q, k, v, gate, bias_rel), mask = make_inputs(t, seed=3, masked=True)
    jmask = jnp.asarray(mask)
    dense = dense_bias_from_rel(bias_rel, t)
    ref = gated_bias_attention(q, k, v, gate, dense, jmask)
    ours = flash_gated_attention(q, k, v, gate, bias_rel, jmask,
                                 block_q=128, block_k=128)
    err = np.abs(np.asarray(ours) - np.asarray(ref)).max()
    assert err < 3e-5, err

    def loss(q, k, v, gate, brel):
        o = flash_gated_attention(q, k, v, gate, brel, jmask,
                                  block_q=128, block_k=128)
        return jnp.sum(o * 0.001 * jnp.arange(o.size).reshape(o.shape))

    def loss_ref(q, k, v, gate, brel):
        o = gated_bias_attention(q, k, v, gate,
                                 dense_bias_from_rel(brel, t), jmask)
        return jnp.sum(o * 0.001 * jnp.arange(o.size).reshape(o.shape))

    g = jax.grad(loss, argnums=(0, 3, 4))(q, k, v, gate, bias_rel)
    gr = jax.grad(loss_ref, argnums=(0, 3, 4))(q, k, v, gate, bias_rel)
    for a, b in zip(g, gr):
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(b)).max() + 1e-6)
        assert err < 5e-4, err


def test_flash_tp_shard_map_parity():
    """Flash under a registered TP mesh (shard_map over heads on 'model')
    must match the unmapped kernel — forward AND gradients.  pallas_call is
    not auto-partitioned by GSPMD, so this wrap is the only correct flash
    behaviour when tpu.mesh model>1 (VERDICT r2 item 6)."""
    from nrse_tpu.parallel.mesh import make_mesh, set_flash_tp_mesh

    t, b4, h4 = 64, 4, 4
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b4, h4, t, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b4, h4, t, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b4, h4, t, D)).astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2.5, (b4, h4, t)).astype(np.float32))
    brel = jnp.asarray(rng.standard_normal((h4, 2 * t)).astype(np.float32))
    mask = np.ones((b4, t), np.int32)
    mask[1, t // 2:] = 0
    jmask = jnp.asarray(mask)

    def loss(q, k, v, gate, brel):
        o = flash_gated_attention(q, k, v, gate, brel, jmask,
                                  block_q=32, block_k=32)
        return jnp.sum(o * jnp.cos(0.01 * jnp.arange(o.size).reshape(o.shape)))

    ref_out = flash_gated_attention(q, k, v, gate, brel, jmask)
    ref_g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, gate, brel)

    mesh = make_mesh(data=2, model=4)
    set_flash_tp_mesh(mesh)
    try:
        tp_out = flash_gated_attention(q, k, v, gate, brel, jmask)
        tp_g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, gate, brel)
    finally:
        set_flash_tp_mesh(None)

    np.testing.assert_allclose(np.asarray(tp_out), np.asarray(ref_out),
                               atol=2e-5)
    for name, a, b in zip(("dq", "dk", "dv", "dgate", "dbrel"), ref_g, tp_g):
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(a)).max() + 1e-6)
        assert err < 5e-4, f"{name}: rel err {err}"


def test_flash_tp_indivisible_heads_raises():
    """A clear error (not silent replication) when heads don't divide the
    model axis."""
    from nrse_tpu.parallel.mesh import make_mesh, set_flash_tp_mesh

    (q, k, v, gate, brel), _ = make_inputs(64)  # H=3 heads
    mesh = make_mesh(data=2, model=4)
    set_flash_tp_mesh(mesh)
    try:
        with pytest.raises(ValueError, match="heads not divisible"):
            flash_gated_attention(q, k, v, gate, brel, None)
    finally:
        set_flash_tp_mesh(None)


def test_streamed_kv_path_matches_reference(monkeypatch):
    """The streamed-K/V kernels (k-dimension in the Pallas grid, scratch
    online-softmax state, per-(q,k)-block bias windows) must match the XLA
    reference exactly like the resident-K/V kernels.  They unlock T beyond
    the 16 MB scoped-VMEM wall (~T≈6k) where the resident kernels die;
    forced on here at small T via the threshold."""
    import nrse_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "STREAM_THRESHOLD", 256)
    t = 640
    (q, k, v, gate, bias_rel), mask = make_inputs(t, seed=9, masked=True)
    jmask = jnp.asarray(mask)
    dense = dense_bias_from_rel(bias_rel, t)
    ref = gated_bias_attention(q, k, v, gate, dense, jmask)
    ours = fa.flash_gated_attention(q, k, v, gate, bias_rel, jmask,
                                    block_q=128, block_k=128)
    err = np.abs(np.asarray(ours) - np.asarray(ref)).max()
    assert err < 3e-5, err

    def loss_ref(q, k, v, gate, brel):
        o = gated_bias_attention(q, k, v, gate,
                                 dense_bias_from_rel(brel, t), jmask)
        return jnp.sum(o * 0.001 * jnp.arange(o.size).reshape(o.shape))

    def loss_ours(q, k, v, gate, brel):
        o = fa.flash_gated_attention(q, k, v, gate, brel, jmask,
                                     block_q=128, block_k=128)
        return jnp.sum(o * 0.001 * jnp.arange(o.size).reshape(o.shape))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        q, k, v, gate, bias_rel)
    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2, 3, 4))(
        q, k, v, gate, bias_rel)
    for name, a, b in zip(("dq", "dk", "dv", "dgate", "dbrel"),
                          g_ref, g_ours):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert err < 5e-4, f"{name}: rel err {err}"
