"""Flash / chunked attention vs exact SDPA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videopainter_tpu.ops.attention import sdpa
from videopainter_tpu.ops.flash_attention import chunked_attention, flash_attention


def make_qkv(s_q=300, s_k=300, b=2, h=2, d=16, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (b, h, s_q, d))
    k = jax.random.normal(k2, (b, h, s_k, d))
    v = jax.random.normal(k3, (b, h, s_k, d))
    return q, k, v


@pytest.mark.parametrize("s_q,s_k", [(300, 300), (256, 512), (129, 700)])
def test_chunked_matches_exact(s_q, s_k):
    q, k, v = make_qkv(s_q, s_k)
    ref = sdpa(q, k, v)
    out = chunked_attention(q, k, v, chunk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_chunked_gradients():
    q, k, v = make_qkv(96, 160, d=8)

    def loss_exact(q, k, v):
        return jnp.sum(sdpa(q, k, v) ** 2)

    def loss_chunk(q, k, v):
        return jnp.sum(chunked_attention(q, k, v, chunk=64) ** 2)

    g_ref = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_chunk, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("s_q,s_k", [(256, 512), (300, 300), (129, 1111)])
def test_flash_matches_exact_interpret(s_q, s_k):
    """Pallas kernel in interpret mode on CPU (real-TPU run covered by bench)."""
    q, k, v = make_qkv(s_q, s_k)
    ref = sdpa(q, k, v)
    with jax.disable_jit(False):
        from jax.experimental import pallas as pl  # noqa: F401
        import videopainter_tpu.ops.flash_attention as fa

        # interpret mode: monkeypatch pallas_call via force interpret env
        with jax.experimental.pallas.tpu.force_tpu_interpret_mode() if hasattr(
                jax.experimental.pallas, "tpu") else _null():
            out = fa.flash_attention(q, k, v, blk_q=128, blk_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_fused_qkv_matches():
    """Fused to_qkv must bit-match separate projections."""
    import jax

    from videopainter_tpu.ops.attention import (fuse_qkv, init_attention,
                                                joint_attention)

    p = init_attention(jax.random.PRNGKey(0), 32, num_heads=2)
    p = jax.tree.map(lambda x: x + 0.01, p)  # nonzero biases
    h = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 32))
    e = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 32))
    ref_h, ref_e = joint_attention(p, h, e, num_heads=2)
    pf = fuse_qkv(p)
    out_h, out_e = joint_attention(pf, h, e, num_heads=2)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(ref_e),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("s_q,s_k", [(256, 256), (300, 300), (129, 520)])
def test_flash_gradients_interpret(s_q, s_k):
    """Pallas backward kernels vs autodiff through exact SDPA (interpret)."""
    q, k, v = make_qkv(s_q, s_k, d=16)

    def loss_exact(q, k, v):
        return jnp.sum(sdpa(q, k, v) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, blk_q=128, blk_k=128,
                                       bwd_blk_k=128) ** 2)

    g_ref = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
    with jax.experimental.pallas.tpu.force_tpu_interpret_mode() if hasattr(
            jax.experimental.pallas, "tpu") else _null():
        g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5, err_msg=f"d{name}")


def test_flash_with_lse_interpret():
    """(out, lse) contract used by ring attention: lse must equal the
    logsumexp of scaled scores."""
    import jax

    from videopainter_tpu.ops.flash_attention import flash_attention_with_lse

    q, k, v = make_qkv(200, 300, d=16)
    scale = 16 ** -0.5
    with jax.experimental.pallas.tpu.force_tpu_interpret_mode() if hasattr(
            jax.experimental.pallas, "tpu") else _null():
        out, lse = flash_attention_with_lse(q, k, v, blk_q=128, blk_k=128)
    ref = sdpa(q, k, v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    ref_lse = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               rtol=1e-5, atol=1e-5)


def test_flash_resample_and_prev_paths_match_exact():
    """use_flash=True must match the exact-SDPA processors for the ID-resample
    and prev-clip blend variants (flash over concatenated KV / two flash
    calls) — at 17.8k tokens the exact score matrix cannot materialize, so
    these paths are what the any-length ID pipelines run on-chip."""
    from jax.experimental.pallas import tpu as pltpu

    from videopainter_tpu.ops.attention import init_attention, joint_attention

    p = init_attention(jax.random.PRNGKey(0), 32, num_heads=2)
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 32))
    e = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 32))
    mask = jax.random.uniform(jax.random.PRNGKey(3), (2, 29)) > 0.5
    prev = jax.random.normal(jax.random.PRNGKey(4), (2, 29, 32))
    pmask = jax.random.uniform(jax.random.PRNGKey(5), (2, 29)) > 0.5

    cases = [
        dict(resample_mask=mask),
        dict(prev_hidden_states=prev, prev_clip_weight=0.3),
        dict(prev_hidden_states=prev, prev_clip_weight=0.4,
             prev_resample_mask=pmask),
    ]
    for kw in cases:
        ref_h, ref_e = joint_attention(p, h, e, num_heads=2, **kw)
        with pltpu.force_tpu_interpret_mode():
            out_h, out_e = joint_attention(p, h, e, num_heads=2,
                                           use_flash=True, **kw)
        np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h),
                                   rtol=3e-5, atol=3e-5, err_msg=str(kw.keys()))
        np.testing.assert_allclose(np.asarray(out_e), np.asarray(ref_e),
                                   rtol=3e-5, atol=3e-5, err_msg=str(kw.keys()))


@pytest.mark.parametrize("s_q,s_k,int8_pv", [(256, 512, False), (300, 300, False),
                                             (300, 300, True), (129, 1111, False)])
def test_flash_int8_close_to_exact(s_q, s_k, int8_pv):
    """int8-QK^T (SageAttention-style) kernel: per-head quantization error only
    — must track exact SDPA to ~1% relative L1 on gaussian data at the
    production head_dim (noise scales ~1/sqrt(d); d=16 would need 2-3%)."""
    from videopainter_tpu.ops.flash_attention_int8 import flash_attention_int8

    q, k, v = make_qkv(s_q, s_k, d=64)
    # non-zero K common mode exercises the (exact) mean-centering path
    k = k + 0.7
    ref = np.asarray(sdpa(q, k, v))
    with jax.experimental.pallas.tpu.force_tpu_interpret_mode() if hasattr(
            jax.experimental.pallas, "tpu") else _null():
        out = np.asarray(flash_attention_int8(q, k, v, blk_q=128, blk_k=128,
                                              int8_pv=int8_pv))
    # int8's information floor on gaussian data is ~1.2% rel-L1 vs exact f32
    # (uniform step max/127 -> ~1% per-value noise; softmax averaging over
    # hundreds of keys shrinks |ref| but not the noise). Real quality is
    # gated at pipeline level (PSNR vs bf16-flash, tools/smoke + bench).
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < (0.035 if int8_pv else 0.025), rel
    cos = (out.ravel() @ ref.ravel()) / (
        np.linalg.norm(out) * np.linalg.norm(ref) + 1e-9)
    assert cos > 0.999, cos


def test_flash_int8_grad_raises():
    """int8 flash is inference-only: autodiff must fail loudly, not silently
    return zero gradients through the quantization round."""
    from jax.experimental.pallas import tpu as pltpu

    from videopainter_tpu.ops.flash_attention_int8 import flash_attention_int8

    q = jnp.zeros((1, 2, 128, 64))
    with pltpu.force_tpu_interpret_mode():
        with pytest.raises(NotImplementedError):
            jax.grad(lambda x: jnp.sum(
                flash_attention_int8(x, x, x, blk_q=128, blk_k=128)))(q)


@pytest.mark.parametrize("mode", ["int8", "int8pv"])
def test_int8_attention_routes_all_processor_variants(mode):
    """use_flash="int8"/"int8pv" must route every processor variant (base,
    ID-resample, prev-clip blend, combined) through the int8 kernel with only
    quantization noise vs the exact path (cos similarity; exact parity is the
    bf16 kernel's job — test above)."""
    from jax.experimental.pallas import tpu as pltpu

    from videopainter_tpu.ops.attention import init_attention, joint_attention

    p = init_attention(jax.random.PRNGKey(0), 32, num_heads=2)
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 32))
    e = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 32))
    mask = jax.random.uniform(jax.random.PRNGKey(3), (2, 29)) > 0.5
    prev = jax.random.normal(jax.random.PRNGKey(4), (2, 29, 32))
    pmask = jax.random.uniform(jax.random.PRNGKey(5), (2, 29)) > 0.5

    cases = [
        dict(),
        dict(resample_mask=mask),
        dict(prev_hidden_states=prev, prev_clip_weight=0.3),
        dict(prev_hidden_states=prev, prev_clip_weight=0.4,
             prev_resample_mask=pmask),
    ]
    for kw in cases:
        ref_h, ref_e = joint_attention(p, h, e, num_heads=2, **kw)
        with pltpu.force_tpu_interpret_mode():
            out_h, out_e = joint_attention(p, h, e, num_heads=2,
                                           use_flash=mode, **kw)
        for o, r in ((out_h, ref_h), (out_e, ref_e)):
            o, r = np.asarray(o), np.asarray(r)
            assert o.shape == r.shape
            cos = (o.ravel() @ r.ravel()) / (
                np.linalg.norm(o) * np.linalg.norm(r) + 1e-9)
            assert cos > 0.995, (kw.keys(), cos)


@pytest.mark.parametrize("s", [199, 300])
def test_flash_kv_len_prepadded_matches(s):
    """Resident padded-sequence contract: flash over PRE-padded q/k/v with
    kv_len=s must bit-match flash over the unpadded arrays — the kernel masks
    keys past kv_len exactly as its own padding would, garbage in the k/v
    tail never reaches a real query row, and garbage q rows only affect
    their own (discarded) outputs."""
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = make_qkv(s, s, d=16)
    sp = 512  # multiple of both blocks below
    pad = sp - s
    trash = 37.0  # non-zero garbage: proves masking, not zero-luck
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=trash)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=trash)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=trash)
    with pltpu.force_tpu_interpret_mode():
        ref = flash_attention(q, k, v, blk_q=128, blk_k=128)
        out = flash_attention(qp, kp, vp, blk_q=128, blk_k=128,
                              kv_len=s)[:, :, :s]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_flash_kv_len_gradients():
    """Backward through the kv_len path: real-position grads match exact
    SDPA; padded-tail k/v grads are exactly zero (masked keys contribute
    nothing)."""
    from jax.experimental.pallas import tpu as pltpu

    s, sp = 129, 256
    q, k, v = make_qkv(s, s, d=16)
    pad = sp - s

    def loss_exact(q, k, v):
        return jnp.sum(sdpa(q, k, v) ** 2)

    def loss_flash_padded(qp, kp, vp):
        out = flash_attention(qp, kp, vp, blk_q=128, blk_k=128,
                              bwd_blk_k=128, kv_len=s)[:, :, :s]
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=3.0)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=3.0)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=3.0)
    with pltpu.force_tpu_interpret_mode():
        g_out = jax.grad(loss_flash_padded, argnums=(0, 1, 2))(qp, kp, vp)
    for name, a, b in zip("qkv", g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a[:, :, :s]), np.asarray(b),
                                   rtol=3e-4, atol=3e-5, err_msg=f"d{name}")
    # tail: dq rows are garbage-query grads (sliced off upstream by the pad
    # VJP in real use); dk/dv tails MUST be zero — those keys are masked
    np.testing.assert_array_equal(np.asarray(g_out[1][:, :, s:]), 0.0)
    np.testing.assert_array_equal(np.asarray(g_out[2][:, :, s:]), 0.0)


def test_flash_int8_kv_len_prepadded_close():
    """int8 kernel with pre-padded inputs + kv_len: tracks the unpadded int8
    call closely (not bitwise — the K mean and last-block scales see the
    tail rows) and stays within the int8 band of exact SDPA."""
    from jax.experimental.pallas import tpu as pltpu

    from videopainter_tpu.ops.flash_attention_int8 import flash_attention_int8

    s, sp = 300, 512
    q, k, v = make_qkv(s, s, d=64)
    pad = sp - s
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=1.5)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=1.5)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=1.5)
    ref = np.asarray(sdpa(q, k, v))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_attention_int8(qp, kp, vp, blk_q=128,
                                              blk_k=128, kv_len=s))[:, :, :s]
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.025, rel


@pytest.mark.parametrize("s,page,blk_k", [(100, 128, 128), (100, 192, 128),
                                          (300, 384, 512)])
def test_flash_kv_paged_matches(s, page, blk_k):
    """Paged KV validity ((i % page) < kv_len, capped at the true concat
    length): flash over K built as two pre-padded pages must match exact SDPA
    over the two truncated pages. Cases cover a block-aligned page, a page
    boundary inside a K block, and a padded tail past the concat length
    (where the modulo would alias into valid offsets without the cap)."""
    from jax.experimental.pallas import tpu as pltpu

    q, k1, v1 = make_qkv(s, s, d=16, seed=0)
    _, k2, v2 = make_qkv(s, s, d=16, seed=1)
    ref = sdpa(q[:, :, :s], jnp.concatenate([k1, k2], axis=2),
               jnp.concatenate([v1, v2], axis=2))

    trash = 5.0
    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, page - s), (0, 0)),
                            constant_values=trash)
    qp = pad(q)
    kp = jnp.concatenate([pad(k1), pad(k2)], axis=2)
    vp = jnp.concatenate([pad(v1), pad(v2)], axis=2)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(qp, kp, vp, blk_q=128, blk_k=blk_k,
                              kv_len=s, kv_page_len=page)[:, :, :s]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_kv_paged_gradients():
    """Backward through the paged mask: real-position grads match exact SDPA
    over the truncated pages; both pages' padded-tail dk/dv are exactly
    zero."""
    from jax.experimental.pallas import tpu as pltpu

    s, page = 100, 128
    q, k1, v1 = make_qkv(s, s, d=16, seed=2)
    _, k2, v2 = make_qkv(s, s, d=16, seed=3)

    def loss_exact(q, k1, k2, v1, v2):
        return jnp.sum(sdpa(q, jnp.concatenate([k1, k2], axis=2),
                            jnp.concatenate([v1, v2], axis=2)) ** 2)

    def loss_paged(qp, kp, vp):
        out = flash_attention(qp, kp, vp, blk_q=128, blk_k=128,
                              bwd_blk_k=128, kv_len=s,
                              kv_page_len=page)[:, :, :s]
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_exact, argnums=(0, 1, 2, 3, 4))(q, k1, k2, v1, v2)
    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, page - s), (0, 0)),
                            constant_values=2.0)
    qp = pad(q)
    kp = jnp.concatenate([pad(k1), pad(k2)], axis=2)
    vp = jnp.concatenate([pad(v1), pad(v2)], axis=2)
    with pltpu.force_tpu_interpret_mode():
        gq, gk, gv = jax.grad(loss_paged, argnums=(0, 1, 2))(qp, kp, vp)
    np.testing.assert_allclose(np.asarray(gq[:, :, :s]), np.asarray(g_ref[0]),
                               rtol=3e-4, atol=3e-5)
    for pi, (dk_ref, dv_ref) in enumerate([(g_ref[1], g_ref[3]),
                                           (g_ref[2], g_ref[4])]):
        lo = pi * page
        np.testing.assert_allclose(np.asarray(gk[:, :, lo:lo + s]),
                                   np.asarray(dk_ref), rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(gv[:, :, lo:lo + s]),
                                   np.asarray(dv_ref), rtol=3e-4, atol=3e-5)
        np.testing.assert_array_equal(
            np.asarray(gk[:, :, lo + s:lo + page]), 0.0)
        np.testing.assert_array_equal(
            np.asarray(gv[:, :, lo + s:lo + page]), 0.0)


def test_flash_int8_kv_paged_close():
    """int8 kernel with the paged mask stays in the int8 band of exact SDPA
    over the truncated pages."""
    from jax.experimental.pallas import tpu as pltpu

    from videopainter_tpu.ops.flash_attention_int8 import flash_attention_int8

    s, page = 300, 384
    q, k1, v1 = make_qkv(s, s, d=64, seed=4)
    _, k2, v2 = make_qkv(s, s, d=64, seed=5)
    ref = np.asarray(sdpa(q, jnp.concatenate([k1, k2], axis=2),
                          jnp.concatenate([v1, v2], axis=2)))
    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, page - s), (0, 0)),
                            constant_values=1.5)
    qp = pad(q)
    kp = jnp.concatenate([pad(k1), pad(k2)], axis=2)
    vp = jnp.concatenate([pad(v1), pad(v2)], axis=2)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_attention_int8(qp, kp, vp, blk_q=128,
                                              blk_k=128, kv_len=s,
                                              kv_page_len=page))[:, :, :s]
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.03, rel


def test_attention_variants_resident_padded():
    """joint_attention with kv_valid_len (resident padded sequence) must match
    the exact unpadded processors for the ID-resample, prev-resample, and
    prev-clip blend variants — the paths the flagship any-length pipeline
    runs every window."""
    from jax.experimental.pallas import tpu as pltpu

    from videopainter_tpu.ops.attention import init_attention, joint_attention

    p = init_attention(jax.random.PRNGKey(0), 32, num_heads=2)
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 32))
    e = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 32))
    mask = jax.random.uniform(jax.random.PRNGKey(3), (2, 29)) > 0.5
    prev = jax.random.normal(jax.random.PRNGKey(4), (2, 29, 32))
    pmask = jax.random.uniform(jax.random.PRNGKey(5), (2, 29)) > 0.5

    s_joint, s_pad = 29, 64
    pad_tokens = lambda x: jnp.pad(
        x, ((0, 0), (0, s_pad - s_joint), (0, 0)), constant_values=2.5)
    pad_mask = lambda m: jnp.pad(m, ((0, 0), (0, s_pad - s_joint)))
    hp = pad_tokens(h)  # video segment carries the joint pad tail

    cases = [
        (dict(resample_mask=mask), dict(resample_mask=pad_mask(mask))),
        (dict(prev_hidden_states=prev, prev_clip_weight=0.3),
         dict(prev_hidden_states=pad_tokens(prev), prev_clip_weight=0.3)),
        (dict(prev_hidden_states=prev, prev_clip_weight=0.4,
              prev_resample_mask=pmask),
         dict(prev_hidden_states=pad_tokens(prev), prev_clip_weight=0.4,
              prev_resample_mask=pad_mask(pmask))),
    ]
    for kw_ref, kw_pad in cases:
        ref_h, ref_e = joint_attention(p, h, e, num_heads=2, **kw_ref)
        with pltpu.force_tpu_interpret_mode():
            out_h, out_e = joint_attention(p, hp, e, num_heads=2,
                                           use_flash=True,
                                           kv_valid_len=s_joint, **kw_pad)
        np.testing.assert_allclose(np.asarray(out_h[:, :24]),
                                   np.asarray(ref_h), rtol=3e-5, atol=3e-5,
                                   err_msg=str(kw_ref.keys()))
        np.testing.assert_allclose(np.asarray(out_e), np.asarray(ref_e),
                                   rtol=3e-5, atol=3e-5,
                                   err_msg=str(kw_ref.keys()))
