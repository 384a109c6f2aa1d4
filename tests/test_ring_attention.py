"""Ring attention (sequence-parallel) vs exact SDPA on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from videopainter_tpu.ops.attention import sdpa
from videopainter_tpu.parallel import make_mesh
from videopainter_tpu.parallel.ring_attention import ring_attention


def test_ring_matches_exact():
    mesh = make_mesh(data=1, seq=8, model=1)
    B, H, S, D = 1, 2, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, S, D))
    v = jax.random.normal(ks[2], (B, H, S, D))
    ref = np.asarray(sdpa(q, k, v))

    spec = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks_, vs = (jax.device_put(x, spec) for x in (q, k, v))
    with mesh:
        out = ring_attention(qs, ks_, vs, mesh)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_ring_under_jit():
    mesh = make_mesh(data=1, seq=4, model=2)
    B, H, S, D = 2, 4, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, S, D))
    v = jax.random.normal(ks[2], (B, H, S, D))
    ref = np.asarray(sdpa(q, k, v))
    with mesh:
        f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))
        out = f(q, k, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_ring_joint_attention_matches_sdpa():
    """Joint [text||video] ring attention vs dense joint SDPA."""
    from jax.sharding import Mesh

    from videopainter_tpu.ops.attention import sdpa
    from videopainter_tpu.parallel.ring_attention import ring_joint_attention

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4, 1),
                ("data", "seq", "model"))
    B, H, St, Sv, D = 1, 2, 5, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    qt, kt, vt = (jax.random.normal(k, (B, H, St, D)) for k in ks[:3])
    qv, kv, vv = (jax.random.normal(k, (B, H, Sv, D)) for k in ks[3:])

    q = jnp.concatenate([qt, qv], axis=2)
    k = jnp.concatenate([kt, kv], axis=2)
    v = jnp.concatenate([vt, vv], axis=2)
    ref = sdpa(q, k, v)

    with mesh:
        out_t, out_v = jax.jit(lambda *a: ring_joint_attention(*a, mesh=mesh))(
            qt, qv, kt, kv, vt, vv)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref[:, :, :St]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref[:, :, St:]),
                               rtol=2e-5, atol=2e-5)


def test_ring_joint_attention_gradients():
    """Ring attention is differentiable (ppermute transposes cleanly):
    grads must match dense-SDPA autodiff."""
    from jax.sharding import Mesh

    from videopainter_tpu.ops.attention import sdpa
    from videopainter_tpu.parallel.ring_attention import ring_joint_attention

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4, 1),
                ("data", "seq", "model"))
    B, H, St, Sv, D = 1, 2, 3, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    qt, kt, vt = (jax.random.normal(k, (B, H, St, D)) for k in ks[:3])
    qv, kv, vv = (jax.random.normal(k, (B, H, Sv, D)) for k in ks[3:])

    def loss_ring(qv, kv, vv):
        t, v = ring_joint_attention(qt, qv, kt, kv, vt, vv, mesh)
        return jnp.sum(t ** 2) + jnp.sum(v ** 2)

    def loss_dense(qv, kv, vv):
        o = sdpa(jnp.concatenate([qt, qv], 2), jnp.concatenate([kt, kv], 2),
                 jnp.concatenate([vt, vv], 2))
        return jnp.sum(o ** 2)

    with mesh:
        gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qv, kv, vv)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(qv, kv, vv)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
