"""Explicit collectives tests on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from magcache_tpu.ops.attention import attention
from magcache_tpu.parallel.collectives import (
    all_to_all_switch,
    gather_sequence,
    split_sequence,
    ulysses_attention,
)
from magcache_tpu.parallel.mesh import build_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_all_to_all_switch_roundtrip():
    """T-shard -> S-shard -> T-shard reproduces the input (the DSP dynamic
    switch pair around temporal attention)."""
    mesh = build_mesh(dp=1, sp=4, tp=1)
    x = jnp.arange(4 * 8 * 16 * 6, dtype=jnp.float32).reshape(4, 8, 16, 6)
    x = jax.device_put(x, NamedSharding(mesh, P(None, "sp", None, None)))
    y = all_to_all_switch(x, mesh, scatter_dim=2, gather_dim=1)
    assert y.sharding.spec == P(None, None, "sp", None)
    z = all_to_all_switch(y, mesh, scatter_dim=1, gather_dim=2)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_split_gather_sequence():
    mesh = build_mesh(dp=1, sp=4, tp=1)
    x = jnp.ones((2, 16, 8))
    xs = split_sequence(jax.device_put(x), mesh)
    xg = gather_sequence(xs, mesh)
    np.testing.assert_array_equal(np.asarray(xg), np.asarray(x))


@pytest.mark.parametrize("kv_replicated", [False, True])
def test_ulysses_matches_single_device(kv_replicated):
    mesh = build_mesh(dp=1, sp=2, tp=2)
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 16, 4, 32
    skv = 8 if kv_replicated else s
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, skv, h, d)), jnp.float32)
    ref = attention(q, k, v, impl="xla")
    out = ulysses_attention(q, k, v, mesh, kv_replicated=kv_replicated)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_inside_jit():
    mesh = build_mesh(dp=2, sp=2, tp=2)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 8, 4, 16)), jnp.float32)

    @jax.jit
    def f(q):
        return ulysses_attention(q, q, q, mesh)

    ref = attention(q, q, q, impl="xla")
    np.testing.assert_allclose(np.asarray(f(q)), np.asarray(ref), atol=2e-5)


def test_ring_attention_matches_single_device():
    from magcache_tpu.parallel.collectives import ring_attention
    mesh = build_mesh(dp=1, sp=4, tp=2)
    rng = np.random.default_rng(5)
    b, s, h, d = 1, 32, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    ref = attention(q, k, v, impl="xla")
    out = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_aux_consistent():
    """(m, l) from the aux kernel reproduce the plain output and true softmax
    stats (interpret mode on CPU)."""
    from magcache_tpu.ops.attention import (
        _xla_attention_bhsd_aux,
        flash_attention_bhsd_aux,
    )
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(size=(1, 2, 128, 32)), jnp.float32)
    o_ref, m_ref, l_ref = _xla_attention_bhsd_aux(q, q, q, scale=32 ** -0.5)
    o, m, l = flash_attention_bhsd_aux(q, q, q, interpret=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), rtol=1e-5)
