"""Pallas attention kernel: parity vs the XLA reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.ops.attention import _xla_attention, dot_product_attention
from tsue_tpu.ops.flash import flash_attention

B, H, D = 2, 4, 64


def _inputs(tq, tk, key=0):
    ks = jax.random.split(jax.random.key(key), 3)
    q = jax.random.normal(ks[0], (B, tq, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, tk, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, tk, H, D), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("tq,tk", [(16, 16), (130, 130), (16, 48)])
@pytest.mark.parametrize("causal", [False, True])
def test_parity_full_mask(tq, tk, causal):
    q, k, v = _inputs(tq, tk)
    mask = jnp.ones((B, tk), jnp.int32)
    ours = flash_attention(q, k, v, mask, is_causal=causal, interpret=True)
    ref = _xla_attention(q, k, v, mask.astype(bool), causal, D ** -0.5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_parity_padded_keys():
    q, k, v = _inputs(32, 32, key=1)
    mask = jnp.asarray(np.concatenate(
        [np.ones((B, 20)), np.zeros((B, 12))], axis=1), jnp.int32)
    ours = flash_attention(q, k, v, mask, interpret=True)
    ref = _xla_attention(q, k, v, mask.astype(bool), False, D ** -0.5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # padded key content must not matter
    k2 = k.at[:, 20:].set(999.0)
    v2 = v.at[:, 20:].set(-999.0)
    ours2 = flash_attention(q, k2, v2, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ours2),
                               atol=2e-5, rtol=2e-5)


def test_bf16_inputs():
    q, k, v = _inputs(64, 64, key=2)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    mask = jnp.ones((B, 64), jnp.int32)
    ours = flash_attention(q, k, v, mask, is_causal=True, interpret=True)
    ref = _xla_attention(q, k, v, mask.astype(bool), True, D ** -0.5)
    assert ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_gradients_flow():
    q, k, v = _inputs(24, 24, key=3)
    mask = jnp.ones((B, 24), jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, is_causal=True,
                                       interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, mask.astype(bool), True,
                                      D ** -0.5) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_attention_impl_switch():
    from tsue_tpu.ops import attention as A
    q, k, v = _inputs(16, 16, key=4)
    ref = dot_product_attention(q, k, v, is_causal=True)
    A.set_attention_impl("pallas")
    try:
        ours = dot_product_attention(q, k, v, is_causal=True)
    finally:
        A.set_attention_impl("xla")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_single_query_row_decode_shape():
    """Tq=1 against a long cache — the KV-cached decode-step shape.
    Under "auto" this shape routes to XLA (kernel per-call overhead loses
    at one query row); the kernel remains reachable via an explicit
    TSUE_ATTENTION=pallas, so its Tq=1 output must still be correct: the
    q block (BQ=8) is larger than Tq and padded rows must be
    write-clipped without contaminating row 0."""
    from tsue_tpu.ops.attention import _xla_attention
    tk = 48
    q = jax.random.normal(jax.random.key(21), (B, 1, 8, D))
    k = jax.random.normal(jax.random.key(22), (B, tk, 2, D))
    v = jax.random.normal(jax.random.key(23), (B, tk, 2, D))
    mask = jnp.asarray(
        np.random.default_rng(3).random((B, tk)) > 0.25).astype(jnp.int32)
    out = flash_attention(q, k, v, mask, is_causal=False, interpret=True)
    ref = _xla_attention(q, k, v, mask.astype(bool), False, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_auto_impl_resolution():
    """Default "auto" resolves per-platform at trace time: XLA on CPU hosts
    (where Pallas would run interpreted), the flash kernel on accelerators.
    Explicit impls always resolve to themselves."""
    from tsue_tpu.ops import attention as A
    prev = A.get_attention_impl()
    try:
        A.set_attention_impl("auto")
        resolved = A.resolve_attention_impl()
        expect = "xla" if jax.devices()[0].platform == "cpu" else "pallas"
        assert resolved == expect
        with A.attention_impl("pallas"):
            assert A.resolve_attention_impl() == "pallas"
        assert A.resolve_attention_impl() == resolved
        A.set_attention_impl("xla")
        assert A.resolve_attention_impl() == "xla"
        # the entry point still computes correctly under auto
        A.set_attention_impl("auto")
        q, k, v = _inputs(16, 16, key=11)
        ref = _xla_attention(q, k, v, None, True, D ** -0.5)
        np.testing.assert_allclose(
            np.asarray(dot_product_attention(q, k, v, is_causal=True)),
            np.asarray(ref), atol=2e-5, rtol=2e-5)
    finally:
        A.set_attention_impl(prev)


def test_gqa_via_entrypoint():
    """dot_product_attention repeats KV heads before the kernel."""
    from tsue_tpu.ops import attention as A
    q = jax.random.normal(jax.random.key(5), (B, 16, 8, D))
    k = jax.random.normal(jax.random.key(6), (B, 16, 2, D))
    v = jax.random.normal(jax.random.key(7), (B, 16, 2, D))
    ref = dot_product_attention(q, k, v, is_causal=True)
    A.set_attention_impl("pallas")
    try:
        ours = dot_product_attention(q, k, v, is_causal=True)
    finally:
        A.set_attention_impl("xla")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


class TestGQAPath:
    """GQA-native XLA attention == explicit K/V repeat (float tolerance)."""

    @pytest.mark.parametrize("hkv", [1, 2, 4])
    def test_gqa_matches_repeat(self, hkv):
        rng = np.random.default_rng(0)
        tq, tk = 5, 9
        q = jnp.asarray(rng.standard_normal((B, tq, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, tk, hkv, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, tk, hkv, D)), jnp.float32)
        mask = jnp.asarray(rng.random((B, tk)) > 0.3)
        kr = jnp.repeat(k, H // hkv, axis=2)
        vr = jnp.repeat(v, H // hkv, axis=2)
        for causal in (False, True):
            ref = _xla_attention(q, kr, vr, mask, causal, D ** -0.5)
            out = _xla_attention(q, k, v, mask, causal, D ** -0.5)
            # same math; XLA may fuse the two graphs differently, so exact
            # bitwise equality is not guaranteed — pin to float tolerance
            np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                       atol=1e-5, rtol=1e-5)

    def test_gqa_dropout_same_randomness(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((B, 4, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, 6, 2, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, 6, 2, D)), jnp.float32)
        kr = jnp.repeat(k, H // 2, axis=2)
        vr = jnp.repeat(v, H // 2, axis=2)
        key = jax.random.key(7)
        ref = _xla_attention(q, kr, vr, None, False, D ** -0.5, 0.25, key)
        out = _xla_attention(q, k, v, None, False, D ** -0.5, 0.25, key)
        # identical dropout mask (same key, same (B,H,Tq,Tk) probs shape)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   atol=1e-5, rtol=1e-5)

    def test_gqa_grads_match(self):
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.standard_normal((B, 4, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, 6, 2, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, 6, 2, D)), jnp.float32)

        def loss_gqa(k, v):
            return jnp.sum(_xla_attention(q, k, v, None, True, D ** -0.5) ** 2)

        def loss_rep(k, v):
            kr = jnp.repeat(k, H // 2, axis=2)
            vr = jnp.repeat(v, H // 2, axis=2)
            return jnp.sum(_xla_attention(q, kr, vr, None, True,
                                          D ** -0.5) ** 2)

        gk1, gv1 = jax.grad(loss_gqa, argnums=(0, 1))(k, v)
        gk2, gv2 = jax.grad(loss_rep, argnums=(0, 1))(k, v)
        np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2),
                                   atol=1e-5, rtol=1e-5)


def _rope_angles(tq, d):
    pos = jnp.broadcast_to(jnp.arange(tq, dtype=jnp.float32), (B, tq))
    inv = 1.0 / (500000.0 ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = pos[..., None] * inv
    return jnp.cos(ang), jnp.sin(ang)


@pytest.mark.parametrize("hq,hkv", [(8, 2), (4, 4)])
@pytest.mark.parametrize("causal", [False, True])
def test_rope_in_kernel_parity(hq, hkv, causal):
    """rope=(cos,sin) inside the kernel == pre-applied rope + plain kernel
    (covers both the GQA-lane rope kernel and the folded-path fallback)."""
    from tsue_tpu.ops.flash import rope_bthd
    tq = 48
    ks = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(ks[0], (B, tq, hq, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, tq, hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, tq, hkv, D), jnp.float32)
    mask = (jnp.arange(tq)[None, :] < jnp.array([[tq], [tq - 9]])
            ).astype(jnp.int32)
    cos, sin = _rope_angles(tq, D)
    ours = flash_attention(q, k, v, mask, is_causal=causal,
                           rope=(cos, sin), interpret=True)
    ref = _xla_attention(rope_bthd(q, cos, sin), rope_bthd(k, cos, sin), v,
                         mask.astype(bool), causal, D ** -0.5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_rope_in_kernel_grads():
    from tsue_tpu.ops.flash import rope_bthd
    tq, hq, hkv = 24, 8, 2
    ks = jax.random.split(jax.random.key(12), 3)
    q = jax.random.normal(ks[0], (B, tq, hq, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, tq, hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, tq, hkv, D), jnp.float32)
    mask = jnp.ones((B, tq), jnp.int32)
    cos, sin = _rope_angles(tq, D)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, is_causal=True,
                                       rope=(cos, sin), interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(
            rope_bthd(q, cos, sin), rope_bthd(k, cos, sin), v,
            mask.astype(bool), True, D ** -0.5) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_rope_entrypoint_xla_matches_apply_rope():
    """dot_product_attention(rope=...) on the XLA path == models.llama
    apply_rope then attention — pins the bit-compat claim both paths rely
    on."""
    from tsue_tpu.models.llama import apply_rope
    tq, hq, hkv = 16, 8, 2
    ks = jax.random.split(jax.random.key(13), 3)
    q = jax.random.normal(ks[0], (B, tq, hq, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, tq, hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, tq, hkv, D), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(tq), (B, tq))
    inv = 1.0 / (500000.0 ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    ang = pos[..., None].astype(jnp.float32) * inv
    ours = dot_product_attention(q, k, v, is_causal=True,
                                 rope=(jnp.cos(ang), jnp.sin(ang)))
    ref = dot_product_attention(apply_rope(q, pos, inv),
                                apply_rope(k, pos, inv), v, is_causal=True)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_partial_edge_row_block(monkeypatch):
    """GT % block_rows != 0: the clipped edge block and the %Tq causal row
    mapping must stay exact (at real scale GT=2112 blocks at 1408)."""
    import tsue_tpu.ops.flash as flash

    monkeypatch.setattr(flash, "_block_q", lambda tq, tk: 64)
    tq = tk = 150  # 2 full 64-row blocks + 22-row edge
    ks = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(ks[0], (B, tq, 4, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, tk, 2, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, tk, 2, D), jnp.float32)
    mask = (jnp.arange(tk)[None, :] < jnp.array([[tk], [tk - 37]])
            ).astype(jnp.int32)
    ours = flash.flash_attention(q, k, v, mask, is_causal=True,
                                 interpret=True)
    ref = _xla_attention(q, k, v, mask.astype(bool), True, D ** -0.5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


class TestGSPMDPartitioning:
    """The kernel registers custom_partitioning rules (ops/flash.py
    _partitioned_fwd): batch and kv-heads shard freely (the Megatron TP
    dims), seq/head_dim/groups replicate — multi-chip meshes run the
    kernel per shard with no collectives inside attention."""

    def _mesh(self, dp, tp):
        from jax.sharding import Mesh
        return Mesh(np.asarray(jax.devices()).reshape(dp, tp),
                    ("data", "model"))

    def test_sharded_bitwise_and_no_allgather(self):
        import re
        from jax.sharding import NamedSharding, PartitionSpec as P
        hq, hkv = 8, 2
        ks = jax.random.split(jax.random.key(3), 3)
        q = jax.random.normal(ks[0], (8, 32, hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (8, 32, hkv, D), jnp.float32)
        v = jax.random.normal(ks[2], (8, 32, hkv, D), jnp.float32)
        mask = jnp.ones((8, 32), jnp.int32)
        ref = flash_attention(q, k, v, mask, is_causal=True,
                              interpret=True)
        mesh = self._mesh(4, 2)
        sh = NamedSharding(mesh, P("data", None, "model", None))
        f = jax.jit(lambda *a: flash_attention(*a, is_causal=True,
                                               interpret=True))
        args = (jax.device_put(q, sh), jax.device_put(k, sh),
                jax.device_put(v, sh),
                jax.device_put(mask, NamedSharding(mesh, P("data", None))))
        out = f(*args)
        assert out.sharding.spec[0] == "data"
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        hlo = f.lower(*args).compile().as_text()
        assert not re.findall(r"all-gather", hlo), \
            "attention operands were gathered — partitioning rules lost"

    def test_indivisible_head_split_falls_back(self):
        """model axis (4) not dividing Hkv (2): the sanitizer drops the
        head sharding (the partitioner reshards) — correct output, just
        not head-parallel."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        hq, hkv = 4, 2
        ks = jax.random.split(jax.random.key(4), 3)
        q = jax.random.normal(ks[0], (8, 16, hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (8, 16, hkv, D), jnp.float32)
        v = jax.random.normal(ks[2], (8, 16, hkv, D), jnp.float32)
        mask = jnp.ones((8, 16), jnp.int32)
        ref = flash_attention(q, k, v, mask, interpret=True)
        mesh = self._mesh(2, 4)
        qsh = NamedSharding(mesh, P("data", None, "model", None))
        kvsh = NamedSharding(mesh, P("data", None, None, None))
        out = jax.jit(lambda *a: flash_attention(*a, interpret=True))(
            jax.device_put(q, qsh), jax.device_put(k, kvsh),
            jax.device_put(v, kvsh),
            jax.device_put(mask, NamedSharding(mesh, P("data", None))))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_sharded_grads_match(self):
        """vjp through the sharded kernel == unsharded grads (the
        backward is the XLA formulation, partitioned by GSPMD itself)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        hq, hkv = 8, 2
        ks = jax.random.split(jax.random.key(5), 3)
        q = jax.random.normal(ks[0], (8, 16, hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (8, 16, hkv, D), jnp.float32)
        v = jax.random.normal(ks[2], (8, 16, hkv, D), jnp.float32)
        mask = jnp.ones((8, 16), jnp.int32)

        def loss(q_, k_, v_):
            return flash_attention(q_, k_, v_, mask, is_causal=True,
                                   interpret=True).sum()

        ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        mesh = self._mesh(4, 2)
        sh = NamedSharding(mesh, P("data", None, "model", None))
        got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
            jax.device_put(q, sh), jax.device_put(k, sh),
            jax.device_put(v, sh))
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-5, rtol=1e-5)

    def test_rope_sharded_parity(self):
        """The in-kernel rope variant partitions too (cos/sin replicate
        over heads, shard over batch)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        hq, hkv, t = 8, 2, 32
        ks = jax.random.split(jax.random.key(6), 5)
        q = jax.random.normal(ks[0], (8, t, hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (8, t, hkv, D), jnp.float32)
        v = jax.random.normal(ks[2], (8, t, hkv, D), jnp.float32)
        mask = jnp.ones((8, t), jnp.int32)
        ang = jax.random.uniform(ks[3], (8, t, D // 2), jnp.float32)
        rope = (jnp.cos(ang), jnp.sin(ang))
        ref = flash_attention(q, k, v, mask, is_causal=True, rope=rope,
                              interpret=True)
        mesh = self._mesh(4, 2)
        sh = NamedSharding(mesh, P("data", None, "model", None))
        bsh = NamedSharding(mesh, P("data"))
        out = jax.jit(lambda qq, kk, vv, mm, c, s: flash_attention(
            qq, kk, vv, mm, is_causal=True, rope=(c, s), interpret=True))(
            jax.device_put(q, sh), jax.device_put(k, sh),
            jax.device_put(v, sh), jax.device_put(mask, bsh),
            jax.device_put(rope[0], bsh), jax.device_put(rope[1], bsh))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
