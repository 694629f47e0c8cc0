"""fused_pool_train (ops/fused_pool_train.py): value + gradient parity
against the unfused composition Dense -> masked train-mode BatchNorm ->
relu -> masked segment_max (the pool head of nn/model.py /
nn/yolat_pp.py), in Pallas interpret mode on CPU.

The fused op computes BN batch moments in closed form from the Gram
matrix and streams the backward through one kernel; parity here pins
value, batch stats, and EVERY gradient (x, W, b, gamma, beta) against
jax.grad of the reference composition under a shared random cotangent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.ops.fused_pool_train import (BN_EPS, fused_pool_available,
                                            fused_pool_train)
from yolat_tpu.ops.segment import POOL_BLOCK, pool_plan, segment_max


def _setup(seed=0, n=1024, ci=128, h=256, empty_last=False):
    rng = np.random.default_rng(seed)
    # 8-aligned contiguous proposal runs (the CompactFile pack contract)
    lens = []
    left = n
    while left > 0:
        take = min(int(rng.integers(1, 7)) * POOL_BLOCK, left)
        lens.append(take)
        left -= take
    seg = np.repeat(np.arange(len(lens)), lens).astype(np.int32)
    n_prop = len(lens)
    plan = pool_plan(seg, n_prop, cap=0)
    mask = rng.random(n) > 0.15
    if empty_last:
        mask[seg == n_prop - 1] = False  # a fully-masked proposal
    x = rng.normal(size=(n, ci)).astype(np.float32)
    w = (rng.normal(size=(ci, h)) / np.sqrt(ci)).astype(np.float32)
    b = rng.normal(size=h).astype(np.float32) * 0.1
    gamma = (1.0 + 0.2 * rng.normal(size=h)).astype(np.float32)
    beta = rng.normal(size=h).astype(np.float32) * 0.1
    cot = rng.normal(size=(n_prop, h)).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(mask), jnp.asarray(w),
            jnp.asarray(b), jnp.asarray(gamma), jnp.asarray(beta),
            jnp.asarray(seg), plan, n_prop, jnp.asarray(cot))


def _reference(x, mask, w, b, gamma, beta, seg, plan, n_prop):
    """The unfused composition with MaskedBatchNorm's exact train math."""
    z = x @ w + b
    zf = z.astype(jnp.float32)
    m = mask.astype(jnp.float32)[:, None]
    count = jnp.maximum(m.sum(), 1.0)
    mean = (zf * m).sum(axis=0) / count
    var = jnp.maximum((zf * zf * m).sum(axis=0) / count - mean * mean, 0.0)
    y = (zf - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta
    a = jnp.maximum(y, 0.0).astype(x.dtype)
    pooled = segment_max(a, seg, n_prop, mask=mask, indices_are_sorted=True,
                         plan=(jnp.asarray(plan["pool_blk_first"]),
                               jnp.asarray(plan["pool_blk_full"]),
                               jnp.asarray(plan["pool_bnd_rows"]),
                               jnp.asarray(plan["pool_bnd_seg"]),
                               jnp.asarray(plan["pool_bnd_mask"])))
    return pooled, mean, var


@pytest.mark.parametrize("empty_last", [False, True])
def test_value_and_stats_parity(empty_last):
    x, mask, w, b, gamma, beta, seg, plan, n_prop, _ = _setup(
        seed=3, empty_last=empty_last)
    blk_first = jnp.asarray(plan["pool_blk_first"])
    maskf = mask.astype(jnp.float32)[:, None]
    pooled, mean, var, cnt = fused_pool_train(
        x, maskf, w, b, gamma, beta, blk_first, n_prop, True)
    want, wmean, wvar = _reference(x, mask, w, b, gamma, beta, seg, plan,
                                   n_prop)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(wmean),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(wvar),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    if empty_last:
        assert np.all(np.asarray(pooled)[-1] == 0.0)


@pytest.mark.parametrize("empty_last", [False, True])
def test_gradient_parity(empty_last):
    x, mask, w, b, gamma, beta, seg, plan, n_prop, cot = _setup(
        seed=7, empty_last=empty_last)
    blk_first = jnp.asarray(plan["pool_blk_first"])
    maskf = mask.astype(jnp.float32)[:, None]

    def loss_fused(x, w, b, gamma, beta):
        pooled, _, _, _ = fused_pool_train(x, maskf, w, b, gamma, beta,
                                           blk_first, n_prop, True)
        return jnp.sum(pooled * cot)

    def loss_ref(x, w, b, gamma, beta):
        pooled, _, _ = _reference(x, mask, w, b, gamma, beta, seg, plan,
                                  n_prop)
        return jnp.sum(pooled * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, b, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, b, gamma, beta)
    names = ("dx", "dW", "db", "dgamma", "dbeta")
    for name, a, want in zip(names, gf, gr):
        a, want = np.asarray(a), np.asarray(want)
        # db is structurally ZERO (a Dense bias is absorbed by the BN mean
        # shift), so both routes emit ~1e-6 accumulation noise there — the
        # absolute floor keeps the compare meaningful for such terms
        scale = max(np.abs(want).max(), 1e-3)
        np.testing.assert_allclose(a, want, rtol=2e-3,
                                   atol=max(2e-3 * scale, 1e-4),
                                   err_msg=name)


def test_bf16_close():
    """bf16 activations: pooled values track the f32 fused op closely
    (stats stay f32 via the Gram accumulation) and grads stay finite."""
    x, mask, w, b, gamma, beta, seg, plan, n_prop, cot = _setup(seed=11)
    blk_first = jnp.asarray(plan["pool_blk_first"])
    maskf = mask.astype(jnp.float32)[:, None]
    p32, m32, v32, _ = fused_pool_train(x, maskf, w, b, gamma, beta,
                                        blk_first, n_prop, True)
    p16, m16, v16, _ = fused_pool_train(
        x.astype(jnp.bfloat16), maskf, w.astype(jnp.bfloat16), b, gamma,
        beta, blk_first, n_prop, True)
    np.testing.assert_allclose(np.asarray(m16), np.asarray(m32), rtol=2e-2,
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(p16, np.float32), np.asarray(p32),
                               rtol=5e-2, atol=5e-2)

    def loss16(w):
        pooled, _, _, _ = fused_pool_train(
            x.astype(jnp.bfloat16), maskf, w.astype(jnp.bfloat16), b, gamma,
            beta, blk_first, n_prop, True)
        return jnp.sum(pooled.astype(jnp.float32) * cot)

    def loss16_ref(w):
        """bf16 unfused composition: fusion stored in bf16 before the max,
        so winner detection happens at bf16 — the same tie semantics the
        fused backward must reproduce (a bf16-winner bug here once read
        +3% from gradients that were silently near-empty)."""
        xm16 = (x.astype(jnp.bfloat16)
                * maskf.astype(jnp.bfloat16))
        z = xm16 @ w.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)
        zf = z.astype(jnp.float32)
        m = maskf
        count = jnp.maximum(m.sum(), 1.0)
        mean = (zf * m).sum(axis=0) / count
        var = jnp.maximum((zf * zf * m).sum(axis=0) / count - mean * mean,
                          0.0)
        y = (zf - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta
        a = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
        pooled = segment_max(a, seg, n_prop, mask=mask,
                             indices_are_sorted=True)
        return jnp.sum(pooled.astype(jnp.float32) * cot)

    g = np.asarray(jax.grad(loss16)(w), np.float32)
    gr = np.asarray(jax.grad(loss16_ref)(w), np.float32)
    assert np.isfinite(g).all()
    # the gradient must carry real winner signal, not just BN corrections:
    # direction and magnitude agree with the bf16 composition
    denom = np.linalg.norm(g) * np.linalg.norm(gr)
    cos = float((g * gr).sum() / max(denom, 1e-9))
    assert cos > 0.98, cos
    assert 0.8 < np.linalg.norm(g) / max(np.linalg.norm(gr), 1e-9) < 1.25


def test_available_predicate():
    x, mask, w, b, gamma, beta, seg, plan, n_prop, _ = _setup(seed=5)
    p = (jnp.asarray(plan["pool_blk_first"]), jnp.asarray(plan["pool_blk_full"]),
         jnp.asarray(plan["pool_bnd_rows"]), jnp.asarray(plan["pool_bnd_seg"]),
         jnp.asarray(plan["pool_bnd_mask"]))
    assert fused_pool_available({"pos": np.zeros((1024, 2))}, p)
    assert not fused_pool_available({"pos": np.zeros((1000, 2))}, p)
    assert not fused_pool_available({"pos": np.zeros((1024, 2))}, None)


class TestModelIntegration:
    """cfg.fused_head_train end to end: identical param trees, matching
    logits / grads / BN running stats between the fused and unfused pool
    heads, for both archs, on a real packed toy batch."""

    @pytest.mark.parametrize("arch", ["centernet3cc_rpn_gp_iter2",
                                      "yolat_pp"])
    def test_fused_head_matches_unfused(self, arch):
        from yolat_tpu.data.packing import finalize_batch
        from yolat_tpu.data.toy import random_packed_batch
        from yolat_tpu.ops.segment import plan_of
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.loop import build_model

        batch_np, _ = random_packed_batch(seed=21, n_images=16)
        jb = finalize_batch(jax.tree.map(jnp.asarray, dict(batch_np)))
        assert fused_pool_available({"pos": jb["pos"]}, plan_of(jb))

        cfg_a = Config(n_classes=17, arch=arch, data_aug=False)
        cfg_b = cfg_a.replace(fused_head_train=True)
        m_a = build_model(cfg_a)
        m_b = build_model(cfg_b)
        var = m_a.init({"params": jax.random.key(0), "dropout":
                        jax.random.key(1)}, jb, train=True)
        if arch == "yolat_pp":
            params = dict(var["params"])
            for i, g in enumerate(("gate_point", "gate_curve", "gate_prim",
                                   "gate_super")):
                params[g] = jnp.asarray(0.3 + 0.1 * i, jnp.float32)
            var = {"params": params, "batch_stats": var["batch_stats"]}
        # identical param trees (checkpoint compatibility)
        var_b = m_b.init({"params": jax.random.key(0), "dropout":
                          jax.random.key(1)}, jb, train=True)
        assert (jax.tree.structure(var_b["params"])
                == jax.tree.structure(var["params"]))
        assert (jax.tree.structure(var_b["batch_stats"])
                == jax.tree.structure(var["batch_stats"]))

        cot = jax.random.normal(jax.random.key(2),
                                (jb["labels"].shape[0], 17))

        def run(model):
            def loss(params):
                (lg, _), mut = model.apply(
                    {"params": params, "batch_stats": var["batch_stats"]},
                    jb, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.key(3)})
                return jnp.sum(jnp.tanh(lg / 5.0) * cot), (lg, mut)

            (val, (lg, mut)), g = jax.value_and_grad(
                loss, has_aux=True)(var["params"])
            return np.asarray(lg), g, mut["batch_stats"]

        lg_a, g_a, st_a = run(m_a)
        lg_b, g_b, st_b = run(m_b)
        np.testing.assert_allclose(lg_b, lg_a, rtol=5e-4, atol=5e-4)
        # BN running stats of the fusion block update identically
        bn_a = (st_a["cls_net"]["fusion_block"]["bn_0"] if arch != "yolat_pp"
                else st_a["fusion_block"]["bn_0"])
        bn_b = (st_b["cls_net"]["fusion_block"]["bn_0"] if arch != "yolat_pp"
                else st_b["fusion_block"]["bn_0"])
        np.testing.assert_allclose(np.asarray(bn_b["mean"]),
                                   np.asarray(bn_a["mean"]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(bn_b["var"]),
                                   np.asarray(bn_a["var"]),
                                   rtol=1e-3, atol=1e-4)
        flat_a = jax.tree.flatten_with_path(g_a)[0]
        flat_b = dict(jax.tree.flatten_with_path(g_b)[0])
        for k, want in flat_a:
            got = np.asarray(flat_b[k])
            want = np.asarray(want)
            # every Dense-bias directly upstream of a BatchNorm has a
            # structurally-ZERO gradient (the mean shift absorbs it), so
            # those tensors are pure accumulation noise on BOTH sides —
            # compare them only at noise scale
            if np.abs(want).max() < 5e-3 and np.abs(got).max() < 5e-3:
                np.testing.assert_allclose(got, want, atol=2e-3,
                                           err_msg=str(k))
                continue
            scale = np.abs(want).max()
            np.testing.assert_allclose(
                got, want, rtol=5e-3, atol=5e-3 * scale, err_msg=str(k))


def test_dp_sync_bn_parity():
    """axis_name path: the fused op under an 8-device shard_map produces
    the same per-device grads as the flax-style composition with psum'd
    BN moments (global c1/c2 coupling, LOCAL param-grad partials)."""
    from jax.sharding import Mesh, PartitionSpec as P

    n_dev = 8
    devs = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("data",))
    x, mask, w, b, gamma, beta, seg, plan, n_prop, cot = _setup(
        seed=15, n=512, h=256)
    blk_first = jnp.asarray(plan["pool_blk_first"])
    maskf = mask.astype(jnp.float32)[:, None]
    # one identical shard per device (easy global-vs-local check: global
    # sums = n_dev * local; per-device grads must still match flax's)
    xs = jnp.broadcast_to(x[None], (n_dev,) + x.shape)
    cots = jnp.broadcast_to(cot[None], (n_dev,) + cot.shape)

    def grads(fused: bool):
        def f(x_sh, w_, cot_sh):
            if fused:
                pooled, _, _, _ = fused_pool_train(
                    x_sh[0], maskf, w_, b, gamma, beta, blk_first, n_prop,
                    True, "data")
                return jnp.sum(pooled * cot_sh[0])
            z = (x_sh[0] * maskf).astype(jnp.float32) @ w_ + b
            m = maskf
            count = jax.lax.psum(jnp.maximum(m.sum(), 1.0), "data")
            mean = jax.lax.psum((z * m).sum(axis=0), "data") / count
            var = jnp.maximum(
                jax.lax.psum((z * z * m).sum(axis=0), "data") / count
                - mean * mean, 0.0)
            y = (z - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta
            a = jnp.maximum(y, 0.0)
            pooled = segment_max(a, seg, n_prop, mask=mask,
                                 indices_are_sorted=True)
            return jnp.sum(pooled * cot_sh[0])

        def shard_fn(x_sh, cot_sh):
            gx, gw = jax.grad(f, argnums=(0, 1))(x_sh, w, cot_sh)
            return gx, gw[None]

        mapped = jax.shard_map(shard_fn, mesh=mesh,
                               in_specs=(P("data"), P("data")),
                               out_specs=(P("data"), P("data")),
                               check_vma=False)
        return mapped(xs, cots)

    gx_f, gw_f = grads(True)
    gx_r, gw_r = grads(False)
    np.testing.assert_allclose(np.asarray(gx_f[0]), np.asarray(gx_r[0]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gw_f[0]), np.asarray(gw_r[0]),
                               rtol=2e-3,
                               atol=2e-3 * float(np.abs(gw_r[0]).max()))
