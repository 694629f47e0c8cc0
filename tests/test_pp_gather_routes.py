"""Gather-route parity for the YOLaT++ clique level (round 4).

The pp train step's prim level spent 13.2 of 17.7 ms in the BACKWARD
scatter-adds of its two endpoint gathers (scripts/pp_prim_decomp.py). Two
routings landed (126.6 -> ~147 img/s bf16 full step on v5e):

  * dst-side gathers declare indices_are_sorted (the pack contract sorts
    edge rows by dst), so their transpose scatter-adds take XLA's sorted
    path;
  * s_i rides segment_broadcast over the SUPER_BLOCK-aligned sup plan —
    a 4x smaller block gather + in-register broadcast whose backward is a
    dense block-sum + 4x smaller scatter.

(A third candidate — routing the SRC-side backward scatters through a
pack-time src-sort permutation — measured NEUTRAL at full-step level and
was removed; PERF.md round 4 has the record.)

These tests pin that both routings are numerics-neutral: identical
multisets of addends, so results match the plain routes to float
tolerance and grads match autodiff of the plain gathers.

Reference counterpart of the routed op: the x_j/x_i gathers inside PyG
MessagePassing as used by gcn_lib/sparse/torch_vertex.py:330-337.
"""
import jax
import jax.numpy as jnp
import numpy as np

from yolat_tpu.ops.segment import SUPER_BLOCK, pool_plan, segment_broadcast


def test_segment_broadcast_aligned_plan_grad_matches_plain():
    rng = np.random.default_rng(3)
    n_seg, runs, c = 40, 13, 8
    # SUPER_BLOCK-aligned segment runs (the sew_/sup plan contract)
    ids = np.repeat(
        np.sort(rng.choice(n_seg, runs, replace=False)).astype(np.int32),
        rng.integers(1, 4, runs) * SUPER_BLOCK)
    n = len(ids)
    plan_d = pool_plan(ids, n_seg, block=SUPER_BLOCK, cap=0)
    plan = (plan_d["pool_blk_first"], plan_d["pool_blk_full"],
            plan_d["pool_bnd_rows"], plan_d["pool_bnd_seg"],
            plan_d["pool_bnd_mask"])
    x = jnp.asarray(rng.normal(size=(n_seg, c)), jnp.float32)
    ids_j = jnp.asarray(ids)

    out = segment_broadcast(x, ids_j, n, plan=plan)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[ids_j]))

    w = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    ga = jax.grad(lambda v: jnp.sum(v[ids_j] * w))(x)
    gb = jax.grad(
        lambda v: jnp.sum(segment_broadcast(v, ids_j, n, plan=plan) * w))(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=1e-5, atol=1e-5)


def test_yolat_pp_broadcast_route_matches_plain_gather():
    """pp logits + param grads with the sup plan present (broadcast route)
    vs stripped (plain s_i gather): eval mode — train-mode BN amplifies
    reorder noise chaotically at toy scale (tests/test_banded_train.py)."""
    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.data.toy import random_packed_batch
    from yolat_tpu.nn.yolat_pp import YOLaTPlusPlus

    batch_np, _ = random_packed_batch(seed=5, n_images=3)
    jb = finalize_batch(jax.tree.map(jnp.asarray, dict(batch_np)))
    assert "sup_pool_blk_first" in jb, "pack must emit the sup plan"
    strip = {k: v for k, v in jb.items() if not k.startswith("sup_pool_")}
    model = YOLaTPlusPlus(n_classes=17, sorted_edges=True)
    var = model.init({"params": jax.random.key(0)}, jb, train=True)

    la = model.apply(var, strip, train=False)[0]
    lb = model.apply(var, jb, train=False)[0]
    scale = float(jnp.abs(la).max())
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                               rtol=1e-5, atol=1e-5 * scale)

    def loss(b):
        def f(params):
            logits, _ = model.apply(
                {"params": params, "batch_stats": var["batch_stats"]}, b,
                train=False)
            return jnp.sum(jnp.tanh(logits / 10.0))
        return f

    ga = jax.grad(loss(strip))(var["params"])
    gb = jax.grad(loss(jb))(var["params"])
    flat_a = jax.tree.flatten_with_path(ga)[0]
    flat_b = jax.tree.flatten_with_path(gb)[0]
    gscale = max(float(jnp.abs(v).max()) for _, v in flat_a)
    assert gscale > 1e-4
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                   rtol=1e-4, atol=1e-4 * gscale,
                                   err_msg=str(ka))
