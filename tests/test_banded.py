"""Ragged banded segment-message kernel: plan construction + interpreter
parity against a plain gather/segment-sum oracle, incl. the skewed clique
family it exists for, both sort directions, two-stage messages, and the
fast_forward_pp integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.ops.banded_message import (banded_message_sum,
                                          banded_message_sum_reference,
                                          banded_plan, bm_of)


def _gather_oracle(x, edge, mask, attr, sortby, w_own, w_halo, w_attr,
                   sc1, w2=None, sc2=None):
    """The straightforward math the kernel replaces."""
    e = edge[mask]
    a = attr[mask]
    own, oth = e[:, sortby], e[:, 1 - sortby]
    pre = x[own] @ w_own + x[oth] @ w_halo + a @ w_attr
    h = np.maximum(pre * sc1[0] + sc1[1], 0.0)
    if w2 is not None:
        h = np.maximum((h @ w2) * sc2[0] + sc2[1], 0.0)
    out = np.zeros((x.shape[0], h.shape[1]), np.float64)
    np.add.at(out, own, h)
    return out


def _clique_family(rng, n, wn, n_cliques=40, max_m=18, pad_e=None):
    """Skewed clique edges over contiguous node runs (the super-edge
    shape), plus a few empty windows."""
    edges = []
    lo = 0
    for _ in range(n_cliques):
        m = int(rng.integers(2, max_m))
        lo = int(rng.integers(lo, lo + 40))
        if lo + m >= n - wn:  # keep the last window edge-free
            break
        ids = np.arange(lo, lo + m)
        src, dst = np.meshgrid(ids, ids)
        keep = src != dst
        edges.append(np.stack([src[keep], dst[keep]], axis=1))
        lo += m
    e = np.concatenate(edges).astype(np.int32)
    E = len(e) if pad_e is None else pad_e
    edge = np.zeros((E, 2), np.int32)
    mask = np.zeros(E, bool)
    edge[: len(e)] = e
    mask[: len(e)] = True
    attr = rng.normal(size=(E, 4)).astype(np.float32)
    attr[~mask] = 0.0
    return edge, mask, attr


@pytest.mark.parametrize("sortby", [1, 0])
@pytest.mark.parametrize("two_stage", [False, True])
def test_kernel_matches_oracle(sortby, two_stage):
    rng = np.random.default_rng(5)
    n, wn, pad, eblk = 2048, 512, 128, 256
    edge, mask, attr = _clique_family(rng, n, wn, pad_e=4096)
    plan = banded_plan(edge, mask, attr, n, sortby=sortby, wn=wn, pad=pad,
                       eblk=eblk)
    assert plan is not None
    # padded edge rows bounded by one partial block per occupied window
    assert plan["bm_own"].shape[0] == n // wn + -(-edge.shape[0] // eblk)

    c, h = 64, 64
    x = rng.normal(size=(n, c)).astype(np.float32)
    w_own = (rng.normal(size=(c, h)) * 0.2).astype(np.float32)
    w_halo = (rng.normal(size=(c, h)) * 0.2).astype(np.float32)
    w_attr = (rng.normal(size=(4, h)) * 0.2).astype(np.float32)
    sc1 = np.stack([rng.uniform(0.5, 1.5, h),
                    rng.normal(size=h) * 0.1]).astype(np.float32)
    w2 = (rng.normal(size=(h, h)) * 0.2).astype(np.float32)
    sc2 = np.stack([rng.uniform(0.5, 1.5, h),
                    rng.normal(size=h) * 0.1]).astype(np.float32)
    kw = dict(w2=jnp.asarray(w2), sc2=jnp.asarray(sc2)) if two_stage else {}

    bm = bm_of({**{k: jnp.asarray(v) for k, v in plan.items()},
                "pos": jnp.zeros((n, 2))}, "")
    assert bm is not None
    got = banded_message_sum(jnp.asarray(x), bm, jnp.asarray(w_own),
                             jnp.asarray(w_halo), jnp.asarray(w_attr),
                             jnp.asarray(sc1), interpret=True, **kw)
    want = _gather_oracle(x, edge, mask, attr, sortby, w_own, w_halo,
                          w_attr, sc1, w2 if two_stage else None,
                          sc2 if two_stage else None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

    ref = banded_message_sum_reference(
        jnp.asarray(x), bm, jnp.asarray(w_own), jnp.asarray(w_halo),
        jnp.asarray(w_attr), jnp.asarray(sc1),
        **({k: v for k, v in kw.items()} if two_stage else {}))
    np.testing.assert_allclose(np.asarray(ref), want, rtol=2e-4, atol=2e-4)


def test_both_endpoint_kernel_matches_two_pass():
    """The fused both-endpoint pass (banded_message_sum_both) equals the
    oracle at each endpoint AND the two-pass mirror-plan route it
    replaces (the fast_forward_pp curve level)."""
    from yolat_tpu.ops.banded_message import (banded_message_sum_both,
                                              banded_message_sum_both_reference)

    rng = np.random.default_rng(11)
    n, wn, pad, eblk = 2048, 512, 128, 256
    edge, mask, attr = _clique_family(rng, n, wn, pad_e=8192)
    c, h = 64, 64
    x = rng.normal(size=(n, c)).astype(np.float32)
    w_own = (rng.normal(size=(c, h)) * 0.2).astype(np.float32)
    w_halo = (rng.normal(size=(c, h)) * 0.2).astype(np.float32)
    w_attr = (rng.normal(size=(4, h)) * 0.2).astype(np.float32)
    sc1 = np.stack([rng.uniform(0.5, 1.5, h),
                    rng.normal(size=h) * 0.1]).astype(np.float32)

    plan = banded_plan(edge, mask, attr, n, sortby=1, wn=wn, pad=pad,
                       eblk=eblk)
    bm = bm_of({**{k: jnp.asarray(v) for k, v in plan.items()},
                "pos": jnp.zeros((n, 2))}, "")
    own_sum, oth_sum = banded_message_sum_both(
        jnp.asarray(x), bm, jnp.asarray(w_own), jnp.asarray(w_halo),
        jnp.asarray(w_attr), jnp.asarray(sc1), interpret=True)

    # oracle at each endpoint
    want_own = _gather_oracle(x, edge, mask, attr, 1, w_own, w_halo,
                              w_attr, sc1)
    e, a = edge[mask], attr[mask]
    pre = x[e[:, 1]] @ w_own + x[e[:, 0]] @ w_halo + a @ w_attr
    hh = np.maximum(pre * sc1[0] + sc1[1], 0.0)
    want_oth = np.zeros((n, h), np.float64)
    np.add.at(want_oth, e[:, 0], hh)
    np.testing.assert_allclose(np.asarray(own_sum), want_own,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(oth_sum), want_oth,
                               rtol=2e-4, atol=2e-4)

    # two-pass mirror-plan route: dst pass over the dst-sorted plan plus
    # src pass over the src-sorted plan (w_own/w_halo swap roles)
    plan_s = banded_plan(edge, mask, attr, n, sortby=0, wn=wn, pad=pad,
                         eblk=eblk)
    bm_s = bm_of({**{k: jnp.asarray(v) for k, v in plan_s.items()},
                  "pos": jnp.zeros((n, 2))}, "")
    two_src = banded_message_sum(jnp.asarray(x), bm_s, jnp.asarray(w_halo),
                                 jnp.asarray(w_own), jnp.asarray(w_attr),
                                 jnp.asarray(sc1), interpret=True)
    np.testing.assert_allclose(np.asarray(oth_sum), np.asarray(two_src),
                               rtol=2e-4, atol=2e-4)

    # jnp oracle of the fused route
    ro, rt = banded_message_sum_both_reference(
        jnp.asarray(x), bm, jnp.asarray(w_own), jnp.asarray(w_halo),
        jnp.asarray(w_attr), jnp.asarray(sc1))
    np.testing.assert_allclose(np.asarray(ro), want_own, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(rt), want_oth, rtol=2e-4,
                               atol=2e-4)


def test_plan_rejects_band_violation():
    n, wn = 2048, 512
    edge = np.array([[0, 2047], [2047, 0]], np.int32)  # cross-batch edge
    mask = np.ones(2, bool)
    attr = np.zeros((2, 4), np.float32)
    assert banded_plan(edge, mask, attr, n, wn=wn, pad=128) is None
    assert banded_plan(edge, mask, attr, n + 3, wn=wn) is None  # n % wn


def test_empty_family_zeroes_output():
    n, wn = 1024, 512
    edge = np.zeros((256, 2), np.int32)
    mask = np.zeros(256, bool)
    attr = np.zeros((256, 4), np.float32)
    plan = banded_plan(edge, mask, attr, n, wn=wn, pad=128, eblk=256)
    assert plan is not None
    bm = bm_of({**{k: jnp.asarray(v) for k, v in plan.items()},
                "pos": jnp.zeros((n, 2))}, "")
    out = banded_message_sum(
        jnp.ones((n, 64), jnp.float32), bm,
        jnp.ones((64, 64)), jnp.ones((64, 64)), jnp.ones((4, 64)),
        jnp.asarray(np.stack([np.ones(64), np.zeros(64)]), jnp.float32),
        interpret=True)
    assert (np.asarray(out) == 0).all()


def test_bm_of_stale_plan_returns_none():
    n, wn = 1024, 512
    edge = np.zeros((64, 2), np.int32)
    plan = banded_plan(edge, np.zeros(64, bool), np.zeros((64, 4), np.float32),
                       n, wn=wn, pad=128, eblk=64)
    b = {**{f"s_{k}": jnp.asarray(v) for k, v in plan.items()},
         "pos": jnp.zeros((n + 512, 2))}  # re-padded batch
    assert bm_of(b, "s_") is None
