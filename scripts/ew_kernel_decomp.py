"""Decompose the edge-window kernel's time: full vs no-band-gather vs
prebuilt-one-hot variants (timing only; (b),(c) are numerically wrong)."""
import functools, json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bench import build_workload
    from yolat_tpu.ops.edge_window import EW_KEYS, edge_window_plan

    ds, batches, _ = build_workload()
    b = {k: v[0] for k, v in batches[0].items()}
    N = b["pos"].shape[0]
    p = edge_window_plan(np.asarray(b["edge"]), np.asarray(b["edge_mask"]),
                         np.asarray(b["e_attr"]), N, wn=256)
    ew = tuple(jnp.asarray(p[k]) for k in EW_KEYS)
    src_rel, dst_loc, attr, maskf = ew
    nw, eb = src_rel.shape
    wn = N // nw
    ci = h = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, ci)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(2 * ci + 4, h)) * 0.1, jnp.bfloat16)
    sc1 = jnp.asarray(np.stack([np.ones(h), np.zeros(h)]), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, h)) * 0.1, jnp.bfloat16)
    sc2 = sc1

    gsz = 4
    ngr = nw // gsz
    sr3 = src_rel.reshape(ngr, 1, gsz * eb)
    dl3 = dst_loc.reshape(ngr, 1, gsz * eb)
    mk3 = maskf.reshape(ngr, 1, gsz * eb)
    at3 = attr.reshape(ngr, gsz * eb, 4)

    def make(variant):
        def kern(x0, x1, x2, sr_ref, dl_ref, attr_ref, mk_ref, w1_ref,
                 sc1_ref, w2_ref, sc2_ref, out_ref):
            xw = jnp.concatenate([x0[:], x1[:], x2[:]], axis=0)
            cdt = xw.dtype
            w1v = w1_ref[:]
            w1a, w1b, w1c = w1v[:ci], w1v[ci:2 * ci], w1v[2 * ci:]
            w1d = w1a - w1b
            band = jax.lax.broadcasted_iota(jnp.int32, (eb, 3 * wn), 1)
            own = jax.lax.broadcasted_iota(jnp.int32, (eb, wn), 1)
            dn = (((1,), (0,)), ((), ()))
            for j in range(gsz):
                sl = slice(j * eb, (j + 1) * eb)
                sub = xw[(gsz + j - 1) * wn:(gsz + j + 2) * wn]
                xown = x1[j * wn:(j + 1) * wn]
                dl = dl_ref[0, 0][sl]
                sr = sr_ref[0, 0][sl]
                ohl = (dl[:, None] == own).astype(cdt)
                if variant == "noonehot":
                    ohs = jnp.full((eb, 3 * wn), 0.001, cdt)
                    ohl = jnp.full((eb, wn), 0.001, cdt)
                elif variant == "noband":
                    ohs = ohl
                else:
                    ohs = (sr[:, None] == band).astype(cdt)
                x_i = jax.lax.dot_general(ohl, xown, dn,
                                          preferred_element_type=jnp.float32).astype(cdt)
                if variant == "noband":
                    x_j = jax.lax.dot_general(ohs, xown, dn,
                                              preferred_element_type=jnp.float32).astype(cdt)
                else:
                    x_j = jax.lax.dot_general(ohs, sub, dn,
                                              preferred_element_type=jnp.float32).astype(cdt)
                hh = (jax.lax.dot_general(x_i, w1d, dn, preferred_element_type=jnp.float32)
                      + jax.lax.dot_general(x_j, w1b, dn, preferred_element_type=jnp.float32)
                      + jax.lax.dot_general(attr_ref[0][sl].astype(cdt), w1c, dn,
                                            preferred_element_type=jnp.float32))
                s1 = sc1_ref[:].astype(jnp.float32)
                hh = jnp.maximum(hh * s1[0] + s1[1], 0.0).astype(cdt)
                hh = jax.lax.dot_general(hh, w2_ref[:], dn,
                                         preferred_element_type=jnp.float32)
                s2 = sc2_ref[:].astype(jnp.float32)
                hh = jnp.maximum(hh * s2[0] + s2[1], 0.0).astype(cdt)
                hh = hh * mk_ref[0, 0][sl][:, None].astype(cdt)
                out_ref[j * wn:(j + 1) * wn, :] = jax.lax.dot_general(
                    ohl, hh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(ngr,),
            in_specs=[
                pl.BlockSpec((gsz * wn, ci), lambda g: (jnp.maximum(g - 1, 0), 0)),
                pl.BlockSpec((gsz * wn, ci), lambda g: (g, 0)),
                pl.BlockSpec((gsz * wn, ci), lambda g: (jnp.minimum(g + 1, ngr - 1), 0)),
                pl.BlockSpec((1, 1, gsz * eb), lambda g: (g, 0, 0)),
                pl.BlockSpec((1, 1, gsz * eb), lambda g: (g, 0, 0)),
                pl.BlockSpec((1, gsz * eb, 4), lambda g: (g, 0, 0)),
                pl.BlockSpec((1, 1, gsz * eb), lambda g: (g, 0, 0)),
                pl.BlockSpec(w1.shape, lambda g: (0, 0)),
                pl.BlockSpec(sc1.shape, lambda g: (0, 0)),
                pl.BlockSpec(w2.shape, lambda g: (0, 0)),
                pl.BlockSpec(sc2.shape, lambda g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((gsz * wn, h), lambda g: (g, 0)),
        )
        f = pl.pallas_call(functools.partial(kern),
                           grid_spec=grid_spec,
                           out_shape=jax.ShapeDtypeStruct((N, h), jnp.float32))
        return jax.jit(lambda x: f(x, x, x, sr3, dl3, at3, mk3, w1, sc1, w2, sc2))

    def chain(fn, x, n=32):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(x + (c * 1e-30).astype(x.dtype))
                return (out.astype(jnp.float32) ** 2).sum(), jnp.float32(0)
            c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return c
        np.asarray(run(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(run(x))
            best = min(best, time.perf_counter() - t0)
        return best / n

    res = {"nw": nw, "eb": eb, "gsz": gsz}
    for v in ("full", "noband", "noonehot"):
        res[v + "_us"] = round(chain(make(v), x) * 1e6, 1)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
