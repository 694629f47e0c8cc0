"""Numerical forward parity: reference SparseCADGCN -> converted flax model.

Instantiates the reference's OWN canonical detector
(cad_recognition/architecture3cc_rpn_gp_iter2.py) with randomized weights
and running stats, converts its state dict with
yolat_tpu.train.import_reference.convert_state_dict, and checks that our
flax model produces the same class logits on the same graph.

The reference model needs torch_geometric / torch_scatter / torch_cluster /
thop / fvcore, none of which are installed here. The canonical forward path
only exercises a small, well-defined slice of them (MessagePassing.propagate
with mean aggregation, torch_scatter.scatter with mean/max), so the fixture
installs *functional* stubs implementing exactly those semantics
(torch_geometric.nn.conv.MessagePassing flow='source_to_target':
x_j = x[edge_index[0]], x_i = x[edge_index[1]], aggregation at
edge_index[1]; torch_scatter empty segments reduce to 0).

All tests skip gracefully when /root/reference (or torch) is absent.
"""

from __future__ import annotations

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _scatter(torch, src, index, dim_size, reduce):
    """torch_scatter.scatter semantics along dim 0 (empty segments -> 0)."""
    n = int(dim_size)
    count = torch.zeros(n, dtype=src.dtype).index_add_(
        0, index, torch.ones(index.shape[0], dtype=src.dtype)
    )
    if reduce in ("sum", "add"):
        return torch.zeros(n, src.shape[1], dtype=src.dtype).index_add_(
            0, index, src
        )
    if reduce == "mean":
        total = torch.zeros(n, src.shape[1], dtype=src.dtype).index_add_(
            0, index, src
        )
        return total / count.clamp(min=1.0).unsqueeze(1)
    if reduce in ("max", "amax"):
        out = torch.full((n, src.shape[1]), -float("inf"), dtype=src.dtype)
        out.scatter_reduce_(
            0, index.unsqueeze(1).expand_as(src), src, reduce="amax",
            include_self=True,
        )
        return torch.where(
            (count > 0).unsqueeze(1), out, torch.zeros_like(out)
        )
    raise NotImplementedError(reduce)


def _install_pyg_stubs(torch):
    """Install (or extend) functional stubs for the reference's GNN deps.

    Idempotent and cooperative with tests/test_reference_parity.py, whose
    minimal torch_geometric stub (Data only) may already be registered:
    missing submodules/attributes are added in place.
    """
    import inspect

    class MessagePassing(torch.nn.Module):
        def __init__(self, aggr="add", flow="source_to_target", node_dim=0,
                     **kwargs):
            super().__init__()
            self.aggr = aggr
            self.flow = flow

        def propagate(self, edge_index, size=None, **kwargs):
            x = kwargs.pop("x")
            x_src, x_dst = x if isinstance(x, tuple) else (x, x)
            src, dst = edge_index[0], edge_index[1]
            msg_kw = {}
            for name in inspect.signature(self.message).parameters:
                if name == "x_i":
                    msg_kw[name] = x_dst[dst]
                elif name == "x_j":
                    msg_kw[name] = x_src[src]
                elif name in kwargs:
                    msg_kw[name] = kwargs[name]
            out = self.message(**msg_kw)
            return _scatter(torch, out, dst, x_dst.shape[0], self.aggr)

    tg = sys.modules.get("torch_geometric")
    if tg is None:
        tg = types.ModuleType("torch_geometric")
        sys.modules["torch_geometric"] = tg

    tgd = sys.modules.get("torch_geometric.data")
    if tgd is None:
        tgd = types.ModuleType("torch_geometric.data")
        sys.modules["torch_geometric.data"] = tgd
    if not hasattr(tgd, "Data"):
        class Data:
            def __init__(self, **kw):
                self.__dict__.update(kw)

        tgd.Data = Data
    if not hasattr(tgd, "InMemoryDataset"):
        class InMemoryDataset:  # subclassed by utils/data_util.py (unused)
            pass

        tgd.InMemoryDataset = InMemoryDataset
    if not hasattr(tgd, "extract_zip"):
        tgd.extract_zip = lambda *a, **k: None

    tgu = sys.modules.get("torch_geometric.utils")
    if tgu is None:
        tgu = types.ModuleType("torch_geometric.utils")
        sys.modules["torch_geometric.utils"] = tgu
    tgu.remove_self_loops = lambda edge_index, edge_attr=None: (
        edge_index, edge_attr
    )
    tgu.add_self_loops = lambda edge_index, edge_attr=None, **k: (
        edge_index, edge_attr
    )

    def degree(index, num_nodes=None, dtype=None):
        n = int(index.max()) + 1 if num_nodes is None else int(num_nodes)
        out = torch.zeros(n, dtype=dtype or torch.float32)
        return out.index_add_(
            0, index, torch.ones(index.shape[0], dtype=out.dtype)
        )

    tgu.degree = degree

    tgnc = sys.modules.get("torch_geometric.nn.conv")
    if tgnc is None:
        tgnc = types.ModuleType("torch_geometric.nn.conv")
        sys.modules["torch_geometric.nn.conv"] = tgnc
    tgnc.MessagePassing = MessagePassing
    tgn = sys.modules.get("torch_geometric.nn")
    if tgn is None:
        tgn = types.ModuleType("torch_geometric.nn")
        sys.modules["torch_geometric.nn"] = tgn
    tgn.MessagePassing = MessagePassing
    tgn.conv = tgnc

    class _UnusedConv(torch.nn.Module):  # base classes for the PyG-wrapper
        def __init__(self, *a, **k):     # convs we never instantiate
            super().__init__()

    for name in ("SAGEConv", "GINConv", "GATConv", "GCNConv", "EdgeConv"):
        if not hasattr(tgn, name):
            setattr(tgn, name, type(name, (_UnusedConv,), {}))

    tgt = sys.modules.get("torch_geometric.typing")
    if tgt is None:
        tgt = types.ModuleType("torch_geometric.typing")
        sys.modules["torch_geometric.typing"] = tgt
    from typing import Any, Optional, Tuple

    tgt.OptTensor = Optional[torch.Tensor]
    tgt.PairTensor = Tuple[torch.Tensor, torch.Tensor]
    tgt.PairOptTensor = Tuple[Optional[torch.Tensor], Optional[torch.Tensor]]
    tgt.Adj = Any

    tg.data = tgd
    tg.utils = tgu
    tg.nn = tgn
    tg.typing = tgt

    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")

        def scatter(src, index, dim=0, dim_size=None, reduce="sum"):
            assert dim == 0
            n = dim_size if dim_size is not None else int(index.max()) + 1
            return _scatter(torch, src, index, n, reduce)

        def scatter_softmax(src, index, dim=0):
            assert dim == 0
            n = int(index.max()) + 1
            mx = _scatter(torch, src, index, n, "max")[index]
            e = torch.exp(src - mx)
            z = _scatter(torch, e, index, n, "sum")[index]
            return e / z.clamp(min=1e-16)

        ts.scatter = scatter
        ts.scatter_softmax = scatter_softmax
        sys.modules["torch_scatter"] = ts

    if "torch_cluster" not in sys.modules:
        tc = types.ModuleType("torch_cluster")
        tc.knn_graph = lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError("knn_graph stub")
        )
        sys.modules["torch_cluster"] = tc

    for mod, attr in (("thop", "profile"), ("fvcore", None)):
        try:
            __import__(mod)
        except ImportError:
            m = types.ModuleType(mod)
            if attr:
                setattr(m, attr, lambda *a, **k: (0, 0))
            sys.modules[mod] = m
    if "fvcore.nn" not in sys.modules:
        try:
            __import__("fvcore.nn")
        except ImportError:
            fn = types.ModuleType("fvcore.nn")
            fn.FlopCountAnalysis = lambda *a, **k: None
            sys.modules["fvcore.nn"] = fn
            sys.modules["fvcore"].nn = fn


@pytest.fixture(scope="module")
def ref_arch():
    torch = pytest.importorskip("torch")
    _install_pyg_stubs(torch)
    for path in (REF, os.path.join(REF, "cad_recognition")):
        if path not in sys.path:
            sys.path.insert(0, path)
    arch = pytest.importorskip("architecture3cc_rpn_gp_iter2")
    return SimpleNamespace(torch=torch, arch=arch)


def _canonical_opt():
    return SimpleNamespace(
        in_channels=5, n_filters=64, n_blocks=2, n_blocks_out=2,
        n_classes=17, act="relu", norm="batch", bias=True,
        conv="attr_edge_gp2", classifier="softmax", class_specific=False,
        dropout=0.0,
    )


def _randomize(torch, model, seed=5):
    """Random weights AND running stats, so the conversion of every tensor
    class (Linear kernel/bias, BN affine, BN moments) is exercised."""
    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    new = {}
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            new[k] = v  # num_batches_tracked
        elif k.endswith("running_var"):
            new[k] = torch.rand(v.shape, generator=gen) + 0.5
        else:
            new[k] = torch.randn(v.shape, generator=gen) * 0.2
    model.load_state_dict(new)
    return model


def _prefix_valid(mask):
    """Valid rows of a padded axis must be a prefix; return their count."""
    m = np.asarray(mask).astype(bool)
    n = int(m.sum())
    assert m[:n].all() and not m[n:].any()
    return n


def _compact_node_view(fb):
    """Strip padding node rows (block alignment interleaves them inside the
    batch, so valid nodes are NOT a prefix) and remap edge endpoints to the
    compacted numbering — the layout the reference model consumes.

    Returns (node_sel, remapped_valid_edges, valid_edge_mask)."""
    m = np.asarray(fb["node_mask"]).astype(bool)
    new_of_old = np.cumsum(m) - 1
    emask = np.asarray(fb["edge_mask"]).astype(bool)
    edge = np.asarray(fb["edge"])[emask]
    assert m[edge].all()  # valid edges only reference valid nodes
    return m, new_of_old[edge], emask


def test_converted_forward_matches_reference(ref_arch, monkeypatch):
    torch = ref_arch.torch
    import jax
    import jax.numpy as jnp

    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.data.toy import random_packed_batch
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.import_reference import convert_state_dict
    from yolat_tpu.train.loop import build_model

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)

    ref_model = _randomize(torch, ref_arch.arch.SparseCADGCN(_canonical_opt()))
    ref_model.eval()

    batch, _ = random_packed_batch(seed=3, n_images=1, ccs_per_image=3,
                                   n_classes=17, step=4)
    fb = jax.device_get(finalize_batch(jax.tree.map(jnp.asarray, batch)))

    pv = _prefix_valid(fb["proposal_mask"])
    nsel, edge, emask = _compact_node_view(fb)

    t = lambda a, dt=torch.float32: torch.tensor(np.asarray(a), dtype=dt)
    data = SimpleNamespace(
        x=t(np.asarray(fb["x"])[nsel]),
        edge=t(edge, torch.long),
        e_attr=t(np.asarray(fb["e_attr"])[emask]),
        bbox_idx=t(np.asarray(fb["bbox_idx"])[nsel], torch.long),
        bbox=t(fb["bbox"][:pv]),
        stat_feats=torch.zeros(pv, 13),
    )
    with torch.no_grad():
        ref_cls, ref_bbox = ref_model(data, None)
    assert ref_cls.shape == (pv, 17)

    cfg = Config(n_classes=17, data_aug=False)
    model = build_model(cfg)
    variables = model.init({"params": jax.random.key(0)},
                           jax.tree.map(jnp.asarray, fb), train=True)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    converted = convert_state_dict(sd, n_blocks=cfg.n_blocks)

    # structural completeness: converter output covers our init tree exactly
    def paths(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in flat}

    assert paths(converted) == paths(jax.device_get(variables))

    logits, boxes = model.apply(
        jax.tree.map(jnp.asarray, converted),
        jax.tree.map(jnp.asarray, fb), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(logits[:pv], np.float64), ref_cls.numpy(),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(boxes[:pv]), ref_bbox.numpy(), rtol=1e-5, atol=1e-6
    )


def test_pth_round_trip(ref_arch, tmp_path):
    """torch .pth checkpoint (with DataParallel prefixes and the reference's
    {'state_dict': ...} wrapper) -> load_reference_state_dict -> identical
    converted variables."""
    torch = ref_arch.torch

    from yolat_tpu.train.import_reference import (
        convert_state_dict,
        load_reference_state_dict,
    )

    ref_model = _randomize(torch, ref_arch.arch.SparseCADGCN(_canonical_opt()),
                           seed=11)
    sd = ref_model.state_dict()
    path = tmp_path / "ckpt_best.pth"
    torch.save({"state_dict": {"module." + k: v for k, v in sd.items()},
                "epoch": 7}, path)

    loaded = load_reference_state_dict(str(path))
    direct = convert_state_dict(
        {k: v.detach().numpy() for k, v in sd.items()}
    )
    via_pth = convert_state_dict(loaded)

    import jax

    flat_a = jax.tree_util.tree_flatten_with_path(direct)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(via_pth)[0])
    assert len(flat_a) == len(flat_b)
    for p, v in flat_a:
        np.testing.assert_array_equal(v, flat_b[p])


def test_exported_weights_drive_reference_model(ref_arch, monkeypatch,
                                                tmp_path):
    """The reverse migration: OUR random-init weights exported to a
    reference .pth load into the reference model strict=True and produce
    the same logits the flax model does."""
    torch = ref_arch.torch
    import jax
    import jax.numpy as jnp

    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.data.toy import random_packed_batch
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.import_reference import (
        convert_state_dict,
        save_reference_checkpoint,
    )
    from yolat_tpu.train.loop import build_model

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)

    batch, _ = random_packed_batch(seed=7, n_images=1, ccs_per_image=3,
                                   n_classes=17, step=4)
    fb = jax.device_get(finalize_batch(jax.tree.map(jnp.asarray, batch)))

    cfg = Config(n_classes=17, data_aug=False)
    model = build_model(cfg)
    variables = jax.device_get(
        model.init({"params": jax.random.key(4)},
                   jax.tree.map(jnp.asarray, fb), train=True)
    )
    logits, _ = model.apply(jax.tree.map(jnp.asarray, variables),
                            jax.tree.map(jnp.asarray, fb), train=False)

    path = tmp_path / "exported_best.pth"
    save_reference_checkpoint(variables, str(path), n_blocks=cfg.n_blocks,
                              epoch=3)

    ref_model = ref_arch.arch.SparseCADGCN(_canonical_opt())
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    assert ckpt["epoch"] == 3
    ref_model.load_state_dict(ckpt["state_dict"], strict=True)
    ref_model.eval()

    pv = _prefix_valid(fb["proposal_mask"])
    nsel, edge, emask = _compact_node_view(fb)
    t = lambda a, dt=torch.float32: torch.tensor(np.asarray(a), dtype=dt)
    data = SimpleNamespace(
        x=t(np.asarray(fb["x"])[nsel]),
        edge=t(edge, torch.long),
        e_attr=t(np.asarray(fb["e_attr"])[emask]),
        bbox_idx=t(np.asarray(fb["bbox_idx"])[nsel], torch.long),
        bbox=t(fb["bbox"][:pv]),
        stat_feats=torch.zeros(pv, 13),
    )
    with torch.no_grad():
        ref_cls, _ = ref_model(data, None)
    np.testing.assert_allclose(
        np.asarray(logits[:pv], np.float64), ref_cls.numpy(),
        rtol=2e-4, atol=2e-4,
    )

    # round trip: export -> convert reproduces the original variables
    import jax.tree_util as jtu

    back = convert_state_dict(
        {k: v.numpy() for k, v in ckpt["state_dict"].items()},
        n_blocks=cfg.n_blocks,
    )
    flat_v = jtu.tree_flatten_with_path(variables)[0]
    flat_b = dict(jtu.tree_flatten_with_path(back)[0])
    assert len(flat_v) == len(flat_b)
    for p, v in flat_v:
        np.testing.assert_allclose(np.asarray(v), flat_b[p], rtol=1e-6)


def test_state_from_pth_replaces_weights(ref_arch, tmp_path):
    """The trainer/test-CLI `--pretrained_model foo.pth` path: a fresh
    TrainState picks up the reference weights in place."""
    torch = ref_arch.torch
    import jax
    import jax.numpy as jnp

    from yolat_tpu.data.toy import random_packed_batch
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.import_reference import state_from_pth
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    ref_model = _randomize(torch, ref_arch.arch.SparseCADGCN(_canonical_opt()),
                           seed=13)
    path = tmp_path / "ckpt_40.pth"
    torch.save({"model_state_dict": ref_model.state_dict()}, path)

    cfg = Config(n_classes=17, data_aug=False)
    batch, _ = random_packed_batch(seed=1, n_images=1, ccs_per_image=2,
                                   n_classes=17, step=4)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    state = create_state(cfg, tx, batch, jax.random.key(0))
    new_state = state_from_pth(state, str(path), n_blocks=cfg.n_blocks)

    want = ref_model.state_dict()["cls_net.fusion_block.0.weight"].numpy().T
    got = np.asarray(new_state.params["cls_net"]["fusion_block"]["dense_0"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert int(new_state.step) == 0
    assert jax.tree_util.tree_structure(new_state.opt_state) == (
        jax.tree_util.tree_structure(state.opt_state)
    )
