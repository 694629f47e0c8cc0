"""Reference-checkpoint migration: torch `.pth` -> flax variables.

The reference saves checkpoints as ``{postname}_{epoch}.pth`` dicts holding
``state_dict`` / ``model_state_dict`` (utils/ckpt_util.py:107-111, possibly
with DataParallel ``module.`` prefixes, :52-64). This module converts the
canonical SparseCADGCN state dict (cad_recognition/
architecture3cc_rpn_gp_iter2.py) into our flax parameter tree so a user of
the reference can bring trained weights along:

  cls_net.head.gconv.*        -> cls_net/AttrEdgeGP2_0/*
  cls_net.backbone.{i}.body.* -> cls_net/AttrEdgeGP2_{i+1}/*
  cls_net.fusion_block[_super] -> cls_net/fusion_block[_super]
  prediction_cls.{k}.*        -> pred_{k}

with torch conventions translated per-layer: Linear.weight [out, in] ->
Dense kernel [in, out]; BatchNorm1d weight/bias/running_mean/running_var ->
MaskedBatchNorm scale/bias + batch_stats mean/var. The reference's flat
``MLP(Seq)`` (gcn_lib/sparse/torch_nn.py:50-72) interleaves Lin/BN/act/drop
at sequential indices, so layers are identified by their tensor signatures
(2-D weight = Linear; running_mean present = BatchNorm) rather than by
hardcoded positions.

Conversion is pure numpy: any mapping name -> array works (no torch needed
until an actual .pth must be deserialised; see `load_reference_state_dict`).
Numerical parity of the converted model against the reference's own modules
is tested end to end in tests/test_reference_model_parity.py.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def strip_module_prefix(sd: Mapping[str, np.ndarray]) -> dict:
    """Drop DataParallel's 'module.' prefixes (ckpt_util.py:52-64)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _children(sd: Mapping[str, np.ndarray], prefix: str) -> list[str]:
    """Sorted immediate child indices of a reference Sequential prefix."""
    out = set()
    plen = len(prefix) + 1
    for k in sd:
        if k.startswith(prefix + "."):
            out.add(k[plen:].split(".", 1)[0])
    return sorted(out, key=lambda s: (not s.isdigit(), int(s) if s.isdigit() else s))


def _convert_mlp(sd: Mapping[str, np.ndarray], prefix: str):
    """Reference flat-Sequential MLP -> (params, batch_stats) subtrees with
    our dense_{k}/bn_{k} naming."""
    params: dict = {}
    stats: dict = {}
    n_dense = n_bn = 0
    for idx in _children(sd, prefix):
        base = f"{prefix}.{idx}"
        if f"{base}.running_mean" in sd:  # BatchNorm1d
            params[f"bn_{n_bn}"] = {
                "scale": np.asarray(sd[f"{base}.weight"]),
                "bias": np.asarray(sd[f"{base}.bias"]),
            }
            stats[f"bn_{n_bn}"] = {
                "mean": np.asarray(sd[f"{base}.running_mean"]),
                "var": np.asarray(sd[f"{base}.running_var"]),
            }
            n_bn += 1
        elif f"{base}.weight" in sd:  # Linear
            w = np.asarray(sd[f"{base}.weight"])
            if w.ndim != 2:
                raise ValueError(f"{base}.weight is not a Linear weight")
            p = {"kernel": w.T.copy()}
            if f"{base}.bias" in sd:
                p["bias"] = np.asarray(sd[f"{base}.bias"])
            params[f"dense_{n_dense}"] = p
            n_dense += 1
        # activation / dropout stages carry no tensors
    if not params:
        raise KeyError(f"no layers found under '{prefix}'")
    return params, stats


def _convert_linear(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"])
    p = {"kernel": w.T.copy()}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _convert_gp2(sd: Mapping[str, np.ndarray], prefix: str):
    """One AttrRelativeEdgeConvGlobalPool2 (torch_vertex.py:288-341):
    message MLP `nn`, skip `lin_r`, node-stream `mlp_node`."""
    nn_p, nn_s = _convert_mlp(sd, f"{prefix}.nn")
    node_p, node_s = _convert_mlp(sd, f"{prefix}.mlp_node")
    params = {
        "nn": nn_p,
        "lin_r": _convert_linear(sd, f"{prefix}.lin_r"),
        "mlp_node": node_p,
    }
    stats = {"nn": nn_s, "mlp_node": node_s}
    return params, stats


def convert_state_dict(sd: Mapping[str, np.ndarray], n_blocks: int = 2):
    """Canonical reference SparseCADGCN state dict -> our flax variables
    {'params': ..., 'batch_stats': ...} (numpy leaves)."""
    sd = strip_module_prefix(sd)

    cls_params: dict = {}
    cls_stats: dict = {}
    p, s = _convert_gp2(sd, "cls_net.head.gconv")
    cls_params["AttrEdgeGP2_0"] = p
    cls_stats["AttrEdgeGP2_0"] = s
    for i in range(n_blocks - 1):
        p, s = _convert_gp2(sd, f"cls_net.backbone.{i}.body.gconv")
        cls_params[f"AttrEdgeGP2_{i + 1}"] = p
        cls_stats[f"AttrEdgeGP2_{i + 1}"] = s
    for name in ("fusion_block", "fusion_block_super"):
        p, s = _convert_mlp(sd, f"cls_net.{name}")
        cls_params[name] = p
        cls_stats[name] = s

    params: dict = {"cls_net": cls_params}
    stats: dict = {"cls_net": cls_stats}
    for k in _children(sd, "prediction_cls"):
        p, s = _convert_mlp(sd, f"prediction_cls.{k}")
        params[f"pred_{k}"] = p
        if s:
            stats[f"pred_{k}"] = s
    return {"params": params, "batch_stats": stats}


def _export_mlp(params: Mapping, stats: Mapping, prefix: str) -> dict:
    """Our MLP subtree -> reference flat-Sequential keys.

    Inverse of `_convert_mlp`. Sequential indices follow torch_nn.MLP's
    construction (gcn_lib/sparse/torch_nn.py:50-71): Lin, then — unless the
    stage is bare — BN and an activation layer (tensorless, but it consumes
    an index). In the canonical model a stage has BN iff it has an
    activation, so BN presence in our tree determines the layout; Dropout2d
    stages only ever trail the final Lin there, shifting no keyed module.
    """
    out: dict = {}
    n_stage = sum(1 for k in params if k.startswith("dense_"))
    idx = 0
    for k in range(n_stage):
        d = params[f"dense_{k}"]
        out[f"{prefix}.{idx}.weight"] = np.asarray(d["kernel"]).T.copy()
        if "bias" in d:
            out[f"{prefix}.{idx}.bias"] = np.asarray(d["bias"])
        idx += 1
        if f"bn_{k}" in params:
            b, st = params[f"bn_{k}"], stats[f"bn_{k}"]
            out[f"{prefix}.{idx}.weight"] = np.asarray(b["scale"])
            out[f"{prefix}.{idx}.bias"] = np.asarray(b["bias"])
            out[f"{prefix}.{idx}.running_mean"] = np.asarray(st["mean"])
            out[f"{prefix}.{idx}.running_var"] = np.asarray(st["var"])
            out[f"{prefix}.{idx}.num_batches_tracked"] = np.zeros((), np.int64)
            idx += 2  # BN + the activation layer's index
    return out


def _export_linear(p: Mapping, prefix: str) -> dict:
    out = {f"{prefix}.weight": np.asarray(p["kernel"]).T.copy()}
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
    return out


def export_state_dict(variables: Mapping, n_blocks: int = 2) -> dict:
    """Our flax variables -> the reference's torch state dict (numpy
    leaves). Inverse of `convert_state_dict`: the result loads into the
    reference SparseCADGCN with ``load_state_dict(strict=True)``."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: dict = {}
    cls_p, cls_s = params["cls_net"], stats.get("cls_net", {})
    for i in range(n_blocks):
        name = f"AttrEdgeGP2_{i}"
        ref = ("cls_net.head.gconv" if i == 0
               else f"cls_net.backbone.{i - 1}.body.gconv")
        p, s = cls_p[name], cls_s.get(name, {})
        out.update(_export_mlp(p["nn"], s.get("nn", {}), f"{ref}.nn"))
        out.update(_export_linear(p["lin_r"], f"{ref}.lin_r"))
        out.update(_export_mlp(p["mlp_node"], s.get("mlp_node", {}),
                               f"{ref}.mlp_node"))
    for name in ("fusion_block", "fusion_block_super"):
        out.update(_export_mlp(cls_p[name], cls_s.get(name, {}),
                               f"cls_net.{name}"))
    k = 0
    while f"pred_{k}" in params:
        out.update(_export_mlp(params[f"pred_{k}"],
                               stats.get(f"pred_{k}", {}),
                               f"prediction_cls.{k}"))
        k += 1
    return out


def save_reference_checkpoint(variables: Mapping, path: str,
                              n_blocks: int = 2, epoch: int = 0) -> None:
    """Write a reference-format .pth ({'state_dict': ...},
    utils/ckpt_util.py:107-111) loadable by the reference's own drivers."""
    import torch

    # copy: jax.device_get leaves can be non-writable views, which torch
    # tensors cannot wrap
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in export_state_dict(variables, n_blocks=n_blocks).items()}
    torch.save({"state_dict": sd, "epoch": epoch}, path)


def state_from_pth(state, path: str, n_blocks: int = 2):
    """Return `state` with params/batch_stats from a reference .pth.

    The drop-in migration path for `--pretrained_model <ckpt>.pth`
    (the reference's checkpoint files, utils/ckpt_util.py:107-111):
    step/opt_state are left at their initial values — the reference
    optimizer state (torch Adam moments) is not portable across frameworks.
    """
    import jax
    import jax.numpy as jnp

    variables = convert_state_dict(load_reference_state_dict(path),
                                   n_blocks=n_blocks)
    v = jax.tree.map(jnp.asarray, variables)
    return state.replace(params=v["params"], batch_stats=v["batch_stats"])


def load_reference_state_dict(path: str) -> dict:
    """torch.load a reference .pth and return its numpy model state dict.

    Handles the reference's checkpoint layout ({'state_dict': ...} /
    {'model_state_dict': ...} / a bare state dict) and DataParallel
    prefixes."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for key in ("state_dict", "model_state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    sd = {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
          else np.asarray(v) for k, v in obj.items()
          if hasattr(v, "shape") or np.isscalar(v)}
    return strip_module_prefix(sd)
