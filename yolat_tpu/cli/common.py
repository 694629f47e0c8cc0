"""Shared CLI argument parsing.

Flag names keep the reference spelling (cad_recognition/config.py:27-85) so
the README commands translate verbatim; values land in the typed Config.
"""

from __future__ import annotations

import argparse

from yolat_tpu.train.config import Config


def _bool(v) -> bool:
    # the reference uses argparse type=bool, where any non-empty string is
    # True ("--data_aug true" AND "--data_aug false" both enable); we parse
    # properly but accept the same spellings
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "yes", "y")


# Named flag bundles ("flagship profiles"). Each entry maps Config fields to
# the measured-best values; VALIDATION.md carries the evidence rows. Some
# flags are domain-conditional (keyed on the data_dir naming convention the
# reference itself uses for class dicts, graph_dict3.py:57):
#   "unless_chart" — applied everywhere EXCEPT chart datasets (the abs-IoU
#     quality target wins the floorplans n32 gate but lost both chart
#     step-20 metrics, VALIDATION.md rounds 4-5)
#   "when_chart" — applied ONLY on chart datasets (dense thin-box sweeps:
#     pos_class_weight 16 + sibling-relative quality targets took the
#     step-20 gate 0.619 -> 0.861 mAP@0.5, VALIDATION.md round 5)
PROFILES = {
    "yolat_pp_fast": {
        "always": {"arch": "yolat_pp", "pp_factored_prim": True},
        # mode 'rel' everywhere: on floorplans the best sibling is
        # GT-exact so q_rel == q and the n32 gate reproduces the abs arm
        # BIT-IDENTICALLY (artifacts_r5/gate_pp_iou_rel_n32.json); on
        # dense sweeps rel is the measured winner
        "unless_chart": {"iou_aware_loss": True, "iou_aware_mode": "rel"},
        "when_chart": {"pos_class_weight": 16.0, "iou_aware_loss": True,
                       "iou_aware_mode": "rel"},
    },
}


def _explicit_flags(argv) -> set:
    """Flag dests the user actually typed (vs parser defaults): re-parse
    argv with SUPPRESS defaults so only given flags land in the namespace."""
    p = build_parser("explicit-flag probe")
    for a in p._actions:
        a.default = argparse.SUPPRESS
    ns, _ = p.parse_known_args(argv)
    return set(vars(ns))


def apply_profile(kw: dict, profile: str, explicit: set) -> dict:
    """Overlay a PROFILES bundle onto Config kwargs; explicit CLI flags win."""
    import os as _os

    bundle = PROFILES[profile]
    # scope the naming convention to the dataset directory NAME (matching
    # anywhere in the path would silently switch hyperparameters for e.g.
    # /home/chartrand/FloorPlans...)
    base = _os.path.basename(
        _os.path.normpath(str(kw.get("data_dir", ""))))
    is_chart = "chart" in base.lower()
    if is_chart and bundle.get("when_chart"):
        print(f"--profile {profile}: chart dataset detected "
              f"({base!r}) — applying the chart recipe "
              f"{bundle['when_chart']}")
    overrides = dict(bundle["always"])
    if is_chart:
        overrides.update(bundle.get("when_chart", {}))
    else:
        overrides.update(bundle.get("unless_chart", {}))
    for field, value in overrides.items():
        if field not in explicit:
            kw[field] = value
    return kw


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    d = Config()
    # base
    p.add_argument("--phase", default=d.phase, type=str)
    p.add_argument("--exp_name", default=d.exp_name, type=str)
    p.add_argument("--root_dir", default=d.root_dir, type=str)
    # dataset
    p.add_argument("--data_dir", default=d.data_dir, type=str)
    p.add_argument("--batch_size", default=d.batch_size, type=int)
    p.add_argument("--in_channels", default=d.in_channels, type=int)
    p.add_argument("--graph", default=d.graph, type=str)
    p.add_argument("--bbox_sampling_step", default=d.bbox_sampling_step, type=int)
    p.add_argument("--data_aug", default=d.data_aug, type=_bool)
    p.add_argument("--do_mixup", default=d.do_mixup, type=float)
    p.add_argument("--drop_edge", default=d.drop_edge, type=float)
    p.add_argument("--pos_edge_th", default=d.pos_edge_th, type=float)
    # train
    p.add_argument("--total_epochs", default=d.total_epochs, type=int)
    p.add_argument("--lr", default=d.lr, type=float)
    p.add_argument("--lr_adjust_freq", default=d.lr_adjust_freq, type=float)
    p.add_argument("--lr_decay_rate", default=d.lr_decay_rate, type=float)
    p.add_argument("--weight_decay", default=d.weight_decay, type=float)
    p.add_argument("--seed", default=d.seed, type=int)
    p.add_argument("--print_freq", default=d.print_freq, type=int)
    p.add_argument("--optimizer", default=d.optimizer, type=str)
    p.add_argument("--postname", default="", type=str)
    # model
    p.add_argument("--arch", default=d.arch, type=str)
    p.add_argument("--conv", default=d.conv, type=str)
    p.add_argument("--act", default=d.act, type=str)
    p.add_argument("--norm", default=d.norm, type=str)
    p.add_argument("--bias", default=d.bias, type=_bool)
    p.add_argument("--n_filters", default=d.n_filters, type=int)
    p.add_argument("--n_blocks", default=d.n_blocks, type=int)
    p.add_argument("--n_blocks_out", default=d.n_blocks_out, type=int)
    p.add_argument("--dropout", default=d.dropout, type=float)
    p.add_argument("--classifier", default=d.classifier, type=str)
    p.add_argument("--k", default=d.k, type=int)
    p.add_argument("--epsilon", default=d.epsilon, type=float)
    p.add_argument("--stochastic", default=d.stochastic, type=_bool)
    p.add_argument("--pretrained_model", default="", type=str)
    # eval
    p.add_argument("--eval_start", default=d.eval_start, type=int)
    p.add_argument("--map_step", default=d.map_step, type=int)
    p.add_argument("--nms_algorithm", default=d.nms_algorithm, type=str,
                   choices=("fixpoint", "classfix", "loop"))
    p.add_argument("--nms_topk", default=d.nms_topk, type=int)
    # tpu
    p.add_argument("--n_devices", default=d.n_devices, type=int)
    p.add_argument("--dtype", default=d.dtype, type=str,
                   choices=("float32", "bfloat16", "bf16"),
                   help="training compute dtype; bfloat16 = mixed precision "
                        "(bf16 matmuls, f32 master weights and BN stats)")
    p.add_argument("--remat", default=d.remat, type=_bool,
                   help="rematerialise fusion/message MLPs (memory lever)")
    p.add_argument("--dense_layout", default=d.dense_layout, type=_bool,
                   help="dense neighbour-table layout (TPU-preferred)")
    p.add_argument("--train_layout", default=d.train_layout, type=str,
                   choices=("sparse", "window", "dense"),
                   help="conv edge layout for training: sparse dst-sorted "
                        "list, banded Pallas window kernels (custom VJPs), "
                        "or the dense D-slot table")
    p.add_argument("--pp_banded_super", default=d.pp_banded_super, type=_bool,
                   help="YOLaT++ training: banded custom-VJP clique route "
                        "(measured neutral; PERF.md)")
    p.add_argument("--pp_factored_prim", default=d.pp_factored_prim,
                   type=_bool,
                   help="YOLaT++ v2 primitive level: aggregate-then-"
                        "activate prefix-sum clique aggregation "
                        "(quality-gated variant; PERF.md round 4)")
    p.add_argument("--fused_head_train", default=d.fused_head_train,
                   type=_bool,
                   help="train-mode fused pool head: closed-form Gram BN "
                        "stats + VMEM-confined fusion activations "
                        "(ops/fused_pool_train.py)")
    p.add_argument("--iou_aware_loss", default=d.iou_aware_loss, type=_bool,
                   help="quality-focal soft targets: positive proposals "
                        "train toward {class: q, background: 1-q} so "
                        "confidence orders overlapping proposals by quality")
    p.add_argument("--pos_class_weight", default=d.pos_class_weight,
                   type=float,
                   help="positive-row loss weight (weighted mean): >1 "
                        "counters extreme background imbalance on dense "
                        "sweeps (chart step-20); 1.0 = reference-exact")
    p.add_argument("--iou_aware_mode", default=d.iou_aware_mode, type=str,
                   choices=("abs", "rel"),
                   help="q for --iou_aware_loss: 'abs' = IoU vs matched GT; "
                        "'rel' = IoU / best sibling IoU (rank-preserving, "
                        "no positive starvation on dense thin-box sweeps)")
    p.add_argument("--buckets", default=d.buckets, type=int,
                   help="size-bucketed padding: compiled programs per loader")
    p.add_argument("--scan_steps", default=d.scan_steps, type=int,
                   help="train steps per device dispatch (lax.scan chain)")
    # multi-host (one process per host; n_devices = GLOBAL device count)
    p.add_argument("--coordinator", default=d.coordinator, type=str,
                   help="jax.distributed coordinator host:port")
    p.add_argument("--process_id", default=d.process_id, type=int)
    p.add_argument("--n_processes", default=d.n_processes, type=int,
                   help=">1 enables multi-process (multi-host) execution")
    p.add_argument("--profile", default=d.profile, type=str,
                   choices=tuple(PROFILES) + ("",),
                   help="named flag bundle (explicit flags win): "
                        "yolat_pp_fast = arch yolat_pp + pp_factored_prim "
                        "+ iou_aware_loss (mode rel); chart datasets "
                        "instead get the measured chart recipe "
                        "(pos_class_weight 16 + iou_aware rel) — "
                        "VALIDATION.md 'Chart-VG at step 20'")
    return p


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS in-process (standard JAX semantics).

    The axon TPU PJRT plugin in this image registers via sitecustomize and
    overrides the JAX_PLATFORMS environment variable; when its tunnel is
    down, backend init hangs instead of raising. `jax.config.update` wins
    over the plugin as long as no backend has been initialised yet, so
    re-applying the env var here restores `JAX_PLATFORMS=cpu python -m
    yolat_tpu.cli.train ...` as a working escape hatch (same mechanism as
    __graft_entry__._force_cpu_platform and tests/conftest.py)."""
    import os

    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backend already initialised


def enable_compilation_cache(path: str = "/tmp/yolat_xla_cache") -> None:
    """Persistent XLA compilation cache: first compiles through a
    remote-attached device link run 20s-minutes; cached reloads are
    sub-second. Keyed on program + compiler version, safe to share across
    runs. No-op if the backend rejects it."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def config_from_args(args, argv=None) -> Config:
    """Build a Config from parsed args; pass the same `argv` given to
    parse_args so --profile can tell explicit flags from defaults."""
    apply_platform_env()
    enable_compilation_cache()
    fields = set(Config.__dataclass_fields__)
    kw = {k: v for k, v in vars(args).items() if k in fields}
    kw["lr_adjust_freq"] = int(min(args.lr_adjust_freq, 10 ** 9))
    profile = kw.get("profile", "")
    if profile:
        kw = apply_profile(kw, profile, _explicit_flags(argv))
    return Config(**kw)
