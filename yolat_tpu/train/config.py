"""Typed configuration.

Replaces the reference's argparse grab-bag (cad_recognition/config.py:22-110,
~40 flags mutated at runtime) with an immutable dataclass. Field names keep
the reference CLI spelling (--arch, --graph, --bbox_sampling_step,
--n_blocks, ...) so commands translate 1:1; defaults follow the canonical
README commands (README.md:47,52) rather than the reference's stale argparse
defaults where they differ (marked below).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Config:
    # base
    phase: str = "train"
    exp_name: str = "yolat_tpu"
    root_dir: str = "log"

    # dataset
    data_dir: str = "data/FloorPlansGraph5_iter"
    batch_size: int = 4
    in_channels: int = 5            # canonical (README); argparse default was 6
    graph: str = "bezier_cc_bb_iter"
    bbox_sampling_step: int = 10    # 5 for diagrams
    data_aug: bool = True
    do_mixup: float = 0.0
    drop_edge: float = 0.0
    pos_edge_th: float = 5e-3

    # train
    total_epochs: int = 200
    lr: float = 2.5e-4              # canonical; argparse default was 1e-3
    lr_adjust_freq: int = 10 ** 9   # canonical: StepLR effectively disabled
    lr_decay_rate: float = 0.5
    weight_decay: float = 1e-5
    seed: int = 0
    print_freq: int = 5
    optimizer: str = "adam"         # adam | adamw | radam (utils/optim.py parity)

    # model
    arch: str = "centernet3cc_rpn_gp_iter2"
    conv: str = "attr_edge_gp2"     # Backbone hardcodes this (architecture...py:22)
    act: str = "relu"
    norm: str = "batch"
    bias: bool = True
    n_filters: int = 64
    n_blocks: int = 2
    n_blocks_out: int = 2
    dropout: float = 0.0
    classifier: str = "softmax"
    n_classes: int = 17             # set from the dataset at runtime
    k: int = 16                     # kNN neighbour count (dynamic-graph blocks)
    epsilon: float = 0.2
    stochastic: bool = True

    # eval
    eval_start: int = 20            # eval every epoch from here (train.py:227)
    map_step: int = 10
    max_det: int = 300
    nms_iou: float = 0.5
    nms_conf: float = 0.0
    nms_algorithm: str = "fixpoint" # 'fixpoint' (top-nms_topk offset matrix)
                                    # | 'classfix' (per-class, exact over
                                    # ALL candidates) | 'loop' (sequential
                                    # oracle)
    nms_topk: int = 1024            # fixpoint-NMS candidate cap (the analog
                                    # of the reference's max_nms=30000 score
                                    # truncation; raise for exactness on
                                    # dense scenes, memory is O(topk^2)).
                                    # On-chip sweep (scripts/nms_topk_sweep
                                    # .py, v5e 2026-08-17): 512/1024/2048/
                                    # 4096 ALL detection-exact vs the
                                    # unbounded greedy loop on the bench
                                    # workload at untrained (near-flat,
                                    # worst-case) scores. Re-justified at
                                    # TRAINED scores on the densest (chart
                                    # step-20, 7.2k proposals/image, capped
                                    # layout) workload: 1024..8192 give
                                    # bit-identical mAP and classfix moves
                                    # it +-0.0002 (PERF.md round 5,
                                    # scripts/chart_nms_probe.py).
    nms_approx_topk: bool = False   # lax.approx_max_k candidate selection
                                    # (TPU partial reduction instead of the
                                    # full M*K sort); winners re-sorted so
                                    # greedy order is exact among them —
                                    # deviations confined to ranks near
                                    # nms_topk. Measured round 5 at the
                                    # capped layout: detection-exact on
                                    # the bench workload but SLOWER
                                    # (1366 vs 1407 img/s) — the slot cap
                                    # already shrank the candidate set to
                                    # where full top_k wins. Off by
                                    # measurement (PERF.md round 5).

    # TPU execution
    remat: bool = False             # rematerialise fusion/message MLPs
    n_devices: int = 1
    dtype: str = "float32"
    dense_layout: bool = True       # dense neighbour tables for SERVING
                                    # (folded-BN fast path); training always
                                    # runs the sparse sorted-edge branch
                                    # unless train_layout='dense'
    train_layout: str = "sparse"    # 'sparse' (dst-sorted edge list — the
                                    # fast train path: 4x fewer message rows
                                    # than the D-slot table at SESYD degree
                                    # skew), 'window' (banded one-hot Pallas
                                    # gathers/scatters with custom VJPs,
                                    # ops/edge_window_train.py), or 'dense'
    sorted_edges: bool = True       # pack_files emits dst-sorted edges; set
                                    # False only for ad-hoc batch sources
    pp_banded_super: bool = False   # YOLaT++ training: route the super-edge
                                    # clique family through the custom-VJP
                                    # banded primitives (ops/banded_train.py;
                                    # attaches the sew_ plan to train batches)
    pp_factored_prim: bool = False  # YOLaT++ v2 primitive level: aggregate-
                                    # then-activate over the per-proposal
                                    # prefix sum (nn/yolat_pp.py) — the
                                    # 372k-row per-edge clique MLP collapses
                                    # to per-node work; quality-gated variant
    fused_head_train: bool = False  # train-mode fused pool head: the fusion
                                    # MLP's BN stats come from closed-form
                                    # Gram moments and its [N, 1024]
                                    # activations never touch HBM
                                    # (ops/fused_pool_train.py custom VJP);
                                    # falls back silently when a batch has
                                    # no aligned pool plan
    iou_aware_loss: bool = False    # quality-focal-style soft targets: a
                                    # positive proposal trains toward
                                    # {class: q, background: 1-q} so
                                    # confidence orders overlapping
                                    # proposals by localisation quality
                                    # (beyond-reference; nn/model.py
                                    # detection_loss label_iou)
    pos_class_weight: float = 1.0   # multiply positive proposals' loss
                                    # rows (weighted mean): the dense-sweep
                                    # class-imbalance lever (chart step-20:
                                    # positives ~0.5% of rows starved TP
                                    # confidence — PERF.md round 5).
                                    # 1.0 = reference-exact
    iou_aware_mode: str = "abs"     # q = 'abs' (IoU vs matched GT — the
                                    # floorplans n32 winner) | 'rel' (IoU /
                                    # best sibling IoU of the same GT: the
                                    # best sibling keeps the full hard
                                    # target, so dense thin-box sweeps
                                    # aren't starved — VALIDATION.md
                                    # "Chart-VG at step 20", round 5)
    buckets: int = 1                # size-bucketed padding (programs per loader)
    scan_steps: int = 1             # train steps per device dispatch (lax.scan
                                    # chain; amortises remote-link latency)
    # multi-host: one process per host; n_devices counts GLOBAL devices.
    # The modern equivalent of the reference's broken DataParallel vestige
    # (train.py:204-205) — see parallel/distributed.py
    coordinator: str = ""           # coordinator host:port (process 0's)
    process_id: int = 0
    n_processes: int = 0            # 0/1 = single-process
    pretrained_model: str = ""
    profile: str = ""               # named flag bundle applied at parse time
                                    # (cli/common.py PROFILES; the analog of
                                    # the reference's README-command-as-spec
                                    # convention, README.md:47,52). Explicit
                                    # CLI flags always win over the bundle.

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
