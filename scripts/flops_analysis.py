"""Pin the performance denominator: analytic reference-model FLOPs,
derived reference-GPU throughput estimate, and our measured TPU MFU.

The reference repo publishes no benchmark numbers (SURVEY.md section 6) and
cannot run here (no torch_geometric/torch_scatter, no GPU), so the ">= Nx
faster" claim needs a defensible denominator. This script produces one:

1. Analytic FLOPs/image of the canonical reference model
   (architecture3cc_rpn_gp_iter2.py:15-137), term by term from the module
   dims, evaluated at the measured workload statistics (nodes/edges/
   proposals per image of the bench scenes). The math is identical for our
   model — same architecture contract — so this is also OUR model FLOPs.
2. XLA cost-analysis FLOPs of our compiled serving program on the same
   workload (cross-check: includes NMS + gathers that the analytic count
   omits).
3. Roofline-derived reference-GPU throughput brackets: FLOPs/image vs the
   published peak of the reference's era hardware
   (deepgcn_env_install.sh:11 targets cu102-era V100/2080Ti), at 100% MFU
   (impossible upper bound) and at a realistic sparse-GNN MFU band.
4. Our measured TPU MFU at the recorded bench throughput.

Run: python scripts/flops_analysis.py  [--bench-rate 257 --train-rate 135]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

# ---------------------------------------------------------------- analytic

# canonical dims (architecture3cc_rpn_gp_iter2.py + config defaults)
C = 64            # n_filters
C_IN = 5          # in_channels
E_ATTR = 4        # edge attr dims fed to the message MLP
N_BLOCKS = 2
N_BLOCKS_OUT = 2
FUSION = C * N_BLOCKS_OUT          # 128
LOCAL_OUT = 1024                   # fusion MLP width
HEAD1, HEAD2 = 512, 256
N_CLASSES = 17


def reference_flops_per_image(n_nodes: float, n_edges: float,
                              n_proposals: float) -> dict:
    """Analytic MAC counts (x2 = FLOPs) of one forward pass.

    Terms follow the canonical wiring (SURVEY.md section 2.2):
      head conv  AttrRelativeEdgeConvGlobalPool2(5 -> 64)
                 message MLP [2*5+4=14 -> 64 -> 64] per edge, lin_r
                 [5 -> 64] per node, node-stream MLP [5 -> 64] per node
      res conv   same conv at 64: message [2*64+4=132 -> 64 -> 64],
                 lin_r [64 -> 64], node MLP [64 -> 64]
      fusion     local MLP [128 -> 1024] per node,
                 super MLP [128 -> 1024] per proposal (after scatter_mean)
      head       MLPs [2304 -> 512 -> 256 -> 17] per proposal
    """
    N, E, P = n_nodes, n_edges, n_proposals

    def mlp2(e, d_in, d_h, d_out):
        return e * (d_in * d_h + d_h * d_out)

    macs = 0.0
    # head conv (5 -> 64)
    macs += mlp2(E, 2 * C_IN + E_ATTR, C, C)        # message MLP
    macs += N * C_IN * C                            # lin_r skip
    macs += N * C_IN * C                            # node-stream MLP
    # n_blocks - 1 res conv(s) at 64
    macs += (N_BLOCKS - 1) * (
        mlp2(E, 2 * C + E_ATTR, C, C) + N * C * C + N * C * C
    )
    # fusion MLPs
    macs += N * FUSION * LOCAL_OUT                  # local stream
    macs += P * FUSION * LOCAL_OUT                  # super stream
    # prediction head over [P, 2304]
    head_in = (FUSION + LOCAL_OUT) * 2              # 2304
    macs += P * (head_in * HEAD1 + HEAD1 * HEAD2 + HEAD2 * N_CLASSES)
    return {"macs": macs, "flops": 2 * macs}


# ------------------------------------------------------------ measurement


def measured_workload_stats():
    """Node/edge/proposal statistics of the bench workload (the same
    scenes bench.py times)."""
    from bench import build_workload

    ds, batches, _ = build_workload()
    n_imgs = sum(int(b["n_images"][0]) for b in batches)
    stats = {"n_images": n_imgs}
    tot_nodes = tot_edges = tot_props = 0
    for i in range(len(ds)):
        pf, _, _ = ds.load(i)
        tot_nodes += len(pf.pos)
        tot_edges += len(pf.edge)
        tot_props += pf.n_proposals
    n = len(ds)
    stats.update(
        nodes_per_image=tot_nodes / n,
        edges_per_image=tot_edges / n,
        proposals_per_image=tot_props / n,
    )
    return stats, batches


def compiled_serving_flops(batches) -> dict:
    """XLA cost analysis of the compiled fast-serving program (forward +
    NMS) per image — the cross-check for the analytic count."""
    from yolat_tpu.cli.common import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS in-process (axon plugin)
    import jax

    from yolat_tpu.eval.fast_forward import fold_params
    from yolat_tpu.eval.predict import make_predict_fn
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    cfg = Config(n_classes=17, data_aug=False)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded = fold_params(variables, n_blocks=cfg.n_blocks)
    predict = make_predict_fn(cfg, max_det=300, fast=True, folded=folded,
                              bf16=True)
    compiled = jax.jit(predict).lower(variables, single).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    n_images = int(single["n_images"])
    return {
        "compiled_flops_per_image": costs.get("flops", 0.0) / n_images,
        "compiled_bytes_per_image": costs.get("bytes accessed", 0.0)
        / n_images,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench-rate", type=float, default=257.0,
                    help="recorded detect img/s/chip (bench.py, bf16)")
    ap.add_argument("--train-rate", type=float, default=135.0,
                    help="recorded train img/s/chip (bf16)")
    ap.add_argument("--skip-compile", action="store_true")
    args = ap.parse_args()

    stats, batches = measured_workload_stats()
    ana = reference_flops_per_image(
        stats["nodes_per_image"], stats["edges_per_image"],
        stats["proposals_per_image"],
    )

    out = {"workload": stats, "analytic": ana}

    if not args.skip_compile:
        out["compiled"] = compiled_serving_flops(batches)

    F = ana["flops"]
    # reference-era GPU peaks (published vendor specs)
    V100_FP32 = 15.7e12
    TI2080_FP32 = 13.4e12
    # sparse-GNN forward MFU on GPU is gather/scatter-bound; published
    # GNN benchmarking consistently lands low single digits to ~15%
    MFU_BAND = (0.05, 0.15)
    out["reference_estimate"] = {
        "flops_per_image": F,
        "v100_100pct_mfu_img_per_s": V100_FP32 / F,
        "v100_realistic_img_per_s": [MFU_BAND[0] * V100_FP32 / F,
                                     MFU_BAND[1] * V100_FP32 / F],
        "rtx2080ti_realistic_img_per_s": [MFU_BAND[0] * TI2080_FP32 / F,
                                          MFU_BAND[1] * TI2080_FP32 / F],
        "note": "upper bound assumes zero NMS/gather/host cost",
    }

    V5E_BF16 = 197e12
    V5E_HBM = 819e9  # bytes/s
    fwd = out.get("compiled", {}).get("compiled_flops_per_image", F)
    fwd_bytes = out.get("compiled", {}).get("compiled_bytes_per_image", 0.0)
    out["our_mfu"] = {
        "serving_flops_per_image": fwd,
        "detect_mfu_at_bench_rate": args.bench_rate * fwd / V5E_BF16,
        # train ~= 3x forward FLOPs (fwd + 2x bwd)
        "train_mfu_at_bench_rate": args.train_rate * 3 * fwd / V5E_BF16,
        "chip_peak_bf16_flops": V5E_BF16,
    }
    if fwd_bytes:
        # the load-bearing roofline: the op mix is gather/scatter/segment-
        # reduce over [N, C] features — bandwidth-bound, not MXU-bound
        out["our_hbm_roofline"] = {
            "bytes_per_image": fwd_bytes,
            "hbm_roofline_img_per_s": V5E_HBM / fwd_bytes,
            "fraction_of_hbm_roofline_at_bench_rate":
                args.bench_rate * fwd_bytes / V5E_HBM,
            "chip_hbm_bytes_per_s": V5E_HBM,
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
