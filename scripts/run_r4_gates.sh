#!/bin/bash
# Round-4 quality gates, run sequentially on the TPU (each ~10-25 min):
#   1. canonical n32 gate    (baseline for the tail comparison)
#   2. yolat_pp n32 gate     (reproduces the round-3 high-IoU tail)
#   3. yolat_pp n32 + --iou_aware   (the tail fix candidate:
#      quality-focal soft targets from packed label_iou)
#   4. yolat_pp n32 + --factored    (v2 prefix-sum primitive level,
#      1.92x train throughput — different function family, so its
#      quality is gated here, not parity-tested)
#   5. yolat_pp n32 + --factored --iou_aware (the combined flagship
#      candidate)
#   6. chart-VG gate         (VERDICT r3 item 3: trained mAP row)
# Artifacts land in /root/repo/artifacts_r4/ so they survive the session.
set -ex
cd /root/repo
OUT=/root/repo/artifacts_r4
mkdir -p "$OUT"

GATE_ARGS="--epochs 200 --step 10 --batch_size 4 --n_train 12 --n_test 32 \
  --width 1200 --height 900 --scan_steps 3 --eval_start 100"

if [ ! -f "$OUT/gate_canonical_n32.json" ]; then
  python scripts/validate_training.py $GATE_ARGS \
    --root /tmp/yolat_gate_r4 \
    --out "$OUT/gate_canonical_n32.json"
fi

python scripts/validate_training.py $GATE_ARGS --arch yolat_pp \
  --root /tmp/yolat_gate_r4 \
  --out "$OUT/gate_pp_n32.json"

python scripts/validate_training.py $GATE_ARGS --arch yolat_pp --iou_aware \
  --root /tmp/yolat_gate_r4 \
  --out "$OUT/gate_pp_iou_aware_n32.json"

python scripts/validate_training.py $GATE_ARGS --arch yolat_pp --factored \
  --root /tmp/yolat_gate_r4 \
  --out "$OUT/gate_pp_factored_n32.json"

python scripts/validate_training.py $GATE_ARGS --arch yolat_pp --factored \
  --iou_aware \
  --root /tmp/yolat_gate_r4 \
  --out "$OUT/gate_pp_factored_iou_n32.json"

python scripts/validate_training.py --dataset charts --epochs 150 \
  --step 10 --batch_size 4 --n_train 16 --n_test 16 --eval_start 80 \
  --root /tmp/yolat_charts_r4 \
  --out "$OUT/gate_charts.json"

echo GATES_DONE
