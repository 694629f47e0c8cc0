"""Command-line drivers: preprocess, train, test, detect.

Usage mirrors the reference's cad_recognition scripts:
  python -m yolat_tpu.cli.preprocess --data_dir data/FloorPlansGraph5_iter
  python -m yolat_tpu.cli.train --batch_size 4 --data_dir ... --lr 2.5e-4 \
      --in_channels 5 --n_blocks 2 --n_blocks_out 2 \
      --arch centernet3cc_rpn_gp_iter2 --graph bezier_cc_bb_iter \
      --data_aug true --weight_decay 1e-5 --bbox_sampling_step 10
  python -m yolat_tpu.cli.test --pretrained_model <ckpt> --data_dir ...
  python -m yolat_tpu.cli.detect --pretrained_model <ckpt> --data_dir ...
"""
