"""Offline preprocessing driver.

Counterpart of utils/svg_utils/build_graph_bbox.py (floorplans) and
build_graph_bbox_diagram.py (diagrams) __main__s: builds and caches the
per-file graph dicts and proposal sets for both splits, and writes the
dataset-wide super-edge attribute stats (angles/distances mean/std — the
reference's stats.pkl, build_graph_bbox.py:377-381)."""

import argparse
import json
import os
import pickle
import time

import numpy as np

from yolat_tpu.data.dataset import SESYDDataset


def main(argv=None):
    p = argparse.ArgumentParser(description="yolat_tpu preprocessing")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--bbox_sampling_step", default=10, type=int)
    p.add_argument("--mode", default=None, choices=[None, "floorplan", "diagram"])
    p.add_argument("--partitions", default="train,test", type=str)
    args = p.parse_args(argv)

    angles, dists = [], []
    for part in args.partitions.split(","):
        list_path = os.path.join(args.data_dir, f"{part}_list.txt")
        if not os.path.exists(list_path):
            print(f"skip partition {part}: no {list_path}")
            continue
        ds = SESYDDataset(args.data_dir, part, args.bbox_sampling_step,
                          mode=args.mode)
        t0 = time.time()
        for i in range(len(ds)):
            ds.load(i)
            g = ds._graph(ds.files[i])
            ea = g["edge_attr"]["super"]
            if len(ea):
                angles.append(ea[:, 4])
                dists.append(ea[:, 5])
            print(f"[{part} {i + 1}/{len(ds)}] {ds.files[i]}")
        print(f"{part}: {len(ds)} files in {time.time() - t0:.1f}s")

    if angles:
        a = np.concatenate(angles)
        d = np.concatenate(dists)
        stats = {
            "angles": {"mean": float(a.mean()), "std": float(a.std())},
            "distances": {"mean": float(d.mean()), "std": float(d.std())},
        }
        with open(os.path.join(args.data_dir, "stats.pkl"), "wb") as f:
            pickle.dump(stats, f)
        print(json.dumps(stats))


if __name__ == "__main__":
    main()
