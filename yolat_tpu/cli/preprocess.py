"""Offline preprocessing driver.

Counterpart of utils/svg_utils/build_graph_bbox.py (floorplans) and
build_graph_bbox_diagram.py (diagrams) __main__s: builds and caches the
per-file graph dicts and proposal sets for both splits, and writes the
dataset-wide super-edge attribute stats (angles/distances mean/std — the
reference's stats.pkl, build_graph_bbox.py:377-381).

--hierarchical additionally emits the YOLaT++ super-node graph per file
(build_graph_hierarchical.py parity) as <file>.hier.v{N}.pkl.

--workers N parallelises the per-file loop across processes (the reference
preprocessor is single-process; real TPU hosts have many cores and the
per-file work is independent — caches are per-file so workers never race).
"""

import argparse
import json
import os
import pickle
import time

import numpy as np

from yolat_tpu.data.dataset import CACHE_VERSION, SESYDDataset

_WORKER_DS = None
_WORKER_HIER = False


def _init_worker(root, part, step, mode, hierarchical):
    global _WORKER_DS, _WORKER_HIER
    _WORKER_DS = SESYDDataset(root, part, step, mode=mode)
    _WORKER_HIER = hierarchical


def _process_file(i: int):
    ds = _WORKER_DS
    ds.load(i)
    g = ds._graph(ds.files[i])
    if _WORKER_HIER:
        _emit_hierarchical(ds.files[i], g)
    ea = np.asarray(g["edge_attr"]["super"])
    if len(ea):
        return ea[:, 4], ea[:, 5]
    return np.zeros(0), np.zeros(0)


def _emit_hierarchical(path: str, g: dict):
    from yolat_tpu.geom.hierarchical import build_hierarchical_graph

    out = path.replace(".svg", f".hier.v{CACHE_VERSION}.pkl")
    if not os.path.exists(out):
        with open(out, "wb") as f:
            pickle.dump(build_hierarchical_graph(g), f)


def main(argv=None):
    p = argparse.ArgumentParser(description="yolat_tpu preprocessing")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--bbox_sampling_step", default=10, type=int)
    p.add_argument("--mode", default=None, choices=[None, "floorplan", "diagram", "chart"])
    p.add_argument("--partitions", default="train,test", type=str)
    p.add_argument("--workers", default=0, type=int,
                   help="parallel preprocessing processes (0 = in-process)")
    p.add_argument("--hierarchical", action="store_true",
                   help="also emit YOLaT++ hierarchical graphs "
                        "(build_graph_hierarchical.py parity)")
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
        if args.workers > 0:
            import multiprocessing as mp

            with mp.Pool(
                args.workers,
                initializer=_init_worker,
                initargs=(args.data_dir, part, args.bbox_sampling_step,
                          args.mode, args.hierarchical),
            ) as pool:
                for i, (a, d) in enumerate(pool.imap(_process_file,
                                                     range(len(ds)))):
                    if len(a):
                        angles.append(a)
                        dists.append(d)
                    print(f"[{part} {i + 1}/{len(ds)}] {ds.files[i]}")
        else:
            _init_worker(args.data_dir, part, args.bbox_sampling_step,
                         args.mode, args.hierarchical)
            for i in range(len(ds)):
                a, d = _process_file(i)
                if len(a):
                    angles.append(a)
                    dists.append(d)
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
