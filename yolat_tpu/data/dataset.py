"""SESYD-style dataset: offline preprocessing with caching + packed loader.

Counterpart of Datasets/graph_dict3.SESYDFloorPlan: reads
<root>/<partition>_list.txt, preprocesses each SVG through the geometry
kernel (graph build) and the proposal generator, and caches both stages on
disk (the reference caches the graph as <file>.pkl and proposals as
<file>_bb.pkl, graph_dict3.py:917-932; we use .graph.pkl / .props.pkl
sidecars keyed by sampling step so both datasets' conventions coexist).

The loader flat-packs images into padded device batches (one flat graph per
device shard) — the TPU equivalent of the reference DataLoader(collate)
(train.py:178-189).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from yolat_tpu.data.packing import PadSizes, pack_files
from yolat_tpu.data.synthetic import DIAGRAM_CLASSES, FLOORPLAN_CLASSES
from yolat_tpu.geom.graph_build import build_svg_graph
from yolat_tpu.geom.proposals import ProposalFile, generate_proposals
from yolat_tpu.geom.svg_io import SVGDocument, read_ground_truth_boxes

# --- worker-process entry points for PackedLoader(preproc_workers=N) ------
# Module-level (picklable by reference under the spawn start method); each
# worker holds one SESYDDataset and returns finished CompactFile loads. The
# geometry kernel is pure numpy/C++, so workers never touch a device — the
# JAX platform is pinned to CPU defensively in case a transitive import
# reaches backend init.
_LOADER_WORKER_DS = None


def _loader_worker_init(ctor_kwargs: dict):
    global _LOADER_WORKER_DS
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _LOADER_WORKER_DS = SESYDDataset(**ctor_kwargs)


def _loader_worker_load(idx: int):
    from yolat_tpu.data.packing import CompactFile

    f, gt, wh = _LOADER_WORKER_DS.load(idx)
    return idx, (CompactFile(f, n_classes=_LOADER_WORKER_DS.n_classes), gt, wh)


# bump when the graph/proposal cache formats change semantically
CACHE_VERSION = 4  # v4: GT-presence joined the proposal-cache key


def _atomic_pickle(path: str, obj) -> None:
    """Write-then-rename cache emission: multiple processes (multi-host
    training, --workers preprocessing) may warm the same cache file
    concurrently — a reader must never see a half-written pickle."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f)
    os.replace(tmp, path)


class SESYDDataset:
    def __init__(self, root: str, partition: str = "train",
                 bbox_sampling_step: int = 10, mode: str | None = None,
                 class_dict: dict | None = None, cache: bool = True,
                 do_mixup: bool = False, seed: int = 0,
                 files: list | None = None, require_gt: bool = True):
        self.root = root
        self.partition = partition
        self.step = bbox_sampling_step
        self.require_gt = require_gt
        if files is not None:
            # explicit file list (the bulk-inference CLI path: bare SVGs,
            # no manifest, optionally no GT sidecars)
            self.files = list(files)
        else:
            list_path = os.path.join(root, f"{partition}_list.txt")
            if not os.path.exists(list_path):
                # the reference manifests include val_list2.txt, which doesn't
                # follow the <partition>_list.txt pattern; accept <partition>.txt
                alt = os.path.join(root, f"{partition}.txt")
                if os.path.exists(alt):
                    list_path = alt
            with open(list_path) as f:
                self.files = [os.path.join(root, line.strip()) for line in f if line.strip()]
        if mode is None:
            # the reference keys the class dictionary off the path
            # (graph_dict3.py:57); 'chart' extends the same convention for
            # the chart-VG config (BASELINE.json configs[5])
            d = os.path.dirname(self.files[0])
            mode = ("diagram" if "diagram" in d
                    else "chart" if "chart" in d else "floorplan")
        self.mode = mode
        if class_dict is None:
            from yolat_tpu.data.synthetic import CHART_CLASSES

            class_dict = {"diagram": DIAGRAM_CLASSES,
                          "chart": CHART_CLASSES}.get(mode,
                                                      FLOORPLAN_CLASSES)
        self.class_dict = class_dict
        self.n_classes = len(set(class_dict.values()))
        self.cache = cache
        self.do_mixup = do_mixup
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.files)

    def ctor_kwargs(self) -> dict:
        """Constructor kwargs that rebuild an equivalent dataset in a
        worker process (everything resolved: mode, class vocabulary, file
        list). mixup is excluded by the callers that use this (stochastic
        proposal draws would diverge across processes)."""
        return dict(root=self.root, partition=self.partition,
                    bbox_sampling_step=self.step, mode=self.mode,
                    class_dict=self.class_dict, cache=self.cache,
                    files=self.files, require_gt=self.require_gt)

    def get_anchor(self):
        """Per-class GT box width/height statistics (median/mean/max/min) —
        the reference's anchor-inspection tool (graph_dict3.py:111-127),
        returned as a dict instead of printed + SystemExit."""
        whs: dict = {}
        for path in self.files:
            g = self._graph(path)
            w, h = g["img_width"], g["img_height"]
            boxes, labels = read_ground_truth_boxes(
                path.replace(".svg", ".xml"), w, h, self.class_dict
            )
            for (x0, y0, x1, y1), l in zip(boxes, labels):
                whs.setdefault(int(l), []).append((x1 - x0, y1 - y0))
        out = {}
        for l, sizes in whs.items():
            arr = np.asarray(sizes)
            out[l] = {
                "median": np.median(arr, axis=0).tolist(),
                "mean": arr.mean(axis=0).tolist(),
                "max": arr.max(axis=0).tolist(),
                "min": arr.min(axis=0).tolist(),
                "count": len(arr),
            }
        return out

    def _graph(self, path: str) -> dict:
        cache_path = path.replace(".svg", f".graph.v{CACHE_VERSION}.pkl")
        if self.cache and os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                return pickle.load(f)
        # migration path: the reference caches its offline graphs as
        # <file>.pkl with the same schema (build_graph_bbox.py:302-381 —
        # pos/attr/edge/edge_attr/img_width/img_height/cc); load those
        # directly so preprocessed reference datasets work unchanged
        ref_path = path.replace(".svg", ".pkl")
        if self.cache and os.path.exists(ref_path):
            with open(ref_path, "rb") as f:
                g = pickle.load(f)
            required = {"pos", "attr", "edge", "edge_attr", "cc"}
            if isinstance(g, dict) and required <= set(g):
                if isinstance(g["pos"], dict):
                    # reference layout: positions nested as
                    # node_dict['pos']['spatial'] (build_graph_bbox.py:353)
                    g = {**g, "pos": g["pos"]["spatial"]}
                g.setdefault("img_width", 1.0)
                g.setdefault("img_height", 1.0)
                return g
        doc = SVGDocument.from_file(path)
        g = build_svg_graph(doc, mode=self.mode)
        if self.cache:
            _atomic_pickle(cache_path, g)
        return g

    def load(self, idx: int):
        """Returns (ProposalFile, (gt_bbox, gt_labels), (width, height))."""
        path = self.files[idx]
        graph = self._graph(path)
        w, h = graph["img_width"], graph["img_height"]
        xml_path = path.replace(".svg", ".xml")
        if os.path.exists(xml_path) or self.require_gt:
            gt_bbox, gt_labels = read_ground_truth_boxes(
                xml_path, w, h, self.class_dict
            )
        else:
            # inference on unannotated SVGs: every proposal labels
            # background; the model's own scores drive detection
            gt_bbox = np.zeros((0, 4))
            gt_labels = np.zeros(0, np.int64)
        # the GT-less variant (unannotated inference: every label is
        # background) must not share a cache file with the GT-labeled one —
        # annotations added later would silently keep the background labels
        gt_key = "" if len(gt_bbox) else ".nogt"
        cache_path = path.replace(
            ".svg", f".props{self.step}{gt_key}.v{CACHE_VERSION}.pkl")
        if self.cache and not self.do_mixup and os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                pf = ProposalFile.from_dict(pickle.load(f))
        else:
            pf = generate_proposals(
                graph, gt_bbox, gt_labels, self.n_classes,
                bbox_sampling_step=self.step, do_mixup=self.do_mixup,
                rng=self._rng,
            )
            if self.cache and not self.do_mixup:
                _atomic_pickle(cache_path, pf.to_dict())
        return pf, (gt_bbox, gt_labels), (w, h)


class PackedLoader:
    """Yields stacked per-device packed batches [D, ...].

    Each device shard packs `batch_size` images into one flat padded graph.
    Pad sizes are fixed across the epoch (computed from the dataset once) so
    XLA compiles a single program per loader.

    buckets > 1 partitions the manifest into size quantiles with one
    PadSizes each — small images stop paying the largest image's padding at
    the cost of `buckets` compiled programs (the bucketed-padding design of
    SURVEY.md section 7). Batches never mix buckets; epoch order interleaves
    buckets pseudo-randomly.

    host_id/n_hosts shard the epoch across processes for multi-host
    training (the per-host data pipeline of a jax.distributed deployment).
    Every host builds the SAME global step schedule (identical rng
    consumption) and takes steps[host_id::n_hosts], truncated so all hosts
    execute exactly the same number of steps with the same bucket-shape
    sequence structure — a host running extra or differently-shaped steps
    would deadlock the collectives. Pad sizes stay global so all hosts
    compile identical programs.
    """

    def __init__(self, dataset: SESYDDataset, batch_size: int = 4,
                 n_devices: int = 1, shuffle: bool = True, seed: int = 0,
                 pad: PadSizes | None = None, drop_last: bool = False,
                 dense: bool = False, d_max: int | None = None,
                 prefetch: int = 2, buckets: int = 1, host_id: int = 0,
                 n_hosts: int = 1, cache_files: bool = True,
                 preproc_workers: int = 0, extra_plans: tuple = (),
                 edge_window: bool = True):
        self.ds = dataset
        self.batch_size = batch_size
        self.n_devices = n_devices
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last
        self.dense = dense
        self.d_max = d_max
        self.prefetch = prefetch
        self.buckets = max(1, buckets)
        self.host_id = host_id
        self.n_hosts = n_hosts
        # in-memory CompactFile cache (final dtypes, pre-dst-sorted edges):
        # steady-state packing becomes pure same-dtype copies — the f64->f32
        # conversions and per-batch 130k-row argsorts were ~5x the copy
        # cost. ~2-3 MB per SESYD-scale image; disable for huge manifests.
        # Mixup regenerates proposals per epoch, so nothing recurs to cache.
        self.cache_files = cache_files and not dataset.do_mixup
        # preproc_workers > 0: cold per-file preprocessing (SVG parse ->
        # graph -> proposals, the single-core ~7 ms/image host bound that
        # caps the parse->detect rate) runs in a process pool, streamed in
        # step order. The multi-core counterpart of the reference's
        # DataLoader(num_workers=8) (cad_recognition/train.py:181,188).
        # mixup draws from the dataset rng — processes would diverge.
        self.preproc_workers = 0 if dataset.do_mixup else max(0, preproc_workers)
        self.extra_plans = tuple(extra_plans)
        # False skips the pack-time edge-window plan (~1.3 ms/image) when
        # the consumer's program never reads ew_* (bf16 serving)
        self.edge_window = edge_window
        self._pool = None
        if dataset.do_mixup and n_hosts > 1:
            # the mixup pad watermark grows from host-local draws; hosts
            # would diverge in compiled shapes and deadlock the collectives
            raise NotImplementedError(
                "mixup is not supported in multi-host training "
                "(per-host stochastic pad growth diverges)")
        self._compact: dict = {}
        if pad is not None:
            self.pad = pad
            self.buckets = 1
            self._bucket_pads = [pad]
            self._bucket_of = np.zeros(len(dataset), np.int32)
        else:
            self.pad = self.compute_pad()
        if self.d_max is None:
            # size the dense neighbour axis to the dataset's actual max
            # in-degree (SESYD shape graphs: <=3) instead of a blanket 8 —
            # the conv's edge-side FLOPs/HBM traffic scale linearly with D
            need = getattr(self, "_max_indegree", None)
            if need is None:
                self.d_max = 8
            else:
                self.d_max = max(4, int(2 ** np.ceil(np.log2(max(need, 1)))))

    def _load_compact(self, i: int):
        """(CompactFile, gt, wh) for manifest index i, memoised across
        epochs when cache_files is on."""
        from yolat_tpu.data.packing import CompactFile

        hit = self._compact.get(i)
        if hit is not None:
            return hit
        f, gt, wh = self.ds.load(i)
        item = (CompactFile(f, n_classes=getattr(self.ds, 'n_classes', None)), gt, wh)
        if self.cache_files:
            self._compact[i] = item
        return item

    def _ensure_pool(self):
        if self.preproc_workers <= 0:
            return None
        if self._pool is None:
            import multiprocessing as mp

            # spawn: never fork a parent that may hold live JAX/TPU state.
            # Clamp to the core count: preprocessing is CPU-bound (parse +
            # geometry), so oversubscribing a small host only adds
            # scheduler/cache churn — measured 146.6 -> 105.6 SVG/s going
            # 1 -> 4 workers on a 1-core host (BENCH_r03 extras).
            ctx = mp.get_context("spawn")
            n_procs = max(1, min(self.preproc_workers, os.cpu_count() or 1))
            self._pool = ctx.Pool(n_procs,
                                  initializer=_loader_worker_init,
                                  initargs=(self.ds.ctor_kwargs(),))
        return self._pool

    def close(self):
        """Shut down the preprocessing pool (workers are daemonic, so this
        is optional hygiene — interpreter exit reaps them)."""
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def _load_many(self, idxs):
        """Yield (CompactFile, gt, wh) per manifest index, in order.

        With preproc_workers, cache misses stream through the process pool
        (imap preserves submission order, which is exactly the consumption
        order, so results marry up positionally). Workers run ahead of the
        consumer; results buffer in the imap iterator (~2-3 MB per
        SESYD-scale image) — acceptable because the device side drains
        faster than the pool produces at any worker count that matters."""
        idxs = [int(i) for i in idxs]
        pool = self._ensure_pool()
        if pool is None:
            for i in idxs:
                yield self._load_compact(i)
            return
        miss = [i for i in idxs if i not in self._compact]
        it = pool.imap(_loader_worker_load, miss, chunksize=1)
        for i in idxs:
            item = self._compact.get(i)
            if item is None:
                j, item = next(it)
                assert j == i, (j, i)
                if self.cache_files:
                    self._compact[i] = item
            yield item

    def _pack_loads(self, pad, loads):
        shard = pack_files(
            [l[0] for l in loads],
            [l[1] for l in loads],
            [l[2] for l in loads],
            pad,
            extra_plans=self.extra_plans,
            edge_window=self.edge_window,
        )
        if self.dense:
            from yolat_tpu.data.packing import add_dense_neighbors

            shard = add_dense_neighbors(shard, d_max=self.d_max,
                                        files=[l[0] for l in loads])
        return shard

    def _grown_pad(self, pad, loads_per_window):
        """Grow-only pad watermark for stochastic (mixup) batch contents:
        returns `pad`, elementwise-raised to cover every window's totals
        (same round_up multiples as compute_pad)."""
        from yolat_tpu.data.packing import round_up

        need_n = need_e = need_s = need_p = need_g = 0
        for loads in loads_per_window:
            need_n = max(need_n, sum(len(l[0].pos) for l in loads))
            need_e = max(need_e, sum(len(l[0].edge) for l in loads))
            need_s = max(need_s, sum(len(l[0].edge_super) for l in loads))
            need_p = max(need_p, sum(l[0].n_proposals for l in loads))
            need_g = max([need_g] + [len(l[1][0]) for l in loads])
        if (need_n <= pad.n_nodes and need_e <= pad.n_edges
                and need_s <= pad.n_super and need_p <= pad.n_proposals
                and need_g <= pad.n_gt):
            return pad
        return PadSizes(
            max(pad.n_nodes, round_up(need_n, 512)),
            max(pad.n_edges, round_up(need_e, 512)),
            max(pad.n_super, round_up(need_s, 2048)),
            max(pad.n_proposals, round_up(need_p, 64)),
            max(pad.n_gt, round_up(need_g, 16)),
            pad.n_images,
        )

    def compute_pad(self) -> PadSizes:
        """Worst-case per-shard pad sizes over all possible batch windows:
        the sum of the `batch_size` largest per-file counts per dimension.
        One streaming pass over the FULL manifest (host-independent, so
        every host compiles the same programs); files are retained in
        memory only under the cache_files contract (as CompactFiles, which
        the first epoch would build anyway). With buckets > 1 also assigns
        every file a size bucket and computes one PadSizes per bucket."""
        from yolat_tpu.data.packing import round_up

        nodes, edges, supers, props, gts = [], [], [], [], []
        max_indeg = 1
        for f, (gt, _), _ in self._load_many(range(len(self.ds))):
            # with cache_files this pass doubles as the CompactFile warmup,
            # so the first epoch doesn't re-read the whole manifest; with
            # preproc_workers the cold manifest scan runs multi-core
            nodes.append(len(f.pos))
            edges.append(len(f.edge))
            supers.append(len(f.edge_super))
            props.append(f.n_proposals)
            gts.append(len(gt))
            if len(f.edge):
                max_indeg = max(max_indeg,
                                int(np.bincount(f.edge[:, 1]).max()))
        self._max_indegree = max_indeg

        def pad_for(idx):
            def topsum(vals, mult):
                sub = sorted(vals[i] for i in idx)[-self.batch_size:]
                return round_up(sum(sub), mult)

            return PadSizes(
                topsum(nodes, 512),
                topsum(edges, 512),
                topsum(supers, 2048),
                topsum(props, 64),
                round_up(max([1] + [gts[i] for i in idx]), 16),
                self.batch_size,
            )

        all_idx = list(range(len(self.ds)))
        self._bucket_of = np.zeros(len(self.ds), np.int32)
        if self.buckets > 1 and len(self.ds) >= self.buckets:
            by_size = np.argsort(np.asarray(nodes), kind="stable")
            groups = np.array_split(by_size, self.buckets)
            self._bucket_pads = []
            for b, g in enumerate(groups):
                self._bucket_of[g] = b
                self._bucket_pads.append(pad_for(list(g)))
        else:
            self._bucket_pads = [pad_for(all_idx)]
        return self._bucket_pads[int(np.argmax(
            [p.n_nodes for p in self._bucket_pads]))]

    def __len__(self):
        per_step = self.batch_size * self.n_devices
        total = 0
        for b in range(len(self._bucket_pads)):
            n = int((self._bucket_of == b).sum())
            if self.drop_last:
                total += n // per_step
            else:
                total += (n + per_step - 1) // per_step
        if self.n_hosts > 1:
            total //= self.n_hosts
        return total

    def __iter__(self):
        """Iterate batches, packing `prefetch` steps ahead on a background
        thread — the host-pipeline-parallelism replacement for the
        reference's DataLoader(num_workers=8) (train.py:181): device steps
        overlap with host packing instead of alternating with it.

        An unshuffled loader (the eval loaders) produces the SAME batch
        sequence every epoch — host augmentation does not exist (it runs
        on-device in finalize_batch) — so the packed epoch is cached whole
        after the first pass and later evals skip packing entirely."""
        if not self.shuffle and self.cache_files:
            cached = getattr(self, "_epoch_cache", None)
            if cached is None:
                cached = list(self._iter_sync())
                self._epoch_cache = cached
            yield from cached
            return
        if getattr(self, "prefetch", 2) <= 0:
            yield from self._iter_sync()
            return

        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=getattr(self, "prefetch", 2))
        sentinel = object()
        err: list = []

        def producer():
            try:
                for item in self._iter_sync():
                    q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if err:
            raise err[0]

    def _iter_sync(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        self.epoch += 1
        per_step = self.batch_size * self.n_devices

        # GLOBAL step schedule — identical on every host (rng consumption is
        # host-independent): per-bucket windows over the full manifest, then
        # one pseudo-random interleave across buckets
        steps = []
        for b in range(len(self._bucket_pads)):
            order = np.arange(len(self.ds))[self._bucket_of == b]
            if self.shuffle:
                rng.shuffle(order)
            for start in range(0, len(order), per_step):
                window = order[start : start + per_step]
                if len(window) < per_step and self.drop_last:
                    break
                steps.append((b, window))
        if self.shuffle and len(self._bucket_pads) > 1:
            rng.shuffle(steps)

        if self.n_hosts > 1:
            # equal step counts per host; trailing steps dropped this epoch
            # (a different shuffle reaches them next epoch)
            even = (len(steps) // self.n_hosts) * self.n_hosts
            steps = steps[:even][self.host_id :: self.n_hosts]

        def pack_shard(pad, idxs):
            loads = [self._load_compact(int(i)) for i in idxs]
            return self._pack_loads(pad, loads)

        # per-device shards pack in parallel: the packing body is numpy
        # copies (GIL released), so a thread pool scales with host cores —
        # the multi-chip host pipeline would otherwise feed D shards
        # serially per step
        # (mixup loads mutate the dataset rng — not thread-safe — and
        # disable cache_files, which therefore also gates the pool)
        pool = None
        if self.n_devices > 1 and self.cache_files and (os.cpu_count() or 1) > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(
                max_workers=min(self.n_devices, os.cpu_count() or 1)
            )
        # preproc_workers: one ordered stream of pooled loads for the whole
        # epoch (imap works ahead of consumption, so cold preprocessing
        # overlaps both packing and the device)
        loads_iter = None
        if self.preproc_workers > 0:
            loads_iter = self._load_many(
                [int(i) for _, w in steps for i in w])
        try:
            for b, window in steps:
                pad = self._bucket_pads[b]
                windows = [
                    window[d * self.batch_size : (d + 1) * self.batch_size]
                    for d in range(self.n_devices)
                ]
                if loads_iter is not None:
                    loads_w = [[next(loads_iter) for _ in w] for w in windows]
                    if pool is not None:
                        shards = list(pool.map(
                            lambda ls: self._pack_loads(pad, ls), loads_w))
                    else:
                        shards = [self._pack_loads(pad, ls) for ls in loads_w]
                elif self.ds.do_mixup:
                    # mixup redraws proposals every epoch, so batch sizes
                    # are stochastic: load first, then GROW the bucket pad
                    # if this step's contents exceed it (grow-only
                    # watermark — one recompile per bump, and the coarse
                    # round_up multiples make bumps converge fast)
                    loads_w = [[self._load_compact(int(i)) for i in w]
                               for w in windows]
                    pad = self._bucket_pads[b] = self._grown_pad(pad, loads_w)
                    shards = [self._pack_loads(pad, ls) for ls in loads_w]
                elif pool is not None:
                    shards = list(pool.map(lambda w: pack_shard(pad, w),
                                           windows))
                else:
                    shards = [pack_shard(pad, w) for w in windows]
                yield stack_shards(shards)
        finally:
            if pool is not None:
                pool.shutdown(wait=False)


def stack_shards(shards: list) -> dict:
    """[D] list of batch dicts -> dict of [D, ...] arrays."""
    out = {}
    for k in shards[0]:
        out[k] = np.stack([s[k] for s in shards], axis=0)
    return out
