"""On-device two-pass prediction + NMS.

Counterpart of SparseCADGCN.predict (architecture3cc_rpn_gp_iter2.py:139-356)
and the eval prologue of train.test (cad_recognition/train.py:405-448),
re-designed for static shapes:

The reference runs pass 1 on CC-root proposals, then pass 2 on the children
of roots whose argmax class is background, stitching results with Python
re-slicing (:167-242) — a CPU hotspot. In eval mode BatchNorm uses running
statistics and dropout is off, so proposals are computationally independent
(the only cross-proposal ops are per-proposal segment reductions): a single
forward over ALL proposals produces bitwise-identical logits to the
reference's two passes. The two-pass semantics reduce to a *selection mask*:

    keep(p) = is_root(p) OR argmax_logits(root_of(p)) == background

followed by the x1.05 box inflation (:339-351), the score rewrite
[1 - p_bg, p_0..p_{K-1}] (train.py:444), pixel scaling (train.py:435-438),
and class-offset NMS. No host round-trips, one compiled program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yolat_tpu.data.packing import finalize_batch
from yolat_tpu.ops.iou import inflate_boxes
from yolat_tpu.ops.nms import single_image_nms
from yolat_tpu.train.loop import build_model


def make_predict_fn(cfg, n_images: int | None = None, max_det: int = 300,
                    fast: bool = False, folded=None, bf16: bool = False,
                    pallas: bool | None = None,
                    edge_kernel: bool | None = None,
                    img_slots: int | None = None,
                    detections_only: bool = False):
    """Returns a jitted (variables, batch) -> per-image detections fn.

    With fast=True (requires the dense neighbour layout in the batch and
    `folded` from eval/fast_forward.fold_params), the forward runs through
    the folded-BN inference engine + Pallas kernels instead of the flax
    module — same logits to float tolerance.

    img_slots: per-image proposal-slot cap for the NMS layout. Default
    (None) gives every image the FULL batch padded width P, so each
    image's candidate sort covers B*P slots it can never fill; a cap of
    max-proposals-per-image (host-known at pack time — eval/runner.py and
    bench.py compute it from the real per-image counts) shrinks the
    per-image NMS flat sort and conf work ~Bx with IDENTICAL detections.
    A kept proposal beyond the cap would be dropped — callers must pass a
    cap >= the true per-image max. eval/runner.img_slot_cap computes it
    exactly (max over the pack's real per-image proposal counts), so for
    runner/bench batches the cap is exact BY CONSTRUCTION; there is no
    runtime assert, and an undersized cap from another caller silently
    drops detections.

    Output dict (leading axis = image slot in batch):
      boxes   [B, max_det, 4]  pixel xyxy
      scores  [B, max_det]
      classes [B, max_det]     int32 (background channel removed)
      valid   [B, max_det]     bool
      pred_label [P], kept [P] — per-proposal argmax + selection mask, for
      the reference's proposal top-1 / confusion metrics (train.py:383-388).
    """
    core = make_predict_core(cfg, n_images=n_images, max_det=max_det,
                             fast=fast, folded=folded, bf16=bf16,
                             pallas=pallas, edge_kernel=edge_kernel,
                             img_slots=img_slots,
                             detections_only=detections_only)
    return jax.jit(core)


def make_predict_core(cfg, n_images: int | None = None, max_det: int = 300,
                      fast: bool = False, folded=None, bf16: bool = False,
                      pallas: bool | None = None,
                      edge_kernel: bool | None = None,
                      img_slots: int | None = None,
                      detections_only: bool = False):
    """The un-jitted predict body: (variables, batch) -> detections dict.
    Wrapped by make_predict_fn (jit) and make_dp_predict_fn (shard_map)."""
    model = build_model(cfg, axis_name=None)
    n_classes = cfg.n_classes
    background = n_classes - 1

    if fast:
        from yolat_tpu.eval.fast_forward import (PP_ARCHS, fast_forward,
                                                 fast_forward_pp)

        is_pp = getattr(cfg, "arch", "") in PP_ARCHS
        # the Pallas kernel is TPU-only; CPU runs take the jnp reference.
        # At bf16 the XLA path wins (see fast_forward for the measurement),
        # so the kernel serves the f32 mode. `pallas` overrides the auto
        # routing for A/B measurement (scripts/onchip_queue.py).
        use_pallas = (jax.default_backend() == "tpu" and not bf16
                      if pallas is None else pallas)

    def predict(variables, batch):
        batch = finalize_batch(jax.tree.map(jnp.asarray, batch))
        if fast and is_pp:
            logits, prop_boxes = fast_forward_pp(
                folded, batch, n_blocks_out=cfg.n_blocks_out,
                bf16=bf16, edge_kernel=edge_kernel,
            )
        elif fast:
            logits, prop_boxes = fast_forward(
                folded, batch, n_blocks_out=cfg.n_blocks_out,
                use_pallas=use_pallas, bf16=bf16, edge_kernel=edge_kernel,
            )
        else:
            logits, prop_boxes = model.apply(variables, batch, train=False)

        pred_label = jnp.argmax(logits, axis=1)
        root_is_bg = pred_label[batch["root_slot"]] == background
        kept = batch["proposal_mask"] & (batch["is_root"] | root_is_bg)

        boxes = inflate_boxes(prop_boxes, 1.05)

        if cfg.classifier == "softmax":
            probs = jax.nn.softmax(logits, axis=1)
        else:
            probs = logits
        obj = 1.0 - probs[:, background]
        cls_scores = probs[:, :background]

        # scale to pixels per owning image (train.py:435-438)
        wh = batch["wh"][batch["image_id"]]
        boxes = boxes * jnp.concatenate([wh, wh], axis=1)

        # dense per-image layout: proposals are packed contiguously per
        # image, so within-image position = arange - first_index(image)
        P = logits.shape[0]
        B = batch["gt_bbox"].shape[0]
        arange = jnp.arange(P, dtype=jnp.int32)
        big = jnp.int32(P)
        seg_start = jax.ops.segment_min(
            jnp.where(batch["proposal_mask"], arange, big),
            batch["image_id"], num_segments=B,
        )
        idx_in_img = arange - seg_start[batch["image_id"]]
        # per-image slot width: the full padded batch width P by default,
        # or the caller's cap (max real proposals per image; exact — see
        # make_predict_fn). Rows that are not kept, or beyond the cap, go
        # to a trash slot so they can never clobber a real slot.
        S = P if img_slots is None else min(int(img_slots), P)
        ok = kept & (idx_in_img < S)
        flat_slot = jnp.where(
            ok, batch["image_id"] * S + jnp.clip(idx_in_img, 0, S - 1), B * S)

        def scatter(x, fill=0.0):
            out = jnp.full((B * S + 1,) + x.shape[1:], fill, x.dtype)
            return out.at[flat_slot].set(jnp.where(
                ok.reshape(ok.shape + (1,) * (x.ndim - 1)), x,
                jnp.asarray(fill, x.dtype)))[: B * S]

        img_boxes = scatter(boxes).reshape(B, S, 4)
        img_cls = scatter(cls_scores).reshape(B, S, background)
        img_obj = scatter(obj).reshape(B, S)
        img_valid = scatter(kept).reshape(B, S)

        nms = jax.vmap(
            partial(single_image_nms, iou_thres=cfg.nms_iou,
                    algorithm=getattr(cfg, "nms_algorithm", "fixpoint"),
                    conf_thres=cfg.nms_conf, max_det=max_det,
                    topk=getattr(cfg, "nms_topk", 4096),
                    approx_topk=getattr(cfg, "nms_approx_topk", False))
        )(img_boxes, img_cls, img_obj, img_valid)
        if detections_only:
            # serving mode: detections in, detections out — skip the
            # eval-protocol extras below ([P]/[P,K]-sized per-step outputs
            # that a scan-chained server would stack into HBM every step)
            return nms
        nms["pred_label"] = pred_label
        nms["kept"] = kept
        # raw per-proposal scores for alternative post-processing (the
        # detect driver's weighted-merge NMS, det_util.py:365-414)
        nms["prop_boxes"] = boxes
        nms["prop_obj"] = obj
        nms["prop_cls"] = cls_scores
        return nms

    return predict


def make_dp_predict_fn(cfg, mesh, axis_name: str = "data", max_det: int = 300,
                       fast: bool = False, folded=None, bf16: bool = False,
                       img_slots: int | None = None):
    """Data-parallel serving: (variables, batch[D, ...]) -> detections with a
    leading device axis. Variables replicated, batch shards P(axis_name);
    each device runs the full predict (forward + NMS) on its shard — the
    multi-chip counterpart of the reference's single-GPU eval loop
    (train.py:324-509), one compiled program across the mesh."""
    from jax.sharding import PartitionSpec as P

    core = make_predict_core(cfg, max_det=max_det, fast=fast, folded=folded,
                             bf16=bf16, img_slots=img_slots)

    def shard_fn(variables, batch):
        out = core(variables, jax.tree.map(lambda x: x[0], batch))
        return jax.tree.map(lambda x: x[None], out)

    mapped = jax.shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(), P(axis_name)),
                           out_specs=P(axis_name), check_vma=False)
    return jax.jit(mapped)


def kept_batch_keys(core, variables, example_batch):
    """Which batch dict keys does `core`'s compiled program actually read?

    jax.jit prunes unused args (18 of ~116 leaves for the canonical bf16
    dense serving program) by dead-code-eliminating the jaxpr; replicate
    that backend-free: trace to a jaxpr (abstract, no device touched —
    important when the only configured backend is a remote tunnel) and
    run the same DCE over it. Returns a sorted tuple of keys, or None if
    introspection fails.
    """
    import jax

    try:
        import jax.tree_util as jtu
        from jax._src.interpreters.partial_eval import dce_jaxpr

        closed = jax.make_jaxpr(core)(variables, example_batch)
        _, used = dce_jaxpr(closed.jaxpr, [True] * len(closed.jaxpr.outvars))
        paths = [p for p, _ in
                 jtu.tree_flatten_with_path((variables, example_batch))[0]]
        if len(used) != len(paths):
            return None
        return tuple(sorted({p[1].key for i, u in enumerate(used) if u
                             for p in (paths[i],)
                             if getattr(p[0], "idx", None) == 1}))
    except Exception:
        return None


def make_serving_fn(cfg, variables, example_batch, device=None, chunk=None,
                    **kw):
    """Transfer-fused serving callable for bulk inference loops
    (cli/infer.py, bench.measure_e2e_pipeline).

    jax.jit already prunes unused batch leaves, but through a
    remote-attached device link every kept leaf's host->device transfer
    pays its own round trip (measured: the canonical bf16 batch-4 step
    spends ~78 of 80 ms dispatching 18 leaves / 7.2 MB — the program
    itself is 2.4 ms). This wrapper:

      1. discovers the kept input set with a throwaway CPU compile
         (kept_batch_keys);
      2. packs those leaves into ONE contiguous uint8 buffer host-side
         (preallocated, ~1 ms/batch of memcpy);
      3. jits a wrapper that bitcast-unpacks the buffer on device and
         overlays the unpacked leaves onto the batch dict — the original
         kept entries become unused args (pruned, never transferred), so
         the per-call transfer is exactly ONE leaf.

    Returns fn(variables, batch) -> detections dict with
    .kept_batch_keys set; falls back to the plain jitted core (identical
    results) when introspection fails. **kw forwards to
    make_predict_core (fast/folded/bf16/img_slots/detections_only/...).

    chunk=K turns it into a CHUNKED scan server: fn(variables, batches)
    takes a list of up to K same-shape batches, packs each into one row
    of a [K, total] buffer and runs ONE program that lax.maps the predict
    body over the rows — amortizing the per-call dispatch round trip /K
    (measured ~28 ms per jit call through the remote tunnel EVEN with all
    args device-resident, against a 2.4 ms program). Returns
    (stacked_device_dict, n_real): every output has a leading [K] axis
    whose first n_real rows correspond to the input batches; a short
    final chunk replays its last row into the padding rows, which the
    CALLER must drop (rows [n_real:] are replays). Per real row the
    detections are identical to per-batch calls. When introspection
    fails the fallback is the plain per-batch jitted fn with
    .chunk unset — callers must check `getattr(fn, "chunk", None)` and
    dispatch each batch individually in that case.
    """
    import jax

    core = make_predict_core(cfg, **kw)
    keys = kept_batch_keys(core, variables, example_batch)
    if not keys:
        fn = jax.jit(core)
        fn.kept_batch_keys = None
        return fn

    # packing spec: 16-byte-aligned segments, bools ride as uint8.
    # Floats the bf16 engine casts BEFORE any arithmetic ride the wire as
    # bf16 (half the bytes): bf16(gather/concat(bf16(x))) == the engine's
    # bf16(gather/concat(x)) value-for-value, so detections stay
    # bit-identical — guarded by TestFusedServingFn's exact comparison.
    # bbox/wh stay f32 (consumed in f32 for box geometry).
    # audited: the engine's first op on each is its bf16 cast (gather/
    # concat only in between). Extend only with the same audit + the
    # exact-parity test passing.
    BF16_WIRE = {"pos", "nbr_attr"}
    use_bf16_wire = bool(kw.get("bf16")) and kw.get("fast")
    import jax.numpy as _jnp

    spec = []
    off = 0
    for k in keys:
        a = np.asarray(example_batch[k])
        if a.dtype == np.bool_:
            dt = np.dtype(np.uint8)
        elif (use_bf16_wire and k in BF16_WIRE
                and a.dtype == np.float32):
            dt = np.dtype(_jnp.bfloat16)
        else:
            dt = a.dtype
        nb = a.size * dt.itemsize
        spec.append((k, a.shape, a.dtype, dt, off, nb))
        off += (nb + 15) // 16 * 16
    total = off
    # four rotating buffers: with result pipelining (callers keep up to
    # ~3 dispatches in flight) an earlier call's transfer may still be
    # reading its host buffer when a later pack runs
    bufs = [np.empty(total, np.uint8) for _ in range(4)]
    slot = [0]

    def pack(batch, out=None):
        if out is None:
            buf = bufs[slot[0]]
            slot[0] = (slot[0] + 1) % len(bufs)
        else:
            buf = out
        for k, shape, _, dt, o, nb in spec:
            a = np.asarray(batch[k])
            if a.shape != shape:
                raise ValueError(
                    f"make_serving_fn: batch[{k!r}] shape {a.shape} != "
                    f"spec {shape} — the fused pack spec is bound to the "
                    "example batch's padded shapes; build one serving fn "
                    "per bucket/shape signature")
            if a.dtype != dt:
                src = a.astype(dt)  # bool->u8 / f32->bf16 wire encodings
            else:
                src = a
            buf[o:o + nb] = src.view(np.uint8).ravel()
        return buf

    def unpack(dev_buf):
        out = {}
        for k, shape, orig_dt, dt, o, nb in spec:
            seg = jax.lax.slice(dev_buf, (o,), (o + nb,))
            it = np.dtype(dt).itemsize
            if it > 1:
                seg = jax.lax.bitcast_convert_type(
                    seg.reshape(-1, it), dt)
            val = seg.reshape(shape)
            if orig_dt == np.bool_:
                val = val.astype(jnp.bool_)
            elif val.dtype != orig_dt:
                # bf16 wire -> f32 (exact upcast): the program sees the
                # same dtypes as the unfused path, inputs bf16-rounded
                val = val.astype(orig_dt)
            out[k] = val
        return out

    def put(buf):
        # explicit placement when a device is given (bench can target a
        # non-default chip); otherwise let jit transfer to its default
        return jax.device_put(buf, device) if device is not None else buf

    if chunk is None:
        def fused(variables, dev_buf, batch):
            return core(variables, {**batch, **unpack(dev_buf)})

        jitted = jax.jit(fused)

        def fn(variables, batch):
            return jitted(variables, put(pack(batch)), batch)

        fn.kept_batch_keys = tuple(keys)
        return fn

    K = int(chunk)
    cbufs = [np.empty((K, total), np.uint8) for _ in range(4)]
    cslot = [0]

    def fused_chunk(variables, dev_rows, batch):
        def body(row):
            return core(variables, {**batch, **unpack(row)})

        return jax.lax.map(body, dev_rows)

    jitted_chunk = jax.jit(fused_chunk)

    def fn(variables, batches):
        assert 1 <= len(batches) <= K
        cbuf = cbufs[cslot[0]]
        cslot[0] = (cslot[0] + 1) % len(cbufs)
        for i, b in enumerate(batches):
            pack(b, out=cbuf[i])
        for i in range(len(batches), K):  # tail: replay the last row
            cbuf[i] = cbuf[len(batches) - 1]
        stacked = jitted_chunk(variables, put(cbuf), batches[0])
        return stacked, len(batches)

    fn.kept_batch_keys = tuple(keys)
    fn.chunk = K
    return fn
