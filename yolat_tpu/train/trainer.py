"""High-level training orchestration.

Counterpart of cad_recognition/train.py main/train (:173-321): epoch loop,
periodic evaluation (every epoch from eval_start, reference :227-228),
per-epoch checkpoints with best-by-test_value copy, scalar logging, and
optional resume. Works single-chip or over a ('data',) mesh.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import numpy as np

from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
from yolat_tpu.eval.runner import evaluate
from yolat_tpu.train.checkpoint import CheckpointManager
from yolat_tpu.train.loop import create_state, make_dp_train_step, make_train_step
from yolat_tpu.train.optim import make_optimizer, steplr
from yolat_tpu.utils.experiment import ScalarWriter, configure_logger, make_experiment_dir
from yolat_tpu.utils.meters import AverageMeter


def run_training(cfg, exp_dir: str | None = None, max_steps: int | None = None):
    """Train per cfg; returns (state, results dict)."""
    # multi-host: connect to the coordinator BEFORE any backend use;
    # jax.devices() then spans every host (parallel/distributed.py)
    from yolat_tpu.parallel.distributed import (
        global_batch,
        initialize_from_config,
        local_device_count,
    )

    proc_id, n_procs = initialize_from_config(cfg)
    multihost = n_procs > 1
    is_main = proc_id == 0
    local_d = local_device_count(cfg) if multihost else cfg.n_devices

    if cfg.graph not in ("bezier_cc_bb_iter",):
        # the legacy graph families have library support (data/legacy.py,
        # geom/hierarchical.py) but, as in the reference — where the
        # architectures consuming them are absent from the repo
        # (SURVEY.md: test.py:16 fails as shipped) — no packed training path
        raise NotImplementedError(
            f"graph '{cfg.graph}': only the canonical 'bezier_cc_bb_iter' "
            "pipeline is trainable; legacy graph builders live in "
            "yolat_tpu/data/legacy.py"
        )
    train_ds = SESYDDataset(
        cfg.data_dir, "train", bbox_sampling_step=cfg.bbox_sampling_step,
        do_mixup=cfg.do_mixup > 0, seed=cfg.seed,
    )
    test_ds = SESYDDataset(
        cfg.data_dir, "test", bbox_sampling_step=cfg.bbox_sampling_step,
    )
    cfg = cfg.replace(n_classes=train_ds.n_classes)

    if exp_dir is None:
        if is_main:
            jobname = (
                f"{cfg.exp_name}-{cfg.conv}-n{cfg.n_blocks}-C{cfg.n_filters}"
                f"-lr{cfg.lr}_B{cfg.batch_size}"
            )
            dirs = make_experiment_dir(cfg.root_dir, jobname)
            exp_dir = dirs["exp_dir"]
        else:
            # non-main processes keep logs out of the shared experiment dir
            import tempfile

            exp_dir = tempfile.mkdtemp(prefix=f"yolat_proc{proc_id}_")
    ckpt_dir = os.path.join(exp_dir, "checkpoint")
    configure_logger(exp_dir)
    writer = ScalarWriter(exp_dir)
    if multihost:
        # Orbax requires every process to save into the SAME directory
        # (primary writes arrays, others join its barriers) — broadcast
        # process 0's checkpoint dir; logs/TB stay per-process
        from jax.experimental import multihost_utils as mhu

        from yolat_tpu.parallel.distributed import coordination_barrier

        # processes may skew through dataset preprocessing; fence before
        # the first device collective (gloo rendezvous times out at ~30s)
        coordination_barrier("yolat_pre_broadcast")
        buf = np.zeros(1024, np.uint8)
        enc = ckpt_dir.encode()
        if is_main:
            buf[: len(enc)] = np.frombuffer(enc, np.uint8)
        buf = np.asarray(mhu.broadcast_one_to_all(buf))
        ckpt_dir = bytes(buf[buf != 0]).decode()
    ckpt = CheckpointManager(ckpt_dir)

    # the train step runs the sparse sorted-edge branch (train_layout
    # default), so its loader skips the host-side dense-table build; the
    # eval loader keeps the dense layout for the folded-BN serving paths
    train_dense = (cfg.dense_layout
                   and getattr(cfg, "train_layout", "sparse") == "dense")
    # the banded super-family training route needs the sew_ plan packed
    # into TRAIN batches (cfg.pp_banded_super; ops/banded_train.py)
    train_plans = (("super",) if getattr(cfg, "pp_banded_super", False)
                   else ())
    train_loader = PackedLoader(
        train_ds, batch_size=cfg.batch_size, n_devices=local_d,
        shuffle=True, seed=cfg.seed, dense=train_dense,
        buckets=cfg.buckets, host_id=proc_id, n_hosts=n_procs,
        extra_plans=train_plans,
    )
    # eval runs on process 0 over the FULL test split with its local
    # devices (no host sharding); other hosts never iterate it, so they
    # skip the loader (its __init__ preprocesses the whole split for pads)
    from yolat_tpu.eval.fast_forward import extra_plans_for

    test_loader = PackedLoader(
        test_ds, batch_size=cfg.batch_size * 2,
        n_devices=local_d if multihost else cfg.n_devices,
        shuffle=False, dense=cfg.dense_layout,
        extra_plans=extra_plans_for(cfg),
    ) if is_main else None

    steps_per_epoch = max(len(train_loader), 1)
    schedule = steplr(cfg.lr, cfg.lr_adjust_freq, cfg.lr_decay_rate, steps_per_epoch)
    tx = make_optimizer(cfg.optimizer, schedule, cfg.weight_decay)

    example = next(iter(train_loader))
    single = {k: v[0] for k, v in example.items()}
    key = jax.random.key(cfg.seed)
    key, init_key = jax.random.split(key)
    state = create_state(cfg, tx, single, init_key)

    start_epoch = 0
    best_value = -float("inf")
    if cfg.pretrained_model:
        # accepted forms: a checkpoint dir (restores 'best'), a specific
        # <dir>/ckpt_<tag> path (load_pretrained_models parity,
        # utils/ckpt_util.py:27-104: restores model + optimizer + epoch +
        # best metric), or a reference torch `.pth` checkpoint (migrated
        # weights, fresh optimizer state — train/import_reference.py)
        path = cfg.pretrained_model.rstrip("/")
        if path.endswith(".pth"):
            from yolat_tpu.train.import_reference import state_from_pth

            state = state_from_pth(state, path, n_blocks=cfg.n_blocks)
            logging.info("imported reference checkpoint %s", path)
        else:
            if os.path.basename(path).startswith("ckpt_"):
                restore_dir = os.path.dirname(path)
                tag = os.path.basename(path)[5:]
            else:
                restore_dir, tag = path, "best"
            state, start_epoch, best_value = CheckpointManager(
                restore_dir
            ).restore(state, tag=tag)
            logging.info("resumed from %s (tag %s) at epoch %d",
                         restore_dir, tag, start_epoch)

    mesh = None
    if cfg.n_devices > 1 or multihost:
        from jax.sharding import Mesh

        # in multi-process mode jax.devices() is the GLOBAL device list
        mesh = Mesh(np.array(jax.devices()[: cfg.n_devices]), ("data",))
        step_fn = make_dp_train_step(cfg, tx, mesh)
        if multihost:
            from jax.experimental import multihost_utils as mhu
            from jax.sharding import PartitionSpec

            # every jit input must be a GLOBAL array in multi-process mode:
            # state/keys replicate (identical on all hosts by construction
            # — device_put to a non-addressable sharding is rejected, so go
            # through host_local_array_to_global_array), batches assemble
            # from host-local [D_local, ...] shards along the data axis
            state = mhu.host_local_array_to_global_array(
                jax.device_get(state), mesh, PartitionSpec()
            )
            base_step = step_fn

            @jax.jit
            def _mh_step(state, batch, kd):
                return base_step(state, batch, jax.random.wrap_key_data(kd))

            # AOT-compile each program shape, then fence on the
            # coordination service before the first execution: gloo's
            # communicator rendezvous has a hard ~30s timeout, and
            # compile-time skew between processes (e.g. one hits the
            # persistent XLA cache, the other compiles 40s) would
            # otherwise kill the first collective
            from yolat_tpu.parallel.distributed import coordination_barrier

            _aot: dict = {}
            _n_compiled = [0]

            def step_fn(state, batch, key):  # noqa: F811
                kd = np.asarray(jax.random.key_data(key))
                kd_g = mhu.host_local_array_to_global_array(
                    kd, mesh, PartitionSpec()
                )
                gb = global_batch(batch, mesh)
                sig = tuple(sorted(
                    (k, tuple(v.shape), str(v.dtype)) for k, v in gb.items()
                ))
                fn = _aot.get(sig)
                if fn is None:
                    fn = _mh_step.lower(state, gb, kd_g).compile()
                    coordination_barrier(
                        f"yolat_step_compiled_{_n_compiled[0]}"
                    )
                    _n_compiled[0] += 1
                    _aot[sig] = fn
                return fn(state, gb, kd_g)
    else:
        step_fn = make_train_step(cfg, tx)
    scan_fn = None
    if cfg.scan_steps > 1 and cfg.n_devices == 1:
        from yolat_tpu.train.loop import make_scan_train_step

        scan_fn = make_scan_train_step(cfg, tx, cfg.scan_steps)

    losses = AverageMeter()
    test_value = 0.0
    it = 0
    results = {}
    done = False
    for epoch in range(start_epoch + 1, cfg.total_epochs + 1):
        t_epoch = time.time()
        pending = []  # (iter, device metrics) — fetched only at print_freq,
        # so steps dispatch asynchronously (a per-step float() sync costs a
        # full device round-trip; on remote-attached devices that dominates)

        def run_steps(chunk):
            """Dispatch a list of loader batches: one scanned chain when the
            chunk is full-size and same-shaped, per-step otherwise."""
            nonlocal state, key, it
            if scan_fn is not None and len(chunk) == cfg.scan_steps:
                stacked = {k: np.stack([b[k][0] for b in chunk])
                           for k in chunk[0]}
                key, sub = jax.random.split(key)
                state, ms = scan_fn(state, stacked, sub)
                for j in range(len(chunk)):
                    it += 1
                    pending.append((it, {k: v[j] for k, v in ms.items()}))
            else:
                for b in chunk:
                    key, sub = jax.random.split(key)
                    state, m = step_fn(state, b, sub)
                    it += 1
                    pending.append((it, m))

        def maybe_log():
            nonlocal pending
            if len(pending) >= cfg.print_freq or (max_steps is not None and it >= max_steps):
                for it_i, m in pending:
                    loss_i = float(m["loss"])
                    losses.update(loss_i)
                    writer.add_scalar("loss", loss_i, it_i)
                    writer.add_scalar("test_value", test_value, it_i)
                pending = []
                logging.info(
                    "Epoch:%d Iter:%d LossMean:%.4f loss:%.4f",
                    epoch, it, losses.avg, losses.val,
                )
                losses.reset()

        chunk = []
        chunk_shape = None
        for batch in train_loader:
            # full shape signature: buckets can share one dim's pad (e.g.
            # node count) while differing in others — keying on pos alone
            # would stack mismatched batches
            shape = tuple(sorted((k, getattr(v, "shape", ()))
                                 for k, v in batch.items()))
            if chunk and (shape != chunk_shape or scan_fn is None):
                run_steps(chunk)
                maybe_log()
                chunk = []
            chunk.append(batch)
            chunk_shape = shape
            if scan_fn is None or len(chunk) == cfg.scan_steps:
                run_steps(chunk)
                maybe_log()
                chunk = []
            if max_steps is not None and it >= max_steps:
                done = True
                break
        if chunk and not done:
            run_steps(chunk)
            maybe_log()
        for it_i, m in pending:
            loss_i = float(m["loss"])
            losses.update(loss_i)
            writer.add_scalar("loss", loss_i, it_i)

        if (epoch >= cfg.eval_start or done or epoch == cfg.total_epochs) and is_main:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            if multihost:
                # evaluate locally on process 0: fetch the replicated
                # values (addressable on every host) so predict jits a
                # plain local program, not a global collective
                variables = jax.device_get(variables)
                results = evaluate(cfg, variables, test_loader, mesh=None)
            else:
                results = evaluate(cfg, variables, test_loader, mesh=mesh)
            test_value = results["test_value"]
            logging.info(
                "Epoch:%d MAP@0.5:%.4f MAP@ALL:%.4f top1:%.4f (%.1fs)",
                epoch, results["map_50"], results["map_all"],
                results["top1_acc"], time.time() - t_epoch,
            )

        is_best = test_value > best_value
        best_value = max(test_value, best_value)
        ckpt.save(state, epoch, best_value, is_best)
        if done:
            break

    writer.close()
    results["best_value"] = best_value
    results["exp_dir"] = exp_dir
    return state, results
