"""Orbax checkpointing with the reference's best-copy semantics.

Counterpart of utils/ckpt_util.py: save_checkpoint (:107-111) writes a
per-epoch checkpoint and copies it to *_best when the tracked metric
improves; load_pretrained_models/_optimizer (:27-104) restore model +
optimizer + scheduler state and the best metric. Here the whole TrainState
(params, batch_stats, opt_state, step) plus {epoch, best_value} metadata is
one Orbax StandardCheckpointer save; "best" is a separate retained step.
"""

from __future__ import annotations

import json
import os
import shutil

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, keep: int = 3):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.keep = keep

    def _path(self, tag) -> str:
        return os.path.join(self.ckpt_dir, f"ckpt_{tag}")

    def save(self, state, epoch: int, best_value: float, is_best: bool):
        # In a multi-process runtime every process must call save on the
        # SAME directory (Orbax barriers + primary-host array writes); the
        # plain-filesystem epilogue (meta json, best copy, gc) is the
        # primary's alone — a non-primary touching the dir races the
        # primary's tmp-dir finalize.
        primary = jax.process_index() == 0
        path = self._path(epoch)
        if primary and os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, jax.device_get(state))
        self._ckptr.wait_until_finished()
        if not primary:
            return
        with open(os.path.join(self.ckpt_dir, f"meta_{epoch}.json"), "w") as f:
            json.dump({"epoch": epoch, "best_value": best_value}, f)
        if is_best:
            best = self._path("best")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
            with open(os.path.join(self.ckpt_dir, "meta_best.json"), "w") as f:
                json.dump({"epoch": epoch, "best_value": best_value}, f)
        self._gc(epoch)

    def _gc(self, epoch: int):
        for name in os.listdir(self.ckpt_dir):
            if not name.startswith("ckpt_") or name == "ckpt_best":
                continue
            tag = name.split("_", 1)[1]
            if tag.isdigit() and int(tag) <= epoch - self.keep:
                shutil.rmtree(os.path.join(self.ckpt_dir, name))
                meta = os.path.join(self.ckpt_dir, f"meta_{tag}.json")
                if os.path.exists(meta):
                    os.remove(meta)

    def latest_epoch(self):
        epochs = [
            int(n.split("_", 1)[1])
            for n in os.listdir(self.ckpt_dir)
            if n.startswith("ckpt_") and n.split("_", 1)[1].isdigit()
        ]
        return max(epochs) if epochs else None

    def restore(self, abstract_state, tag="best"):
        """Restore a TrainState-shaped pytree. Returns
        (state, epoch, best_value)."""
        path = self._path(tag)
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        state = self._ckptr.restore(path, target)
        meta_path = os.path.join(self.ckpt_dir, f"meta_{tag}.json")
        meta = {"epoch": -1, "best_value": -float("inf")}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return state, meta["epoch"], meta["best_value"]
