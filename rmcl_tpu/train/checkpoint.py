"""Orbax checkpoint/resume.

Reference behavior (SURVEY.md §5.4): Lightning ModelCheckpoint
(save_top_k=1 on val/the_metric, save_last) is constructed but dropped
from the callbacks (reference run.py:46-52,78) — as committed, the
reference never saves top-k checkpoints.  We implement the *intended*
semantics: keep the best-by-metric checkpoint and the last one, and
support resume (reference `resume_from_checkpoint`, run.py:108).
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, Optional

import jax


def _as_tree(ts) -> dict:
    return {"params": ts.params, "opt_state": ts.opt_state,
            "state": ts.state, "step": ts.step}


class CheckpointManager:
    """Async, crash-safe saves.

    `save_last`/`maybe_save_best` return as soon as the device arrays
    are snapshotted and the write is scheduled (orbax commits in the
    background), so the ~seconds-long 113M-param serialisation overlaps
    the next epoch instead of stalling the step loop.

    Crash safety: each save goes to a UNIQUE directory
    (`<name>.<seq>`); the logical name ("last"/"best") is a pointer
    file updated — and the superseded directory deleted — only AFTER
    orbax confirms the new save committed (`wait_until_finished`).  A
    crash mid-epoch therefore always leaves the previous valid
    checkpoint reachable; a crash between commit and pointer swap
    leaves the old pointer valid and at most one orphaned directory.
    """

    def __init__(self, workdir: str, monitor: str = "val/the_metric"):
        self.workdir = os.path.abspath(workdir)
        self.monitor = monitor
        self.best_score: Optional[float] = None
        self._ckptr = None
        # logical name -> dir scheduled but not yet pointer-committed
        self._pending: Dict[str, str] = {}
        os.makedirs(self.workdir, exist_ok=True)
        # Resume the unique-dir sequence past anything already on disk:
        # a fresh manager re-run into an old workdir must not collide
        # with a previous run's `<name>.<step>-<seq>` directories
        # (orbax refuses to overwrite an existing destination).
        self._seq = self._scan_seq()

    def _scan_seq(self) -> int:
        seq = 0
        try:
            for d in os.listdir(self.workdir):
                _, _, tail = d.rpartition("-")
                if tail.isdigit() and os.path.isdir(os.path.join(self.workdir, d)):
                    seq = max(seq, int(tail))
        except OSError:
            pass
        return seq

    def _c(self):
        if self._ckptr is None:
            import orbax.checkpoint as ocp
            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def _path(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    # ------------------------------------------------- pointer plumbing
    def _ptr_file(self, logical: str) -> str:
        return os.path.join(self.workdir, logical.upper() + ".ptr")

    def _read_ptr(self, logical: str) -> Optional[str]:
        try:
            with open(self._ptr_file(logical)) as f:
                return f.read().strip() or None
        except OSError:
            return None

    def _write_ptr(self, logical: str, dirname: str):
        tmp = self._ptr_file(logical) + ".tmp"
        with open(tmp, "w") as f:
            f.write(dirname)
        os.replace(tmp, self._ptr_file(logical))

    def _resolve(self, logical: str) -> Optional[str]:
        """Directory currently holding `logical`, or None.  Falls back
        to a plain `<logical>` directory (pre-pointer checkpoints)."""
        ptr = self._read_ptr(logical)
        if ptr and os.path.isdir(self._path(ptr)):
            return ptr
        if os.path.isdir(self._path(logical)):
            return logical
        return None

    def _finalize(self):
        """After `wait_until_finished`: every pending save is committed —
        swing the pointers and delete the superseded directories."""
        for logical, dirname in self._pending.items():
            old = self._resolve(logical)
            self._write_ptr(logical, dirname)
            if old and old != dirname:
                shutil.rmtree(self._path(old), ignore_errors=True)
        self._pending.clear()

    def _sync(self):
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()
        self._finalize()

    def _schedule(self, logical: str, ts):
        """Wait out the previous async save (finalizing its pointer),
        then schedule this one into a fresh unique directory."""
        c = self._c()
        self._sync()
        self._seq += 1
        dirname = f"{logical}.{int(jax.device_get(ts.step))}-{self._seq}"
        while os.path.exists(self._path(dirname)):  # orphan from a crash
            self._seq += 1
            dirname = f"{logical}.{int(jax.device_get(ts.step))}-{self._seq}"
        c.save(self._path(dirname), _as_tree(ts))
        self._pending[logical] = dirname

    # ---------------------------------------------------------- public
    def wait(self):
        self._sync()

    def save_last(self, ts):
        self._schedule("last", ts)

    def maybe_save_best(self, ts, metrics: dict) -> bool:
        score = metrics.get(self.monitor)
        if score is None:
            return False
        if self.best_score is None or score > self.best_score:
            self.best_score = float(score)
            self._schedule("best", ts)
            return True
        return False

    def restore(self, ts, name: str = "last"):
        """Restore into the structure of `ts` (shapes/dtypes as template)."""
        from rmcl_tpu.train.step import TrainState
        c = self._c()
        self._sync()
        target = self._resolve(name) or name
        restored = c.restore(self._path(target), _as_tree(ts))
        return TrainState(params=restored["params"],
                          opt_state=restored["opt_state"],
                          state=restored["state"],
                          step=restored["step"])

    def has(self, name: str = "last") -> bool:
        return self._resolve(name) is not None
