"""Training callbacks: early stopping + per-history-length analyzer.

Reference: ``utils/callbacks.py`` (``EarlyStopping:12``, ``Analyzer:141``).
EarlyStopping keeps the best params on host and persists the checkpoint;
Analyzer buckets per-user metrics by history length (the reference plots
these to wandb every 10 epochs; here the bucketed summary is logged and
available programmatically).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import numpy as np

from dr4sr_tpu.train.checkpoint import save_checkpoint
from dr4sr_tpu.utils.logger import get_logger


class EarlyStopping:
    def __init__(
        self,
        monitor: str,
        dataset_name: str,
        model_name: str,
        save_dir: Optional[str] = "saved",
        filename: Optional[str] = None,
        patience: int = 10,
        delta: float = 0.0,
        mode: str = "max",
    ) -> None:
        assert mode in ("min", "max")
        self.monitor = monitor
        self.patience = patience
        self.delta = delta
        self.mode = mode
        self.model_name = model_name
        self.dataset_name = dataset_name
        self.save_dir = save_dir
        self._counter = 0
        self.best_value = np.inf if mode == "min" else -np.inf
        self.best_epoch = 0
        self.best_params = None
        self.logger = get_logger()
        if filename is not None:
            self._ckpt_rel = filename
        else:
            import datetime

            stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S-%f")
            self._ckpt_rel = os.path.join(model_name, dataset_name, stamp + ".ckpt")

    @property
    def checkpoint_path(self) -> str:
        return os.path.join(self.save_dir or ".", self._ckpt_rel)

    def __call__(self, params, config, epoch: int, metrics: Dict[str, float]) -> bool:
        """Returns True when training should stop; snapshots best params."""
        if self.monitor not in metrics:
            raise ValueError(f"monitor {self.monitor} not in metrics {list(metrics)}")
        value = float(metrics[self.monitor])
        # reference semantics (``utils/callbacks.py:98,106``): ``>=`` / ``<=``
        # — a plateaued metric DOES reset patience and re-snapshots the
        # checkpoint (ADVICE r2: round-2 briefly ran a strict '>' rule here;
        # restored to match the reference's early-stop/selection protocol)
        improved = (
            value >= self.best_value + self.delta
            if self.mode == "max"
            else value <= self.best_value - self.delta
        )
        if improved:
            self.best_value = value
            self.best_epoch = epoch
            self._counter = 0
            self.best_params = jax.device_get(params)
            self.logger.info(f"{self.monitor} improved. Best value: {value:.4f}")
            # single-writer rule under --multihost (every process sees the
            # same replicated params + metrics, so process 0 writes the best
            # checkpoint and the rest only keep the in-memory snapshot);
            # the reference's own ddp TODO, ``utils/callbacks.py:130``
            if self.save_dir is not None and jax.process_index() == 0:
                save_checkpoint(
                    self.checkpoint_path, self.best_params, config,
                    self.model_name, epoch, {self.monitor: value},
                )
        else:
            self._counter += 1
        if self._counter >= self.patience:
            self.logger.info(
                f"Early stopped: {self.monitor} has not improved for "
                f"{self._counter} epochs (best {self.best_value:.4f} "
                f"@ epoch {self.best_epoch})."
            )
            return True
        return False


class Analyzer:
    """Bucket per-sample metrics by user-history length
    (reference ``Analyzer``, ``utils/callbacks.py:141-202``)."""

    def __init__(self, boundaries: Optional[List[int]] = None) -> None:
        self.boundaries = boundaries or [5, 10, 20, 30, 50]
        self.reset()

    def reset(self) -> None:
        self._lens: List[np.ndarray] = []
        self._metrics: Dict[str, List[np.ndarray]] = {}

    def record_batch(
        self, hist_len: np.ndarray, metrics: Dict[str, np.ndarray],
        valid: Optional[np.ndarray] = None,
    ) -> None:
        if valid is None:
            valid = np.ones(len(hist_len), bool)
        self._lens.append(np.asarray(hist_len)[valid])
        for k, v in metrics.items():
            self._metrics.setdefault(k, []).append(np.asarray(v)[valid])

    def plot(self, path: str) -> Optional[str]:
        """Bar charts of each metric by history-length bucket (the reference
        pushes these to wandb as matplotlib figures every 10 epochs)."""
        summary = self.summary()
        if not summary:
            return None
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return None
        fig, axes = plt.subplots(1, len(summary), figsize=(4 * len(summary), 3))
        if len(summary) == 1:
            axes = [axes]
        for ax, (metric, buckets) in zip(axes, summary.items()):
            ax.bar(range(len(buckets)), list(buckets.values()))
            ax.set_xticks(range(len(buckets)))
            ax.set_xticklabels(list(buckets.keys()), rotation=45, fontsize=7)
            ax.set_title(metric, fontsize=9)
        fig.tight_layout()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return path

    def summary(self) -> Dict[str, Dict[str, float]]:
        if not self._lens:
            return {}
        lens = np.concatenate(self._lens)
        buckets = np.digitize(lens, self.boundaries)
        out: Dict[str, Dict[str, float]] = {}
        for k, chunks in self._metrics.items():
            vals = np.concatenate(chunks)
            by_bucket = {}
            for b in range(len(self.boundaries) + 1):
                sel = buckets == b
                if sel.any():
                    lo = 0 if b == 0 else self.boundaries[b - 1]
                    hi = self.boundaries[b] if b < len(self.boundaries) else "inf"
                    by_bucket[f"len[{lo},{hi})"] = float(vals[sel].mean())
            out[k] = by_bucket
        return out
