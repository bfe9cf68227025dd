"""Post-hoc analytics: load finished run directories back into objects and
build cross-run comparison tables.

Behavior port of `awesome/analytics/result_model.py:71-668` (ResultModel:
scan a run dir, reload config/tracker/checkpoints/params) and
`awesome/analytics/result_comparison.py` (ResultComparison: the paper's
metric tables as pandas frames / markdown / latex).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np


class ResultModel:
    """A finished run, reloaded."""

    def __init__(self, path: str):
        self.path = path
        self._config = None
        self._tracker = None

    @classmethod
    def from_path(cls, path: str) -> "ResultModel":
        if not os.path.isdir(path):
            raise FileNotFoundError(path)
        return cls(path)

    @property
    def name(self) -> str:
        return os.path.basename(os.path.normpath(self.path))

    @property
    def config(self):
        if self._config is None:
            from awesome_tpu.runner.config import AwesomeConfig

            p = os.path.join(self.path, "config.yaml")
            self._config = AwesomeConfig.load(p) if os.path.exists(p) else None
        return self._config

    @property
    def tracker(self):
        if self._tracker is None:
            from awesome_tpu.fit.tracker import Tracker

            p = os.path.join(self.path, "tracker.json")
            self._tracker = Tracker.load(p) if os.path.exists(p) else None
        return self._tracker

    def get_params(self, template: Optional[Any] = None):
        """Reload the stacked params saved by the runner (params.npz) or an
        AgentCheckpoint directory."""
        import jax.numpy as jnp

        npz = os.path.join(self.path, "params.npz")
        if os.path.exists(npz):
            data = np.load(npz)
            leaves = [jnp.asarray(data[k]) for k in data.files]
            if template is not None:
                import jax

                _, treedef = jax.tree_util.tree_flatten(template)
                return jax.tree_util.tree_unflatten(treedef, leaves)
            return leaves
        ckpt_dir = os.path.join(self.path, "checkpoint")
        if os.path.isdir(ckpt_dir):
            from awesome_tpu.fit.checkpoint import AgentCheckpoint

            return AgentCheckpoint.load(ckpt_dir, template).params
        raise FileNotFoundError(f"no params in {self.path}")

    def get_runner(self):
        """Rebuild a runnable AwesomeRunner from this finished run: config
        -> build (dataset + models) -> restore the saved stacked params.

        The reference's equivalent is ``get_agent`` -> TorchAgent.from_acc
        (`analytics/result_model.py:571`, `agent/torch_agent.py:1090`).
        Enables continued training / re-evaluation of an archived run.
        """
        from awesome_tpu.runner.runner import AwesomeRunner

        cfg = self.config
        if cfg is None:
            raise FileNotFoundError(f"no config.yaml in {self.path}")
        runner = AwesomeRunner(cfg)
        runner.build()
        runner.stacked_params = self.get_params(
            template=runner.stacked_params
        )
        if self.tracker is not None:
            runner.tracker = self.tracker
        return runner

    def metric(self, name: str, mode: str = "eval",
               scope: str = "epoch") -> Optional[float]:
        t = self.tracker
        if t is None:
            return None
        s = t.series.get((name, scope, mode))
        return s.last if s else None

    def metrics(self, mode: str = "eval") -> Dict[str, float]:
        t = self.tracker
        if t is None:
            return {}
        return {
            name: series.last
            for (name, scope, m), series in t.series.items()
            if m == mode and series.last is not None
        }

    @staticmethod
    def scan_result_directory(runs_path: str) -> List["ResultModel"]:
        """All run dirs under a runs folder.

        Spec: `analytics/result_model.py:411` scan_result_directory.
        """
        out = []
        for d in sorted(os.listdir(runs_path)):
            full = os.path.join(runs_path, d)
            if os.path.isdir(full) and (
                os.path.exists(os.path.join(full, "config.yaml"))
                or os.path.exists(os.path.join(full, "tracker.json"))
            ):
                out.append(ResultModel(full))
        return out


class ResultComparison:
    """Cross-run metric tables (the paper-table generator)."""

    def __init__(self, results: List[ResultModel]):
        self.results = results

    def table(self, metric_names: Optional[List[str]] = None,
              mode: str = "eval"):
        import pandas as pd

        rows = []
        for r in self.results:
            row = {"run": r.name}
            m = r.metrics(mode)
            if metric_names:
                m = {k: v for k, v in m.items() if k in metric_names}
            row.update(m)
            if r.config is not None and r.config.diff_config:
                for k, v in r.config.diff_config.items():
                    row[f"cfg:{k}"] = v
            rows.append(row)
        return pd.DataFrame(rows)

    def to_markdown(self, **kwargs) -> str:
        return self.table(**kwargs).to_markdown(index=False)

    def to_latex(self, **kwargs) -> str:
        return self.table(**kwargs).to_latex(index=False)

    def best(self, metric: str, maximize: bool = True,
             mode: str = "eval") -> Optional[ResultModel]:
        scored = [
            (r.metric(metric, mode), r)
            for r in self.results
            if r.metric(metric, mode) is not None
        ]
        if not scored:
            return None
        return (max if maximize else min)(scored, key=lambda t: t[0])[1]
