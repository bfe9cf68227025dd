"""FBMS experiment runner: spatio-temporal prior fitting and joint
UNet+prior training on video sequences.

Composition-root port of the FBMS paths of `awesome/run/awesome_runner.py`
(dataset='FBMSSequenceDataset', spatio-temporal configs
`config/path-connectedness/spatio-temporal/` and the joint configs
`config/path-connectedness/joint/*`):

- ``pretrain``: fit ONE shared (x, y, t) prior against the sequence's
  sparse trajectory weak labels (optionally noise-flipped) — the noisy
  spatio-temporal experiment of BASELINE.md,
- ``evaluate``: IoU of the thresholded prior against dense GT on the
  labeled frames,
- ``train_joint``: joint UNet + per-frame prior training via the
  compiled joint step (`awesome_tpu.fit.trainer`).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class FBMSExperimentConfig:
    dataset_path: str = ""
    flip_probability: float = 0.0
    noise_seed: int = 0
    num_epochs: int = 2000
    lr: float = 1e-3
    weight_mode: str = "none"
    prior_hidden_units: int = 32
    prior_flows: int = 12
    convex_hidden_units: int = 130
    convex_hidden_layers: int = 2
    downscale: int = 1
    seed: int = 42


class FBMSRunner:
    def __init__(self, config: FBMSExperimentConfig, dataset=None):
        self.config = config
        self.dataset = dataset
        self.model = None
        self.params = None

    def build(self):
        import jax

        from awesome_tpu.data.fbms import FBMSSequenceDataset
        from awesome_tpu.nn.path_connected import (
            real_nvp_path_connected_net,
        )

        cfg = self.config
        if self.dataset is None:
            self.dataset = FBMSSequenceDataset(
                cfg.dataset_path,
                flip_probability=cfg.flip_probability,
                noise_seed=cfg.noise_seed,
            )
        frame0 = self.dataset.load_frame(0)
        self.shape = frame0.shape[:2]
        self.model = real_nvp_path_connected_net(
            channels=3,  # (x, y, t)
            hidden_units=cfg.prior_hidden_units,
            flow_n_flows=cfg.prior_flows,
            flow_output_fn="tanh",
            spatial_shape=self.shape,
            convex_net_hidden_units=cfg.convex_hidden_units,
            convex_net_hidden_layers=cfg.convex_hidden_layers,
        )
        self.params = self.model.init(jax.random.PRNGKey(cfg.seed))
        return self

    def _collect(self):
        """Dense (T, N, 1) unaries + (T, N) labeled masks from trajectory
        weak labels."""
        t = len(self.dataset)
        h, w = self.shape
        targets = np.ones((t, h * w, 1), np.float32)
        labeled = np.zeros((t, h * w), bool)
        for i in range(t):
            s = self.dataset.sample(i)
            targets[i, :, 0] = s["unaries"].reshape(-1)
            labeled[i] = s["labeled"].reshape(-1)
        return targets, labeled

    def pretrain(self) -> Dict:
        import jax.numpy as jnp

        from awesome_tpu.fit.prior_fit import FitConfig
        from awesome_tpu.fit.spatiotemporal import (
            fit_spatiotemporal_prior,
            sequence_points,
        )

        cfg = self.config
        targets, labeled = self._collect()
        points = sequence_points(self.shape, len(self.dataset))
        fit_cfg = FitConfig(
            num_steps=cfg.num_epochs, lr=cfg.lr, weight_mode=cfg.weight_mode
        )
        self.params, aux = fit_spatiotemporal_prior(
            self.model,
            self.params,
            points,
            jnp.asarray(targets),
            jnp.asarray(labeled),
            fit_cfg,
            num_epochs=cfg.num_epochs,
        )
        return {
            "epoch_loss": np.asarray(aux["epoch_loss"]),
            "lr_scale": float(aux["lr_scale"]),
        }

    def evaluate(self) -> Dict[str, float]:
        import jax
        import jax.numpy as jnp

        from awesome_tpu.fit.spatiotemporal import sequence_points
        from awesome_tpu.measures.metrics import iou

        points = sequence_points(self.shape, len(self.dataset))
        ious: List[float] = []
        for idx in self.dataset.get_ground_truth_indices():
            gt = self.dataset.load_ground_truth(idx)
            if gt is None:
                continue
            prob = jax.nn.sigmoid(
                self.model.apply(self.params, points[idx])
            ).reshape(self.shape)
            ious.append(
                float(
                    iou(prob < 0.5, jnp.asarray(gt) < 0.5)
                )  # fg = 0 on both sides
            )
        return {
            "MeanForegroundBinaryMIOU": float(np.mean(ious)) if ious else 0.0,
            "num_gt_frames": len(ious),
        }
