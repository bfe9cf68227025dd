"""Runner — the composition root.

Behavior port of `awesome/run/runner.py:27-154` (seeding, config snapshot,
run-folder layout) and `awesome/run/awesome_runner.py:35-533` (build
dataset -> build models -> attach handles -> pretrain -> train -> eval).
The ~15 event attachments of the reference become explicit phases of a
compiled pipeline; per-image weight swapping becomes the stacked-params
engine.

Currently wired end-to-end for the pixel pipeline (convexity benchmark:
per-image wrapper models, batched prior pretrain, AwesomeLoss training
with extra-penalty phase, eval metrics). The image/joint pipeline uses
``awesome_tpu.fit.trainer``.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import random
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from awesome_tpu.runner.config import AwesomeConfig
from awesome_tpu.serialization.jsonconv import dynamic_import, save_yaml

logger = logging.getLogger(__name__)


def seed_all(seed: int) -> None:
    """Seed python/numpy RNGs. JAX keys are derived explicitly from the
    config seed at each use site (functional randomness — the equivalent
    of `awesome/run/runner.py:19-25` incl. determinism flags, which XLA
    gives by default)."""
    random.seed(seed)
    np.random.seed(seed)


class Runner:
    """Base runner: seeding + run folder + config snapshot.

    Spec: `awesome/run/runner.py:27-99`.
    """

    def __init__(self, config: AwesomeConfig):
        self.config = config
        config.prepare()
        seed_all(config.seed)
        self.output_folder = config.output_folder or os.path.join(
            config.runs_path, config.run_name
        )

    def store_config(self) -> None:
        save_yaml(self.config, os.path.join(self.output_folder, "config.yaml"))

    def build(self) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def train(self) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class AwesomeRunner(Runner):
    """End-to-end pixel-pipeline runner."""

    def __init__(self, config: AwesomeConfig):
        super().__init__(config)
        self.dataset = None
        self.wrapper = None
        self.stacked_params = None
        self.tracker = None
        self.handles: Dict[str, List[Callable]] = {
            "epoch_processed": [],
            "training_finished": [],
        }
        self._batch = None

    # --- build -----------------------------------------------------------
    def build_dataset(self):
        cfg = self.config
        if cfg.dataset_type is None:
            from awesome_tpu.data.synthetic import synthetic_convexity_dataset

            args = dict(cfg.dataset_args)
            self.samples = synthetic_convexity_dataset(
                n=args.get("n", 8),
                h=args.get("h", 64),
                w=args.get("w", 64),
            )
        else:
            ds_cls = dynamic_import(cfg.dataset_type)
            self.dataset = ds_cls(**cfg.dataset_args)
            self.samples = [
                self.dataset.load(i) for i in range(len(self.dataset))
            ]
        return self.samples

    def build_models(self):
        from awesome_tpu.nn.seg import Net
        from awesome_tpu.nn.icnn import ConvexNextNet
        from awesome_tpu.nn.wrapper import WrapperModule

        cfg = self.config
        if cfg.segmentation_model_type:
            seg_cls = dynamic_import(cfg.segmentation_model_type)
            seg = seg_cls(**cfg.segmentation_model_args)
        else:
            seg = Net(**(cfg.segmentation_model_args or {}))

        prior = None
        if cfg.use_prior_model:
            if cfg.prior_model_type:
                target = dynamic_import(cfg.prior_model_type)
                prior = (
                    target(**cfg.prior_model_args)
                    if callable(target) and not isinstance(target, type)
                    else target(**cfg.prior_model_args)
                )
            else:
                prior = ConvexNextNet(**(cfg.prior_model_args or {}))

        self.wrapper = WrapperModule(
            segmentation_module=seg,
            prior_module=prior,
            input_mode="pixel",
            use_segmentation_output_inversion=(
                cfg.use_segmentation_output_inversion
            ),
            **cfg.combined_segmentation_module_args,
        )
        return self.wrapper

    def build(self) -> None:
        import jax

        from awesome_tpu.data.batching import stack_padded

        self.build_dataset()
        self.build_models()

        # per-image pixel tensors, bucket-padded
        px_list, gt_list, scr_counts = [], [], []
        for s in self.samples:
            px, gt = s.pixels(self.config.scribble_percentage,
                              seed=self.config.seed)
            n_scr = s.important_pixels()[0].shape[0]
            gt_full = np.zeros((px.shape[0], 1), np.float32)
            gt_full[: gt.shape[0]] = gt
            px_list.append(px)
            gt_list.append(gt_full)
            scr_counts.append(n_scr)
        px, valid = stack_padded(px_list)
        gt, _ = stack_padded(gt_list)
        n = px.shape[1]
        scr_mask = np.zeros_like(valid)
        rnd_mask = np.zeros_like(valid)
        for i, c in enumerate(scr_counts):
            scr_mask[i, :c] = True
            rnd_mask[i] = valid[i] & ~scr_mask[i]
        self._batch = {
            "px": px,
            "gt": gt,
            "scr_mask": scr_mask,
            "rnd_mask": rnd_mask,
            "valid": valid,
        }

        # stacked per-image wrapper params ('single' training mode: the
        # whole wrapper is the per-image prior, PriorMode.FULL)
        keys = jax.random.split(
            jax.random.PRNGKey(self.config.seed), len(self.samples)
        )
        self.stacked_params = jax.vmap(self.wrapper.init)(keys)

        from awesome_tpu.fit.tracker import Tracker

        self.tracker = Tracker(primary_metric="Loss", primary_mode="train")

    # --- train -----------------------------------------------------------
    def train(self) -> Dict[str, Any]:
        import jax.numpy as jnp

        from awesome_tpu.fit.pixel_trainer import (
            PixelTrainConfig,
            train_pixel_models,
        )

        cfg = self.config
        tcfg = PixelTrainConfig(
            num_epochs=cfg.num_epochs,
            lr=cfg.optimizer_args.get("lr", 1e-3),
            optimizer=cfg.optimizer_type
            if cfg.optimizer_type in ("adam", "adamax")
            else "adam",
            alpha=cfg.loss_args.get("alpha", 1.0),
            extra_penalty_after=(
                cfg.extra_penalty_after_n_epochs
                if cfg.use_extra_penalty_hook
                else None
            ),
            extra_penalty_lr_factor=(
                cfg.reduce_lr_in_extra_penalty_hook_factor
                if cfg.use_reduce_lr_in_extra_penalty_hook
                else 1.0
            ),
            use_plateau=cfg.use_lr_on_plateau_scheduler,
            lr_stop_scale=(
                cfg.lr_stop_training_watchdog_args.get("threshold_scale", 0.0)
                if cfg.use_lr_stop_training_watchdog
                and cfg.use_lr_on_plateau_scheduler
                else 0.0
            ),
        )
        b = self._batch
        fitted, aux = train_pixel_models(
            self.wrapper,
            self.stacked_params,
            jnp.asarray(b["px"]),
            jnp.asarray(b["gt"]),
            jnp.asarray(b["scr_mask"]),
            jnp.asarray(b["rnd_mask"]),
            tcfg,
        )
        self.stacked_params = fitted
        loss_hist = np.asarray(aux["loss_hist"])  # (B, E)
        for e in range(loss_hist.shape[1]):
            self.tracker.epoch_metric("Loss", loss_hist[:, e].mean(), "train")
            self.tracker.tick_epoch()
        for fn in self.handles["training_finished"]:
            fn(self)
        return {"loss_hist": loss_hist}

    # --- eval ------------------------------------------------------------
    def evaluate(self) -> Dict[str, float]:
        """Full-dataset eval: per-image seg/prior IoU + pixel accuracy on
        the dense grid vs GT. Spec: `awesome/run/handles.py:339-477`
        get_compute_eval_metrics."""
        import jax
        import jax.numpy as jnp

        from awesome_tpu.core import grids as G
        from awesome_tpu.core import tree as T
        from awesome_tpu.measures.metrics import iou, pixel_accuracy

        seg_ious, prior_ious, accs = [], [], []
        for i, s in enumerate(self.samples):
            h, w = s.shape
            yy, xx = np.mgrid[0:h, 0:w]
            norm = np.stack(
                [yy / h - 0.5, xx / w - 0.5], axis=-1
            ).reshape(-1, 2)
            rgb = s.image.reshape(-1, 3)
            px = jnp.asarray(
                np.concatenate([norm, rgb], axis=-1, dtype=np.float32)
            )
            params_i = T.tree_select(self.stacked_params, i)
            out = self.wrapper.apply(params_i, px)
            seg, prior = self.wrapper.split_output(out)
            gt = jnp.asarray(s.gt.reshape(-1, 1))
            # fg encoded as 0 -> invert for fg IoU
            seg_ious.append(float(iou(seg > 0.5, gt > 0.5, invert=True)))
            accs.append(float(pixel_accuracy(seg, gt)))
            if prior is not None:
                prior_ious.append(
                    float(iou(prior > 0.5, gt > 0.5, invert=True))
                )
        metrics = {
            "MeanForegroundBinaryMIOU": float(np.mean(seg_ious)),
            "MeanPixelAccuracy": float(np.mean(accs)),
        }
        if prior_ious:
            metrics["PriorMeanForegroundBinaryMIOU"] = float(
                np.mean(prior_ious)
            )
        for k, v in metrics.items():
            self.tracker.epoch_metric(k, v, "eval")
        return metrics

    def sequential_prior_fit(
        self,
        num_steps: int = 2000,
        lr: float = 1e-3,
        gate_threshold: Optional[float] = 0.5,
    ) -> Dict[str, Any]:
        """The paper's "sequential fit" (post-processing): refit every
        image's prior against the TRAINED segmentation's dense unaries on
        the full grid — all images in one vmapped compiled program.

        Spec: `awesome/model/path_connected_net.py:730-1008`
        _prior_based_pretrain (serial there; batched here).
        """
        import jax
        import jax.numpy as jnp

        from awesome_tpu.core import grids as G
        from awesome_tpu.core import tree as T
        from awesome_tpu.fit.prior_fit import FitConfig, fit_priors_batched

        h, w = self.samples[0].shape
        pts_list, target_list, valid = [], [], []
        for i, s in enumerate(self.samples):
            yy, xx = np.mgrid[0:h, 0:w]
            norm = np.stack([yy / h - 0.5, xx / w - 0.5], -1).reshape(-1, 2)
            rgb = s.image.reshape(-1, 3)
            px = np.concatenate([norm, rgb], -1).astype(np.float32)
            params_i = T.tree_select(self.stacked_params, i)
            seg = self.wrapper.apply(
                params_i, jnp.asarray(px), evaluate_prior=False
            )
            unaries = np.asarray(seg).reshape(-1, 1)
            pts_list.append(norm.astype(np.float32))
            target_list.append((unaries >= 0.5).astype(np.float32))
            u = np.unique(unaries >= 0.5)
            valid.append(len(u) > 1)

        prior_model = self.wrapper.prior_module
        # warm start from the jointly-trained priors when present, else
        # fresh per-image inits
        prior_stack = self._prior_slice_of_stack()
        if prior_stack is None:
            prior_stack = jax.vmap(prior_model.init)(
                jax.random.split(
                    jax.random.PRNGKey(self.config.seed), len(self.samples)
                )
            )

        cfg = FitConfig(
            num_steps=num_steps, lr=lr, gate_threshold=gate_threshold
        )
        fitted, aux = fit_priors_batched(
            prior_model,
            prior_stack,
            jnp.asarray(np.stack(pts_list)),
            jnp.asarray(np.stack(target_list)),
            cfg,
            retry_keys=jax.random.split(
                jax.random.PRNGKey(self.config.seed + 1), len(self.samples)
            ),
            valid_mask=jnp.asarray(valid),
        )
        # write the refit priors back into the stacked wrapper params
        self.stacked_params = dict(self.stacked_params, prior=fitted)
        return {
            "gate_iou": np.asarray(aux.get("gate_iou", [])),
            "valid": np.asarray(valid),
        }

    def _prior_slice_of_stack(self):
        if isinstance(self.stacked_params, dict) and (
            "prior" in self.stacked_params
        ):
            return self.stacked_params["prior"]
        return None

    def save_results(self) -> str:
        """Persist config, tracker, and the stacked params."""
        import jax

        os.makedirs(self.output_folder, exist_ok=True)
        self.store_config()
        self.tracker.save(os.path.join(self.output_folder, "tracker.json"))
        leaves, treedef = jax.tree_util.tree_flatten(self.stacked_params)
        np.savez(
            os.path.join(self.output_folder, "params.npz"),
            *[np.asarray(x) for x in leaves],
        )
        with open(os.path.join(self.output_folder, "treedef.txt"), "w") as f:
            f.write(str(treedef))
        return self.output_folder
