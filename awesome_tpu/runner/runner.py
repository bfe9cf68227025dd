"""Runner — the composition root.

Behavior port of `awesome/run/runner.py:27-154` (seeding, config snapshot,
run-folder layout) and `awesome/run/awesome_runner.py:35-533` (build
dataset -> build models -> attach handles -> pretrain -> train -> eval).
The ~15 event attachments of the reference become explicit phases of a
compiled pipeline; per-image weight swapping becomes the stacked-params
engine.

Wired end-to-end for the pixel pipeline (per-image wrapper models,
'single' mode), the image pipeline ('3d' dimension: conv seg nets on
dense grids, gradient-penalty criteria) and the shared-seg 'multi'/'none'
modes; the FBMS joint video pipeline lives in ``runner.fbms_runner`` on
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


def persist_run(out: str, config, tracker, params) -> str:
    """The on-disk run layout the analytics layer scans
    (`analytics/result_model.py`: config.yaml + tracker.json + params.npz
    + treedef.txt) — ONE implementation shared by every runner."""
    import jax

    os.makedirs(out, exist_ok=True)
    save_yaml(config, os.path.join(out, "config.yaml"))
    tracker.save(os.path.join(out, "tracker.json"))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    np.savez(
        os.path.join(out, "params.npz"), *[np.asarray(x) for x in leaves]
    )
    with open(os.path.join(out, "treedef.txt"), "w") as f:
        f.write(str(treedef))
    return out


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
    """End-to-end pixel-pipeline runner.

    Wires the reference composition root's event attachments
    (`awesome/run/awesome_runner.py:294-475`) as explicit cadence handles
    around a SEGMENTED compiled training loop: eval-metric cadence
    (``compute_metrics_during_training_nth_epoch``), validation cadence +
    best-model checkpointing (``validation_each_nth_epoch``,
    `agent/util/tracker.py:533`), CRF'd eval metrics
    (``compute_crf_with_metrics`` / ``compute_crf_after_training``,
    `run/handles.py:376-459`), periodic image dumps
    (``plot_indices_during_training*``, `awesome_runner.py:304-333`),
    nth-epoch checkpoint saves (`awesome_runner.py:404-416`), pretrain
    orchestration with state load/save (``do_pretraining`` /
    ``pretrain_state_path``, `agent/torch_agent.py:553-607`) and the LR
    watchdog early stop.
    """

    CHECKPOINT_NTH_EPOCH = 20  # `awesome_runner.py:409` get_only_nth_epoch(20)

    def __init__(self, config: AwesomeConfig):
        super().__init__(config)
        self.dataset = None
        self.wrapper = None
        self.stacked_params = None
        self.tracker = None
        self.best_params = None
        self.train_indices = None
        self.val_indices = None
        self.handles: Dict[str, List[Callable]] = {
            "epoch_processed": [],
            "training_finished": [],
        }
        self._batch = None

    # --- build -----------------------------------------------------------
    @staticmethod
    def _dataset_paths_exist(args: Dict[str, Any]) -> bool:
        """True iff every *_dir / *_path string in (nested) dataset args
        points at an existing location. Missing data (zero-egress hosts)
        falls back to the synthetic replica instead of crashing."""
        found = [True]

        def walk(node):
            if isinstance(node, dict):
                for k, v in node.items():
                    if (
                        isinstance(v, str)
                        and (k.endswith("_dir") or k.endswith("_path")
                             or k == "dataset_path")
                    ):
                        found.append(os.path.exists(v))
                    else:
                        walk(v)
            elif isinstance(node, list):
                for v in node:
                    walk(v)

        walk(args)
        return all(found)

    def _synthetic_fallback(self, args: Dict[str, Any]):
        from awesome_tpu.data.synthetic import (
            make_sample,
            synthetic_convexity_dataset,
        )

        inner = args.get("dataset") or {}
        shapes = args.get("shapes")
        if shapes:
            # heterogeneous replica: one sample per requested (h, w) —
            # the real convexity-51 images vary in size
            return [
                make_sample(i, h=int(h), w=int(w))
                for i, (h, w) in enumerate(shapes)
            ]
        n = args.get("n") or inner.get("dataset_len") or 8
        return synthetic_convexity_dataset(
            n=int(min(n, 16)),
            h=args.get("h", 64),
            w=args.get("w", 64),
            hard=float(args.get("hard", 0.0)),
            hard_spread=bool(args.get("hard_spread", False)),
            flip_scale=float(args.get("flip_scale", 1.0)),
        )

    def build_dataset(self):
        cfg = self.config
        args = dict(cfg.dataset_args)
        self.image_mode = args.get("dimension") == "3d"
        if cfg.dataset_type is None:
            self.samples = self._synthetic_fallback(args)
        elif not self._dataset_paths_exist(args):
            logger.warning(
                "dataset paths in %s missing on this host; using the "
                "synthetic convexity replica", cfg.dataset_type,
            )
            self.samples = self._synthetic_fallback(args)
        else:
            ds_cls = dynamic_import(cfg.dataset_type)
            known = {"dataset_path", "scribble_percentage", "subset", "seed",
                     "samples", "augmentation"}
            ds_args = {k: v for k, v in args.items() if k in known}
            inner = args.get("dataset")
            if isinstance(inner, dict) and "img_dir" in inner:
                # reference nests the directory dataset inside the wrapper
                ds_args.setdefault(
                    "dataset_path", os.path.dirname(inner["img_dir"])
                )
            self.dataset = ds_cls(**ds_args)
            self.samples = [
                self.dataset.load(i) for i in range(len(self.dataset))
            ]
        return self.samples

    def _seg_args(self, seg_cls, args: Dict[str, Any]) -> Dict[str, Any]:
        """Map reference seg-model args onto the TPU models: 'input' ->
        in_type with the channel count derived from the dataset's xytype
        encoding (`awesome/model/cnn_net.py:18-28` rgb|xy|rgbxy concat of
        rgb(3) + the encoding channels)."""
        out = dict(args)
        in_type = out.pop("input", None)
        if in_type is not None:
            out["in_type"] = in_type
        enc = self.XYTYPE_CHANNELS.get(self.xytype, 2)
        name = getattr(seg_cls, "__name__", "")
        if name in ("CNNNet", "FCNet") and "in_chn" not in out:
            chn = {"rgb": 3, "xy": enc, "rgbxy": 3 + enc}.get(
                out.get("in_type", "rgbxy"), 3 + enc
            )
            out.setdefault("in_chn", chn)
            # use_binary_classification (`awesome/run/awesome_runner.py:64`):
            # binary -> ONE sigmoid channel, else one channel per class
            out.setdefault(
                "out_chn",
                1 if self.config.use_binary_classification else 2,
            )
        if name == "Net":
            out.setdefault("in_features", 3 + enc)
        import dataclasses as _dc

        if _dc.is_dataclass(seg_cls):
            valid = {f.name for f in _dc.fields(seg_cls)}
            out = {k: v for k, v in out.items() if k in valid}
        return out

    def build_models(self):
        from awesome_tpu.nn.adapters import PixelMatrixSeg
        from awesome_tpu.nn.seg import Net
        from awesome_tpu.nn.icnn import ConvexNextNet
        from awesome_tpu.nn.wrapper import WrapperModule

        cfg = self.config
        # use_binary_classification (`awesome/run/awesome_runner.py:64`):
        # binary problems get ONE sigmoid channel; disabling it requests a
        # per-class channel head on models that expose out_chn
        out_chn = 1 if cfg.use_binary_classification else 2
        if cfg.segmentation_model_type:
            seg_cls = dynamic_import(cfg.segmentation_model_type)
            seg_args = self._seg_args(seg_cls, cfg.segmentation_model_args)
            fields = {f.name for f in dataclasses.fields(seg_cls)} if (
                dataclasses.is_dataclass(seg_cls)
            ) else set()
            if "out_chn" in fields and "out_chn" not in seg_args:
                seg_args["out_chn"] = out_chn
            seg = seg_cls(**seg_args)
            if not getattr(self, "image_mode", False) and (
                seg_cls.__name__ == "FCNet"
            ):
                # FCNet in the 2d pipeline: adapt the (image, grid)
                # signature to pixel matrices (reference pixelize flow)
                seg = PixelMatrixSeg(seg)
            elif not getattr(self, "image_mode", False) and (
                seg_cls.__name__ == "CNNNet"
            ):
                raise ValueError(
                    "CNNNet is convolutional; use dimension '3d' (image "
                    "mode) in dataset_args"
                )
        else:
            seg = Net(**self._seg_args(Net, cfg.segmentation_model_args or {}))

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

        image_mode = getattr(self, "image_mode", False)
        # combined_segmentation_module_type is config-selected
        # (`awesome/run/awesome_runner.py:176-238` parse_type); the default
        # resolves to WrapperModule
        wrapper_cls = dynamic_import(cfg.combined_segmentation_module_type) \
            if cfg.combined_segmentation_module_type else WrapperModule
        self.wrapper = wrapper_cls(
            segmentation_module=seg,
            prior_module=prior,
            input_mode="image" if image_mode else "pixel",
            prior_arg_mode=(
                "param_clean_grid" if image_mode else "xy_c_preattached"
            ),
            use_segmentation_output_inversion=(
                cfg.use_segmentation_output_inversion
            ),
            segmentation_module_gets_targets=(
                cfg.segmentation_model_gets_targets
            ),
            **cfg.combined_segmentation_module_args,
        )
        return self.wrapper

    def build(self) -> None:
        import jax

        from awesome_tpu.data.batching import stack_padded
        from awesome_tpu.parallel.mesh import mesh_from_config

        # config-selected device mesh: stacked per-image state shards over
        # 'data', coordinate points over 'grid' (None = single-device)
        self.mesh = mesh_from_config(self.config)

        self.build_dataset()
        self._shapes = [s.shape for s in self.samples]
        if getattr(self, "image_mode", False):
            # pad-to-bucket: heterogeneous sizes share one (Hmax, Wmax)
            # dense grid; padded pixels carry weight 0 everywhere (the
            # reference is shape-agnostic per image,
            # `awesome/dataset/convexity_segmentation_dataset.py:178-246`)
            self._shape = (
                max(h for h, _ in self._shapes),
                max(w for _, w in self._shapes),
            )
        else:
            self._shape = self.samples[0].shape
        self.build_models()

        if self.image_mode:
            # dense full-grid tensors: the conv seg net sees whole images;
            # the loss is masked to scribbles, the extra penalty to the
            # unlabeled rest (AwesomeImageLoss semantics,
            # `awesome/measures/awesome_image_loss.py:9-52`)
            px = self._eval_pixels()  # (B, N=Hp*Wp, C), padded-grid layout
            b, n = px.shape[:2]
            hp, wp = self._shape
            gt = np.ones((b, n, 1), np.float32)
            scr_mask = np.zeros((b, n), bool)
            valid = np.zeros((b, n), bool)
            for i, s in enumerate(self.samples):
                h, w = s.shape
                v = np.zeros((hp, wp), bool)
                v[:h, :w] = True
                fg = np.zeros((hp, wp), bool)
                fg[:h, :w] = s.fg_mask
                bg = np.zeros((hp, wp), bool)
                bg[:h, :w] = s.bg_mask
                fg, bg, v = fg.reshape(-1), bg.reshape(-1), v.reshape(-1)
                gt[i, fg, 0] = 0.0  # fg encoded as 0
                gt[i, bg, 0] = 1.0
                scr_mask[i] = fg | bg
                valid[i] = v
            rnd_mask = valid & ~scr_mask
            self._batch = {
                "px": px,
                "gt": gt,
                "scr_mask": scr_mask,
                "rnd_mask": rnd_mask,
                "valid": valid,
            }
        else:
            # per-image pixel tensors, bucket-padded
            px_list, gt_list, scr_counts = [], [], []
            for s in self.samples:
                px, gt = s.pixels(self.config.scribble_percentage,
                                  seed=self.config.seed)
                px = self._encode_px(s, px)
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
        # whole wrapper is the per-image prior, PriorMode.FULL). 'multi'
        # shares ONE seg net (stacked priors only); state built lazily in
        # train(). 'none' trains priors only (seg frozen).
        mode = self.config.segmentation_training_mode
        if mode == "multi":
            self.stacked_params = None  # built with the train state
        else:
            keys = jax.random.split(
                jax.random.PRNGKey(self.config.seed), len(self.samples)
            )
            self.stacked_params = jax.vmap(self.wrapper.init)(keys)

        # train/val split over images (`awesome/dataset/separable_dataset.py`,
        # incl. the persisted-indices file so reruns see the same split)
        from awesome_tpu.data.split import split_indices

        split_ratio = float(self.config.dataset_args.get("split_ratio", 1.0))
        self.train_indices, self.val_indices = split_indices(
            len(self.samples), split_ratio, seed=self.config.seed,
            indices_file=self.config.dataset_args.get("indices_file"),
        )

        # warm-start the segmentation net from a saved state when given
        # (`torch_agent.py` segmentation_model_state_dict_path load)
        sd_path = self.config.segmentation_model_state_dict_path
        if sd_path:
            from awesome_tpu.fit.checkpoint import load_pytree, pytree_exists

            if pytree_exists(sd_path) and self.stacked_params is not None:
                import jax.numpy as jnp

                seg_template = jax.tree_util.tree_map(
                    lambda x: x[0], self.stacked_params["seg"]
                )
                loaded = load_pytree(sd_path, template=seg_template)
                self.stacked_params = dict(
                    self.stacked_params,
                    seg=jax.tree_util.tree_map(
                        lambda l, s: jnp.broadcast_to(l, s.shape).astype(
                            s.dtype
                        ),
                        loaded,
                        self.stacked_params["seg"],
                    ),
                )
            elif not pytree_exists(sd_path):
                logger.warning(
                    "segmentation_model_state_dict_path %s missing; "
                    "keeping fresh init", sd_path,
                )

        from awesome_tpu.fit.tracker import Tracker

        self.tracker = Tracker(
            primary_metric="Loss",
            primary_mode="val" if self.val_indices else "train",
        )

    # --- xytype feature encodings -------------------------------------------
    XYTYPE_CHANNELS = {"xy": 2, "feat": 2, "featxy": 4, "edge": 1,
                       "edgexy": 3}

    @property
    def xytype(self) -> str:
        return self.config.dataset_args.get("xytype", "xy")

    def _encoding_map(self, s) -> Optional[np.ndarray]:
        """Per-image (H, W, E) encoding replacing/extending the xy channels
        per the dataset's ``xytype`` (`awesome/dataset/image_sample.py:111-127`
        _get_xy): 'feat' = 2-ch PCA semantic features, 'featxy' = (xy, feat),
        'edge' = Sobel edge map, 'edgexy' = (xy, edge). Returns None for
        plain 'xy' (the default normalized grid). Without precomputed SSS
        embedmaps (zero egress) the fallback is the spectral-matting
        proxy (`runner/sss_extractor.py:spectral_soft_segments` —
        matting-Laplacian eigenvectors, the non-semantic half of the SSS
        pipeline), cached per image; RGB-PCA as the last resort.
        ``dataset_args['sss_proxy'] = 'spectral_device'`` selects the
        accelerator-native eigensolve (`ops/spectral.py`) instead of the
        host scipy path."""
        xytype = self.xytype
        if xytype == "xy":
            return None
        from awesome_tpu.data.image_sample import (
            edge_map,
            load_semantic_features,
            semantic_features,
        )

        h, w = s.shape
        yy, xx = np.mgrid[0:h, 0:w]
        xy = np.stack([yy / h - 0.5, xx / w - 0.5], -1).astype(np.float32)
        if xytype in ("feat", "featxy"):
            feat = None
            feature_dir = self.config.dataset_args.get("feature_dir")
            if feature_dir and os.path.isdir(feature_dir):
                feat = load_semantic_features(
                    feature_dir, f"img_{getattr(s, 'index', 0)}"
                )
            if feat is None:
                key = getattr(s, "index", None)
                cache = getattr(self, "_feat_cache", None)
                if cache is None:
                    cache = self._feat_cache = {}
                if key is not None and key in cache:
                    feat = cache[key]
                else:
                    from awesome_tpu.runner.sss_extractor import (
                        SemanticSoftSegmentationExtractor,
                    )

                    proxy = self.config.dataset_args.get(
                        "sss_proxy", "spectral")
                    ex = SemanticSoftSegmentationExtractor(
                        feature_dir or "/nonexistent", proxy=proxy)
                    # proxy_features degrades internally (device spectral
                    # -> host spectral -> pyramid PCA, each with its own
                    # warning); this guard only covers the pyramid path
                    # itself dying (e.g. scipy unavailable)
                    try:
                        feat = ex.proxy_features(s.image)
                    except Exception as e:
                        logger.warning(
                            "every sss proxy failed (%r); 'feat' falls "
                            "back to RGB-PCA for this image", e)
                        feat = semantic_features(s.image)
                    if key is not None:
                        cache[key] = feat
            return feat if xytype == "feat" else np.concatenate(
                [xy, feat], -1
            )
        if xytype in ("edge", "edgexy"):
            e = edge_map(s.image)[..., None].astype(np.float32)
            return e if xytype == "edge" else np.concatenate([xy, e], -1)
        raise ValueError(f"Unknown xytype {xytype}")

    def _encode_px(self, s, px: np.ndarray) -> np.ndarray:
        """Rewrite a (N, 5)=(y, x, r, g, b) pixel matrix to (N, E+3) with
        the xytype encoding channels in front (prior consumes [0:2])."""
        enc = self._encoding_map(s)
        if enc is None:
            return px
        h, w = s.shape
        iy = np.clip(np.round((px[:, 0] + 0.5) * h), 0, h - 1).astype(int)
        ix = np.clip(np.round((px[:, 1] + 0.5) * w), 0, w - 1).astype(int)
        return np.concatenate(
            [enc[iy, ix], px[:, 2:5]], axis=-1
        ).astype(np.float32)

    # --- forward dispatch ---------------------------------------------------
    def _forward_one(self, params, px, evaluate_prior: bool = True):
        """Per-image forward on a pixel matrix (N, 5)=(y,x,r,g,b) -> (N, C).

        Pixel mode delegates to the wrapper; image mode ('3d' dimension,
        conv seg nets) reshapes to NHWC for the seg net and queries the
        prior on the clean xy grid (`awesome/model/wrapper_module.py:157-228`
        per-image loop, `prior_arg_mode='param_clean_grid'`).
        """
        import jax.numpy as jnp

        if not getattr(self, "image_mode", False):
            return self.wrapper.apply(params, px, evaluate_prior=evaluate_prior)
        h, w = self._shape
        img = px[:, -3:].reshape(1, h, w, 3)
        grid_img = px[:, :-3].reshape(1, h, w, -1)
        seg = self.wrapper.segmentation_module.apply(
            params["seg"], img, grid_img
        )
        seg = self.wrapper.process_segmentation_output(seg).reshape(-1, 1)
        if self.wrapper.prior_module is None or not evaluate_prior:
            return seg
        prior = self.wrapper.prior_module.apply(params["prior"], px[:, 0:2])
        prior = self.wrapper.process_prior_output(prior).reshape(-1, 1)
        return jnp.concatenate([seg, prior], axis=-1)

    def _gp_weights(self):
        """Gradient-penalty weights from the configured loss criterion
        (`awesome/measures/gradient_penalty_loss.py:11`); zeros when the
        config doesn't use GradientPenaltyLoss."""
        crit = self.config.loss_args.get("criterion")
        if isinstance(crit, dict) and crit.get("__class__") == (
            "gradient_penalty"
        ):
            return (
                float(crit.get("xygrad", 0.0) or 0.0),
                float(crit.get("rgbgrad", 0.0) or 0.0),
            )
        return 0.0, 0.0

    def _make_loss_impl(self):
        """Custom per-image loss when image mode or gradient penalty is
        configured; None -> the pixel engine's default masked AwesomeLoss."""
        import jax
        import jax.numpy as jnp

        from awesome_tpu.fit.pixel_trainer import masked_awesome_loss
        from awesome_tpu.measures.losses import bce

        xyw, rgbw = self._gp_weights()
        image_mode = getattr(self, "image_mode", False)
        if not image_mode and not (xyw or rgbw):
            return None
        alpha = self.config.loss_args.get("alpha", 1.0)
        pen_base, pen_align = self._penalty_scales()
        has_prior = self.wrapper.prior_module is not None

        def loss_impl(params, px, gt, smask, rmask, extra_penalty):
            out = self._forward_one(params, px)
            if has_prior:
                loss = masked_awesome_loss(
                    out, gt, smask, rmask, alpha, extra_penalty,
                    pen_base_scale=pen_base, pen_align_scale=pen_align,
                )
            else:
                sw = smask.astype(out.dtype)[:, None]
                raw = bce(out[:, 0:1], gt, reduction="none")
                loss = (raw * sw).sum() / jnp.maximum(sw.sum(), 1.0)
            if xyw or rgbw:
                # d(seg)/d(input-channel-groups); px layout (y,x,r,g,b)
                g = jax.grad(
                    lambda p: self._forward_one(params, p)[:, 0:1].sum()
                )(px)
                if xyw:
                    loss = loss + xyw * jnp.mean(g[:, 0:2] ** 2)
                if rgbw:
                    loss = loss + rgbw * jnp.mean(g[:, 2:5] ** 2)
            return loss

        return loss_impl

    # --- pretrain ----------------------------------------------------------
    def pretrain(self) -> Optional[Dict[str, Any]]:
        """Pretrain orchestration: load a pretrain state when
        ``pretrain_state_path`` exists, else run the batched prior fit and
        save the state. Spec: `awesome/agent/torch_agent.py:553-607`.
        """
        import jax
        import jax.numpy as jnp

        cfg = self.config
        if not cfg.do_pretraining:
            return None
        if self.wrapper.prior_module is None:
            return None
        if self.stacked_params is None:
            # 'multi' mode builds its state lazily; create it now so the
            # pretrain fits seed the shared-seg training
            from awesome_tpu.fit.pixel_trainer import (
                shared_pixel_train_init,
            )

            state = shared_pixel_train_init(
                self.wrapper, jax.random.PRNGKey(cfg.seed),
                len(self.samples), self._train_cfg(1),
            )
            self.stacked_params = state.params
        from awesome_tpu.fit.checkpoint import (
            load_prior_cache,
            pytree_exists,
            save_prior_cache,
        )

        state_path = cfg.pretrain_state_path or os.path.join(
            self.output_folder, "pretrain_state"
        )
        # force_pretrain: refit even when a state exists
        # (`agent/torch_agent.py:594` force_pretrain gate)
        if not cfg.force_pretrain and pytree_exists(state_path):
            prior_stack = load_prior_cache(
                state_path, template=self.stacked_params["prior"]
            )
            self.stacked_params = dict(self.stacked_params, prior=prior_stack)
            logger.info("Pretrain state loaded from %s", state_path)
            return {"loaded": True, "path": state_path}

        from awesome_tpu.fit.prior_fit import (
            FitConfig,
            apply_prefits,
            fit_priors_batched,
            fit_priors_sequential,
        )

        b = self._batch
        px = jnp.asarray(b["px"])
        # unaries = current (untrained) segmentation output, thresholded —
        # `path_connected_net.py:832-855` (skip single-valued images)
        if cfg.segmentation_training_mode == "multi":
            shared_seg = self.stacked_params["seg"]  # no image axis
            seg = jax.vmap(
                lambda x: self._forward_one(
                    {"seg": shared_seg}, x, evaluate_prior=False
                )
            )(px)
        else:
            seg = jax.vmap(
                lambda p, x: self._forward_one(p, x, evaluate_prior=False)
            )(self.stacked_params, px)
        unaries = (np.asarray(seg) >= 0.5).astype(np.float32)
        pmask = np.asarray(b["valid"])  # (B, N) — padded points excluded
        valid = np.array(
            [len(np.unique(u[m])) > 1
             for u, m in zip(unaries[..., 0], pmask)],
            dtype=bool,
        )
        if self.val_indices:
            # the reference pretrains on the train split only
            # (`path_connected_net.py:810` iterates DataLoader(train_set))
            valid[list(self.val_indices)] = False
        pargs = dict(cfg.pretrain_args)
        fit_cfg = FitConfig(
            num_steps=int(pargs.get("num_epochs", 2000)),
            lr=float(pargs.get("lr", 1e-3)),
            flow_weight_decay=float(pargs.get("flow_weight_decay", 1e-5)),
            gate_threshold=0.5,
            gate_retries=int(pargs.get("proper_prior_fit_retrys", 1)),
        )
        points = px[..., 0:2]
        prior_model = self.wrapper.prior_module
        reuse_state = bool(pargs.get("reuse_state", False))
        if reuse_state:
            # the sequential (reuse_state) pretrain of
            # `path_connected_net.py:869-894`: optional flow-identity /
            # convex prefits warm-start image 0's cold fit (Zoo-cached flow
            # identity), then every later image starts from the previous
            # fitted state for reuse_state_epochs steps.
            params0 = prior_model.init(jax.random.PRNGKey(cfg.seed + 3))
            pts0 = np.asarray(points[0])[np.asarray(pmask[0])]
            u0 = np.asarray(unaries[0])[np.asarray(pmask[0])]
            # 'unaries' convex mode is pointwise (no dense-grid reshape) —
            # the multi-object override's choice
            # (`multiple_object_aware_path_connected_net.py:248-259`)
            params0 = apply_prefits(
                prior_model, params0, jnp.asarray(pts0),
                prefit_flow_identity=bool(
                    pargs.get("prefit_flow_net_identity")
                ),
                flow_identity_lr=float(
                    pargs.get("prefit_flow_net_identity_lr", 1e-2)
                ),
                flow_identity_weight_decay=float(pargs.get(
                    "prefit_flow_net_identity_weight_decay", 1e-5
                )),
                flow_identity_steps=int(pargs.get(
                    "prefit_flow_net_identity_num_epochs", 100
                )),
                prefit_convex=bool(pargs.get("prefit_convex_net")),
                convex_mode="unaries",
                convex_target=jnp.asarray(u0),
                convex_lr=float(pargs.get("prefit_convex_net_lr", 1e-3)),
                convex_weight_decay=float(
                    pargs.get("prefit_convex_net_weight_decay", 0.0)
                ),
                convex_steps=int(
                    pargs.get("prefit_convex_net_num_epochs", 200)
                ),
                zoo=self._pretrain_zoo(pargs),
                zoo_key=f"flow_identity_{pts0.shape}_{cfg.seed}",
            )
            warm_cfg = dataclasses.replace(
                fit_cfg,
                num_steps=int(pargs.get("reuse_state_epochs", 200)),
                gate_threshold=None,
            )
            fitted, aux = fit_priors_sequential(
                prior_model,
                params0,
                points,
                jnp.asarray(unaries),
                dataclasses.replace(fit_cfg, gate_threshold=None),
                warm_cfg=warm_cfg,
                valid_mask=jnp.asarray(valid),
                point_masks=jnp.asarray(pmask),
            )
            # skipped images (val holdout / single-valued unaries) keep
            # their OWN pre-existing priors — the sequential sweep's carry
            # passes THROUGH them (its output slot holds the previous
            # image's state), matching the reference's "keep the state of
            # the prior ... use it again" skip semantics
            # (`multiple_object_aware_path_connected_net.py:200-207`)
            keep = jnp.asarray(valid)
            fitted = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    keep.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
                ),
                fitted,
                self.stacked_params["prior"],
            )
            # the reference gates EVERY fit (warm-started ones included):
            # IoU < threshold -> reset and retry with the FULL epoch count
            # (`path_connected_net.py:964-982` — num_retrys>0 always uses
            # num_epochs). The shared engine helper handles scoring, NaN
            # semantics and the fresh-init vmapped refit.
            from awesome_tpu.fit.prior_fit import make_gate_retry_fn

            gate_retry = make_gate_retry_fn(
                prior_model, fit_cfg,
                per_image_points=True, with_point_masks=True,
            )
            fitted, scores = gate_retry(
                fitted, points, jnp.asarray(unaries), jnp.asarray(valid),
                retry_keys=jax.random.split(
                    jax.random.PRNGKey(cfg.seed + 11), len(self.samples)
                ),
                point_masks=jnp.asarray(pmask),
            )
            aux["gate_iou"] = scores
        else:
            mesh = getattr(self, "mesh", None)
            prior0 = self.stacked_params["prior"]
            target_u = jnp.asarray(unaries)
            pm = jnp.asarray(pmask)
            if mesh is not None:
                # image axis -> 'data', coordinate points -> 'grid'
                # (fit_priors_sharded's layout; XLA turns the per-step
                # loss reduction into a psum over 'grid')
                from awesome_tpu.parallel.mesh import (
                    maybe_shard,
                    shard_leading_stacked,
                )

                prior0 = shard_leading_stacked(
                    mesh, prior0, len(self.samples)
                )
                points = maybe_shard(mesh, points, ("data", "grid"))
                target_u = maybe_shard(mesh, target_u, ("data", "grid"))
                pm = maybe_shard(mesh, pm, ("data", "grid"))
            fitted, aux = fit_priors_batched(
                prior_model,
                prior0,
                points,
                target_u,
                fit_cfg,
                retry_keys=jax.random.split(
                    jax.random.PRNGKey(cfg.seed + 7), len(self.samples)
                ),
                valid_mask=jnp.asarray(valid),
                point_masks=pm,
            )
        self.stacked_params = dict(self.stacked_params, prior=fitted)
        os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
        save_prior_cache(fitted, state_path)
        logger.info("Pretrain state saved to %s", state_path)
        if cfg.save_images_after_pretraining:
            self._dump_images(epoch=0, folder="prior",
                              indices=range(len(self.samples)))
        result = {
            "loaded": False,
            "path": state_path,
            "gate_iou": np.asarray(aux.get("gate_iou", [])),
        }
        if cfg.compute_crf_after_pretraining:
            # after-pretrain CRF'd eval (`awesome_runner.py:335-341`
            # get_final_save_handle(compute_crf=...))
            result["metrics"] = self.evaluate(compute_crf=True)
        return result

    def _pretrain_zoo(self, pargs: Dict[str, Any]):
        """Zoo instance from pretrain_args (the reference nests
        ``zoo: {zoo_folder: ...}`` there,
        `config/path-connectedness/sequential/*.yaml`)."""
        z = pargs.get("zoo")
        if isinstance(z, dict) and z.get("zoo_folder"):
            from awesome_tpu.nn.zoo import Zoo

            return Zoo(z["zoo_folder"])
        return z if hasattr(z, "load_model_state") else None

    # --- train -----------------------------------------------------------
    def _penalty_scales(self):
        """Extra-penalty scales: AwesomeLoss hardcodes (0.1, 100); the
        JOINT losses weight with (gamma, beta) from loss_args
        (`awesome/measures/awesome_loss_joint.py`)."""
        la = self.config.loss_args
        if "joint" in (self.config.loss_type or ""):
            return float(la.get("gamma", 1.0)), float(la.get("beta", 1.0))
        return 0.1, 100.0

    def _train_cfg(self, num_epochs: int):
        from awesome_tpu.fit.pixel_trainer import PixelTrainConfig

        cfg = self.config
        pen_base, pen_align = self._penalty_scales()
        return PixelTrainConfig(
            num_epochs=num_epochs,
            lr=cfg.optimizer_args.get("lr", 1e-3),
            pen_base_scale=pen_base,
            pen_align_scale=pen_align,
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
            train_segmentation=(cfg.segmentation_training_mode != "none"),
            wn_weight_decay=(
                cfg.weight_decay_on_weight_norm_modules
                if cfg.split_params_in_param_groups
                else 0.0
            ),
        )

    def _cadences(self) -> List[int]:
        cfg = self.config
        out = [self.CHECKPOINT_NTH_EPOCH]
        if cfg.compute_metrics_during_training_nth_epoch:
            out.append(cfg.compute_metrics_during_training_nth_epoch)
        if (
            cfg.plot_indices_during_training
            and cfg.plot_indices_during_training_nth_epoch
        ):
            out.append(cfg.plot_indices_during_training_nth_epoch)
        if cfg.validation_each_nth_epoch:
            out.append(cfg.validation_each_nth_epoch)
        return out

    def train(self) -> Dict[str, Any]:
        """Run the full training protocol; an unexpected error dumps the
        newest host-visible params + the error for post-mortem before
        re-raising (reference `awesome/agent/torch_agent.py:1063`
        emergency_save on training exceptions)."""
        from awesome_tpu.fit.checkpoint import run_with_emergency

        return run_with_emergency(
            self._train_impl,
            os.path.join(self.output_folder, "checkpoints", "emergency"),
            lambda: self.stacked_params,
            lambda: {"epoch": getattr(self.tracker, "epoch", None)},
        )

    def _train_impl(self) -> Dict[str, Any]:
        import math

        import jax
        import jax.numpy as jnp

        from awesome_tpu.core import tree as T
        from awesome_tpu.fit.pixel_trainer import (
            make_pixel_segment_fn,
            make_shared_pixel_segment_fn,
            pixel_train_init,
            shared_pixel_train_init,
        )

        cfg = self.config
        shared_mode = cfg.segmentation_training_mode == "multi"
        num_epochs = cfg.num_epochs
        seg_len = math.gcd(num_epochs, math.gcd(*(self._cadences() + [0])))
        seg_len = max(1, min(seg_len or num_epochs, num_epochs))
        tcfg = self._train_cfg(seg_len)

        from awesome_tpu.parallel.mesh import maybe_shard

        mesh = getattr(self, "mesh", None)
        b = self._batch
        # (B, N, ...) batch tensors: images over 'data', pixels over 'grid'
        px = maybe_shard(mesh, b["px"], ("data", "grid"))
        gt = maybe_shard(mesh, b["gt"], ("data", "grid"))
        smask = maybe_shard(mesh, b["scr_mask"], ("data", "grid"))
        rmask = maybe_shard(mesh, b["rnd_mask"], ("data", "grid"))

        if shared_mode:
            state = shared_pixel_train_init(
                self.wrapper,
                jax.random.PRNGKey(cfg.seed),
                len(self.samples),
                tcfg,
                params=self.stacked_params,  # pretrained priors if any
            )
            self.stacked_params = state.params  # {'seg': shared, 'prior': B}
            segment = make_shared_pixel_segment_fn(self.wrapper, tcfg, seg_len)
        else:
            state = pixel_train_init(self.wrapper, self.stacked_params, tcfg)
            segment = make_pixel_segment_fn(
                self.wrapper, tcfg, seg_len, loss_impl=self._make_loss_impl()
            )
        # auto-resume BEFORE mesh placement: the freshly-built state is the
        # restore template; the resumed host arrays then shard exactly like
        # a cold start would
        kind = "shared" if shared_mode else "pixel"
        start_seg = 0
        start_epoch = 0
        resumed_stopped = False
        if cfg.resume:
            resumed = self._try_resume(state, kind, seg_len, num_epochs)
            if resumed is not None:
                state, start_epoch, rex = resumed
                self.stacked_params = state.params
                start_seg = start_epoch // seg_len
                # a watchdog-stopped run must not train extra epochs on
                # every restart (that would break bit-identity)
                resumed_stopped = bool(rex.get("stopped_early"))
        if mesh is not None:
            # per-image state (params / moments / schedules, stacked over
            # B) shards over 'data'; shared-seg leaves replicate
            from awesome_tpu.parallel.mesh import shard_leading_stacked

            state = type(state)(*shard_leading_stacked(
                mesh, tuple(state), len(self.samples)
            ))

        # validation holdout: val images' params are NEVER stepped (and in
        # 'multi' mode contribute nothing to the shared-seg gradient); their
        # per-epoch losses are pure forward measurements. Spec:
        # `awesome/dataset/separable_dataset.py:10-105` +
        # `awesome/agent/torch_agent.py:233-243` (no-grad val phase).
        trainable = np.ones((len(self.samples),), bool)
        if self.val_indices:
            trainable[list(self.val_indices)] = False
        trainable = jnp.asarray(trainable)

        # training_starts handles: initial eval metrics (+ CRF if configured)
        # — already in the restored tracker when resuming mid-run, and a
        # resumed checkpoint always has epoch >= 1 (start_seg can floor to
        # 0 for a stopped run whose epoch is below the new seg_len)
        if start_epoch == 0:
            if cfg.compute_metrics_during_training_nth_epoch:
                self.evaluate(compute_crf=cfg.compute_crf_with_metrics)
            self._maybe_dump_images(epoch=0)

        loss_chunks = []
        stopped_early = resumed_stopped
        # keep the TRUE epoch when nothing is left to train (stopped run,
        # or checkpoint >= num_epochs under a changed cadence) — never
        # relabel a later-epoch state backwards; aligned mid-run resumes
        # have start_epoch == start_seg * seg_len anyway
        epoch = (start_epoch
                 if (resumed_stopped or start_epoch >= num_epochs)
                 else start_seg * seg_len)
        for seg_i in range(start_seg, num_epochs // seg_len):
            if stopped_early:
                break
            state, aux = segment(state, px, gt, smask, rmask, trainable)
            self.stacked_params = state.params
            epoch = (seg_i + 1) * seg_len
            loss_hist = np.asarray(aux["loss_hist"])  # (B, L)
            loss_chunks.append(loss_hist)
            per_epoch = loss_hist.mean(axis=0)
            for e in range(seg_len):
                if self.train_indices and self.val_indices:
                    self.tracker.epoch_metric(
                        "Loss",
                        loss_hist[self.train_indices, e].mean(),
                        "train",
                    )
                else:
                    self.tracker.epoch_metric("Loss", per_epoch[e], "train")
                self.tracker.tick_epoch()

            # validation cadence (+ best-model gate on the primary metric);
            # the reference also always validates on the LAST epoch
            # (`awesome_runner.py:474-475` should_validate_on_epoch)
            val_tick = (
                cfg.validation_each_nth_epoch
                and epoch % cfg.validation_each_nth_epoch == 0
            ) or epoch == num_epochs
            if self.val_indices and val_tick:
                self.tracker.epoch_metric(
                    "Loss",
                    loss_hist[self.val_indices, -1].mean(),
                    "val",
                )
            if self.tracker.is_current_state_best_model():
                self.best_params = state.params
                self.save_checkpoint("best")

            if (
                cfg.compute_metrics_during_training_nth_epoch
                and epoch % cfg.compute_metrics_during_training_nth_epoch == 0
                and epoch < num_epochs
            ):
                self.evaluate(compute_crf=cfg.compute_crf_with_metrics)
            self._maybe_dump_images(epoch)
            # LR watchdog early stop: every image's plateau scale under the
            # threshold means every per-image fit is frozen (the condition
            # is computed BEFORE the 'latest' save so a stop landing on a
            # checkpoint epoch records stopped_early there too)
            watchdog_fired = False
            if tcfg.use_plateau and tcfg.lr_stop_scale > 0.0:
                scales = np.asarray(aux["lr_scale"]).reshape(-1)
                watchdog_fired = bool((scales <= tcfg.lr_stop_scale).all())

            if epoch % self.CHECKPOINT_NTH_EPOCH == 0:
                self.save_checkpoint("latest", state=state, epoch=epoch,
                                     state_kind=kind,
                                     stopped_early=watchdog_fired)

            if watchdog_fired:
                logger.info(
                    "LR watchdog: all fits frozen at epoch %d", epoch
                )
                stopped_early = True
                break

            for fn in self.handles["epoch_processed"]:
                fn(self, epoch)

        # training_finished: final metrics (+CRF), final save, checkpoint
        final_metrics = self.evaluate(
            compute_crf=cfg.compute_crf_with_metrics
            or cfg.compute_crf_after_training
        )
        if self.best_params is None:
            self.best_params = state.params
        self.save_checkpoint("end", state=state, epoch=epoch,
                             state_kind=kind, stopped_early=stopped_early)
        # final-save handle: plot_final_indices (-1 = all images)
        final_idx = cfg.plot_final_indices
        if final_idx is not None:
            if final_idx == -1:
                final_idx = list(range(len(self.samples)))
            elif not isinstance(final_idx, (list, tuple)):
                final_idx = [final_idx]
            # label with the TRUE epoch (matches the re-saved 'end' meta):
            # in the complete-unaligned no-op resume path epoch > num_epochs
            self._dump_images(epoch, "final", final_idx)
        else:
            self._maybe_dump_images(epoch=epoch, force=True)
        for fn in self.handles["training_finished"]:
            fn(self)
        loss_hist = (
            np.concatenate(loss_chunks, axis=1) if loss_chunks
            else np.zeros((len(self.samples), 0))
        )
        return {
            "loss_hist": loss_hist,
            "stopped_early": stopped_early,
            "final_metrics": final_metrics,
        }

    def _try_resume(self, template_state, kind: str, seg_len: int,
                    num_epochs: int):
        """Locate the newest resumable checkpoint under
        ``<output_folder>/checkpoints`` and restore the full train state.

        Returns ``(state, epoch, extra_meta)`` or ``None`` when nothing
        resumable exists. The resumed trajectory is bit-identical to an
        uninterrupted run (tests/test_resume.py): the NamedTuple state
        carries params, optimizer moments, plateau schedule and the
        absolute epoch counter, and the tracker (including its best-model
        gate) is restored from the checkpoint metadata. Thin adapter over
        the shared `fit/checkpoint.py:restore_resumable` sequence."""
        from awesome_tpu.fit.checkpoint import restore_resumable

        def _check_alignment(ep, ex):
            # a watchdog-stopped run needs no alignment: nothing more trains
            if ep % seg_len and not ex.get("stopped_early"):
                raise ValueError(
                    f"resume checkpoint at epoch {ep} is not aligned to "
                    f"the segment length {seg_len} — a cadence/num_epochs "
                    "config change since the checkpoint was written is "
                    "not resumable"
                )

        base = os.path.join(self.output_folder, "checkpoints")
        res = restore_resumable(
            base, kind, template_state, num_epochs,
            best_subpath="params", best_template=template_state.params,
            validate=_check_alignment,
        )
        if res is None:
            return None
        if res["tracker"] is not None:
            self.tracker = res["tracker"]
        if res["best"] is not None:
            self.best_params = res["best"]
        return res["state"], res["epoch"], res["extra"]

    # --- saving / image dumps ---------------------------------------------
    def save_checkpoint(self, tag: str, state=None, epoch=None,
                        state_kind=None, stopped_early: bool = False) -> str:
        """Agent-checkpoint save (params + tracker + config snapshot).
        Spec: `awesome/run/handles.py:195-232` save/prior-save handles.

        When the full train ``state`` (PixelTrainState / SharedTrainState
        NamedTuple) and the absolute ``epoch`` are given, the whole state —
        optimizer moments, plateau schedule, epoch counters — is persisted
        alongside, making the checkpoint RESUMABLE (``AwesomeConfig.resume``),
        not just analyzable. The reference's checkpoints only ever reload
        params post-hoc (`awesome/agent/torch_agent.py:1090-1136`)."""
        from awesome_tpu.fit.checkpoint import (
            AgentCheckpoint,
            atomic_dir,
            save_prior_cache,
            save_pytree,
        )
        from awesome_tpu.serialization.jsonconv import to_jsonable

        directory = os.path.join(self.output_folder, "checkpoints", tag)
        params = (
            self.best_params if tag == "best" and self.best_params is not None
            else self.stacked_params
        )
        extra = {}
        if epoch is not None:
            extra["epoch"] = int(epoch)
            extra["stopped_early"] = bool(stopped_early)
        if state_kind is not None:
            extra["state_kind"] = state_kind
        # atomic swap: a preemption mid-save leaves the previous complete
        # checkpoint intact (tag or its .old twin) instead of a torn one
        with atomic_dir(directory) as tmp:
            AgentCheckpoint(
                name=self.config.run_name,
                params=params,
                tracker=self.tracker.to_dict(),
                config=to_jsonable(self.config),
                extra=extra,
            ).save(tmp)
            if state is not None:
                # plain tuple: robust through Orbax's dict round trip
                save_pytree(tuple(state), os.path.join(tmp, "train_state"))
            if isinstance(params, dict) and "prior" in params:
                save_prior_cache(
                    params["prior"], os.path.join(tmp, "prior_cache.npz")
                )
        return directory

    def _maybe_dump_images(self, epoch: int, force: bool = False) -> None:
        cfg = self.config
        indices = cfg.plot_indices_during_training
        if not indices:
            return
        nth = cfg.plot_indices_during_training_nth_epoch or 1
        if not force and epoch % nth != 0:
            return
        self._dump_images(epoch, "output", indices)

    def _dump_images(self, epoch: int, folder: str, indices) -> None:
        """Qualitative dumps of seg/prior masks for selected images.
        Spec: `awesome/run/awesome_runner.py:304-333` _save_image."""
        from awesome_tpu.runner.functions import save_result

        outputs = self._forward_all()
        for index in indices:
            if index >= len(self.samples):
                continue
            s = self.samples[index]
            h, w = s.shape
            out = self._crop_output(outputs, index)
            seg = out[:, 0].reshape(h, w)
            prior = (
                out[:, 1].reshape(h, w) if out.shape[1] > 1 else None
            )
            save_result(
                os.path.join(
                    self.output_folder, folder, f"{index:03d}", f"e{epoch:05d}"
                ),
                index,
                s.image,
                seg > 0.5,
                prior_mask=prior > 0.5 if prior is not None else None,
                unaries=(
                    seg if self.config.include_unaries_when_saving else None
                ),
            )

    # --- eval ------------------------------------------------------------
    def _dense_px(self, s, pad_shape=None) -> np.ndarray:
        """Dense encoded pixel matrix of one image, layout (y, x, r, g, b)
        with the xytype encoding applied. ``pad_shape`` (Hp, Wp) emits the
        PADDED-grid layout (the image at [:h, :w], zero rgb elsewhere; xy
        keeps the image's own normalization so the valid region spans the
        reference's coordinate range)."""
        h, w = s.shape
        if pad_shape is None:
            yy, xx = np.mgrid[0:h, 0:w]
            rgb = s.image.reshape(-1, 3)
        else:
            hp, wp = pad_shape
            yy, xx = np.mgrid[0:hp, 0:wp]
            rgb = np.zeros((hp, wp, 3), np.float32)
            rgb[:h, :w] = s.image
            rgb = rgb.reshape(-1, 3)
        norm = np.stack([yy / h - 0.5, xx / w - 0.5], -1).reshape(-1, 2)
        return self._encode_px(
            s, np.concatenate([norm, rgb], axis=-1).astype(np.float32)
        )

    def _eval_pixels(self) -> np.ndarray:
        """Dense full-grid pixel matrices for every image, padded to a
        shared bucket: (B, Nmax, C) with layout (y, x, r, g, b).

        Pixel mode: each image's h*w rows come first, zero rows trail
        (so ``out[i, :h*w].reshape(h, w)`` is exact). Image mode: the
        PADDED-grid layout of ``self._shape`` = (Hmax, Wmax) so the conv
        seg net sees one static shape; crop ``[:h, :w]`` after reshape."""
        if getattr(self, "_eval_px", None) is not None:
            return self._eval_px
        if getattr(self, "image_mode", False):
            mats = [self._dense_px(s, pad_shape=self._shape)
                    for s in self.samples]
            px = np.stack(mats).astype(np.float32)
        else:
            mats = [self._dense_px(s) for s in self.samples]
            n_max = max(m.shape[0] for m in mats)
            px = np.zeros((len(mats), n_max, mats[0].shape[1]), np.float32)
            for i, m in enumerate(mats):
                px[i, : m.shape[0]] = m
        self._eval_px = px
        return px

    def _forward_all(self, params=None) -> np.ndarray:
        """One vmapped device call evaluating EVERY image's model on its
        dense grid -> (B, Nmax, 2) numpy (single host transfer). Replaces
        the reference's per-image no-grad loop (`run/functions.py:2111`)."""
        import jax
        import jax.numpy as jnp

        params = params if params is not None else self.stacked_params
        px = jnp.asarray(self._eval_pixels())
        shared = self.config.segmentation_training_mode == "multi"
        if shared:
            axes = {"seg": None}
            if "prior" in params:
                axes["prior"] = 0
            out = jax.vmap(
                lambda p, x: self.wrapper.apply(p, x), in_axes=(axes, 0)
            )(params, px)
        else:
            out = jax.vmap(self._forward_one)(params, px)
        if out.ndim == 2:
            out = out[..., None]
        return np.asarray(out)

    def _crop_output(self, outputs: np.ndarray, i: int) -> np.ndarray:
        """Extract image i's (h*w, C) rows from the stacked eval output,
        undoing the pad-to-bucket layout (trailing rows in pixel mode, the
        2D padded grid in image mode)."""
        h, w = self.samples[i].shape
        if getattr(self, "image_mode", False):
            hp, wp = self._shape
            return outputs[i].reshape(hp, wp, -1)[:h, :w].reshape(h * w, -1)
        return outputs[i, : h * w]

    def evaluate(
        self, compute_crf: Optional[bool] = None, params=None
    ) -> Dict[str, float]:
        """Full-dataset eval: per-image seg/prior (and optionally CRF'd)
        IoU + pixel accuracy on the dense grid vs GT — one vmapped forward
        for all images. Spec: `awesome/run/handles.py:339-477`
        get_compute_eval_metrics (+CRF via `run/handles.py:376-459`,
        `run/crf.py:45`)."""
        from awesome_tpu.measures.metrics import iou_np, pixel_accuracy_np

        if compute_crf is None:
            compute_crf = self.config.compute_crf_with_metrics
        outputs = self._forward_all(params)
        # batched CRF: ONE device call refines every image (the reference
        # loops pydensecrf per image on the host, `run/handles.py:376-459`);
        # mixed image sizes fall back to the per-image path below.
        crf_refined = None
        if compute_crf and len({s.shape for s in self.samples}) == 1:
            from awesome_tpu.ops.crf import dense_crf_batched

            imgs = np.stack([s.image for s in self.samples])
            segs = np.stack([
                self._crop_output(outputs, i)[:, 0].reshape(s.shape)
                for i, s in enumerate(self.samples)
            ])
            crf_refined = dense_crf_batched(
                imgs, segs, is_softmax_unaries=True
            )
        seg_ious, prior_ious, accs, crf_ious = [], [], [], []
        for i, s in enumerate(self.samples):
            h, w = s.shape
            out = self._crop_output(outputs, i)
            seg, prior = out[:, 0:1], (
                out[:, 1:2] if out.shape[1] > 1 else None
            )
            gt = s.gt.reshape(-1, 1)
            # fg encoded as 0 -> invert for fg IoU; host numpy metrics —
            # images here have heterogeneous shapes (no single vmapped
            # call) and the jnp path would pay a device sync per image
            seg_ious.append(iou_np(seg > 0.5, gt > 0.5, invert=True))
            accs.append(pixel_accuracy_np(seg, gt))
            if prior is not None:
                prior_ious.append(
                    iou_np(prior > 0.5, gt > 0.5, invert=True)
                )
            if compute_crf:
                # seg probability of BACKGROUND (fg=0 encoding); CRF refines
                # the 2-class distribution against the rgb image
                if crf_refined is not None:
                    refined = crf_refined[i]
                else:
                    from awesome_tpu.ops.crf import dense_crf

                    refined = dense_crf(
                        s.image, seg.reshape(h, w), is_softmax_unaries=True
                    )
                crf_mask = refined[..., 0].reshape(-1, 1)
                crf_ious.append(
                    iou_np(crf_mask > 0.5, gt > 0.5, invert=True)
                )
        metrics = {
            "MeanForegroundBinaryMIOU": float(np.mean(seg_ious)),
            "MeanPixelAccuracy": float(np.mean(accs)),
        }
        if prior_ious:
            metrics["PriorMeanForegroundBinaryMIOU"] = float(
                np.mean(prior_ious)
            )
        if crf_ious:
            metrics["CRFMeanForegroundBinaryMIOU"] = float(np.mean(crf_ious))
        # split-aware variants: the reference reports eval metrics per
        # train/val dataloader (`awesome/util/tensorboard.py:59-122` tag
        # scheme); held-out images get their own means.
        if self.train_indices and self.val_indices:
            per_image = {
                "MeanForegroundBinaryMIOU": seg_ious,
                "MeanPixelAccuracy": accs,
            }
            if prior_ious:
                per_image["PriorMeanForegroundBinaryMIOU"] = prior_ious
            if crf_ious:
                per_image["CRFMeanForegroundBinaryMIOU"] = crf_ious
            for k, vals in per_image.items():
                vals = np.asarray(vals)
                metrics[f"train/{k}"] = float(
                    vals[list(self.train_indices)].mean()
                )
                metrics[f"val/{k}"] = float(
                    vals[list(self.val_indices)].mean()
                )
        for k, v in metrics.items():
            self.tracker.epoch_metric(k, v, "eval")
        return metrics

    def sequential_prior_fit(
        self,
        num_steps: int = 2000,
        lr: float = 1e-3,
        gate_threshold: Optional[float] = 0.5,
        chunk: int = 8,
    ) -> Dict[str, Any]:
        """The paper's "sequential fit" (post-processing): refit every
        image's prior against the TRAINED segmentation's dense unaries on
        the full grid — all images in one vmapped compiled program.

        Spec: `awesome/model/path_connected_net.py:730-1008`
        _prior_based_pretrain (serial there; batched here).
        """
        import jax
        import jax.numpy as jnp

        from awesome_tpu.data.batching import stack_padded
        from awesome_tpu.fit.prior_fit import FitConfig, fit_priors_batched

        # one vmapped device call gives every image's trained seg unaries
        # (handles 'single'/'multi'/'none' modes and both input modes)
        outputs = self._forward_all()
        pts_list, target_list, valid = [], [], []
        for i, s in enumerate(self.samples):
            # per-image dense grid at the image's OWN shape; prior query
            # points = the encoding's leading channels (xy, or the feature
            # space for xytype='feat')
            px = self._dense_px(s)
            seg = self._crop_output(outputs, i)[:, 0:1]
            target = (seg >= 0.5).astype(np.float32)
            pts_list.append(px[:, 0:2].astype(np.float32))
            target_list.append(target)
            valid.append(len(np.unique(target)) > 1)

        # heterogeneous sizes: bucket-pad the per-image point lists; padded
        # points carry loss weight 0 and are excluded from the gate IoU
        pts, masks = stack_padded(pts_list)
        targets, _ = stack_padded(target_list)

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
        retry_keys = jax.random.split(
            jax.random.PRNGKey(self.config.seed + 1), len(self.samples)
        )
        # chunk the vmapped fit: fixed-size chunks reuse ONE compiled
        # program (built once via make_batched_fit_fn; the ragged tail is
        # padded to the chunk width with valid_mask=False so it shares the
        # same program), keep peak memory flat, and stay inside the
        # validated program-size envelope (a 51-wide vmapped dense fit has
        # crashed the TPU worker; 8-wide is the bench-validated width)
        from awesome_tpu.fit.prior_fit import make_batched_fit_fn

        b = len(self.samples)
        chunk = max(1, min(chunk, b))
        run = make_batched_fit_fn(
            prior_model, cfg, per_image_points=True, with_point_masks=True
        )
        fitted_chunks, gate_chunks = [], []
        valid_arr = np.asarray(valid)

        def pad_tail(x, n):
            if x.shape[0] == n:
                return x
            reps = np.repeat(x[-1:], n - x.shape[0], axis=0)
            return np.concatenate([x, reps], axis=0)

        for lo in range(0, b, chunk):
            hi = min(lo + chunk, b)
            n_real = hi - lo
            sel = slice(lo, hi)
            chunk_valid = pad_tail(valid_arr[sel], chunk).copy()
            chunk_valid[n_real:] = False  # pad slots pass through
            f, aux = run(
                jax.tree_util.tree_map(
                    lambda x: jnp.asarray(pad_tail(np.asarray(x[sel]),
                                                   chunk)),
                    prior_stack,
                ),
                jnp.asarray(pad_tail(pts[sel], chunk)),
                jnp.asarray(pad_tail(targets[sel], chunk)),
                valid_mask=jnp.asarray(chunk_valid),
                retry_keys=jnp.asarray(
                    pad_tail(np.asarray(retry_keys[sel]), chunk)
                ),
                point_masks=jnp.asarray(pad_tail(masks[sel], chunk)),
            )
            fitted_chunks.append(
                jax.tree_util.tree_map(lambda x: x[:n_real], f)
            )
            gate = np.asarray(aux.get("gate_iou", []))
            gate_chunks.append(gate[:n_real] if gate.size else gate)
        fitted = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *fitted_chunks
        )
        # write the refit priors back into the stacked wrapper params
        self.stacked_params = dict(self.stacked_params, prior=fitted)
        return {
            "gate_iou": np.concatenate(gate_chunks)
            if gate_chunks and gate_chunks[0].size else np.asarray([]),
            "valid": valid_arr,
        }

    def _prior_slice_of_stack(self):
        if isinstance(self.stacked_params, dict) and (
            "prior" in self.stacked_params
        ):
            return self.stacked_params["prior"]
        return None

    def save_results(self) -> str:
        """Persist config, tracker, and the stacked params."""
        return persist_run(
            self.output_folder, self.config, self.tracker,
            self.stacked_params,
        )
