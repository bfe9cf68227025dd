"""Combined segmentation + prior model — the functional WrapperModule.

The reference's ``WrapperModule`` (`awesome/model/wrapper_module.py:13-341`)
loops over batch images in Python, swaps per-image prior weights via
PriorManager, and concatenates seg/prior outputs. Here it is a pure
function; the per-image loop becomes ``vmap`` over a stacked prior param
tree, and "swap weights" is indexing that tree.

Two input modes (spec `abstract_combined_segmentation_module.py:23`):

- 'pixel': inputs are point matrices (N, C) with layout (y, x, r, g, b...);
  the prior sees channels [0:2] (``prior_arg_mode='xy_c_preattached'``,
  `wrapper_module.py:94-99`); outputs concatenate on the last dim ->
  (N, 2) [seg, prior].
- 'image': inputs are NHWC image + feature map + a clean coordinate grid
  for the prior (``prior_arg_mode='param_clean_grid'``); outputs
  concatenate on the channel dim -> (B, H, W, 2C).
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from awesome_tpu.core import grids as G
from awesome_tpu.nn.module import Module


class PriorMode(enum.Enum):
    """What the per-image 'prior state' covers.

    Spec: `awesome/model/abstract_combined_segmentation_module.py:13`:
    FULL = the whole wrapper (per-image seg+prior, 'single' training
    mode), PARTIAL = only the prior module, NONE = no per-image state.
    In the stacked-params design this decides which subtree gets the
    leading image axis.
    """

    FULL = "full"
    PARTIAL = "partial"
    NONE = "none"


class InputMode(enum.Enum):
    PIXEL = "pixel"
    IMAGE = "image"


class EvaluationMode(enum.Enum):
    BOTH = "both"
    SEGMENTATION = "segmentation"
    PRIOR = "prior"


class GradientMode(enum.Enum):
    """Which sub-module gradients flow during the forward.

    Spec: `awesome/model/abstract_combined_segmentation_module.py:50-63` —
    functional equivalent: ``stop_gradient`` on the excluded part instead
    of torch's requires_grad toggling.
    """

    NONE = "none"
    SEGMENTATION = "segmentation"
    PRIOR = "prior"
    BOTH = "both"


@dataclasses.dataclass(frozen=True)
class WrapperModule(Module):
    segmentation_module: Module
    prior_module: Optional[Module] = None
    input_mode: str = "pixel"  # 'pixel' | 'image'
    prior_arg_mode: str = "xy_c_preattached"
    # 'forward' is the only mode the reference implements — anything else
    # raises there too (`awesome/model/wrapper_module.py:151-155`)
    segmentation_arg_mode: str = "forward"
    segmentation_module_gets_targets: bool = False
    use_segmentation_sigmoid: bool = True
    use_segmentation_output_inversion: bool = False
    use_prior_sigmoid: bool = True
    gradient_mode: str = "both"  # GradientMode values
    prior_mode: str = "partial"  # PriorMode values (extract/apply below)
    seg_stateful: bool = False  # segmentation module has (params, state)

    # ---- init ------------------------------------------------------------
    def init(self, key):
        k1, k2 = jax.random.split(key)
        if self.seg_stateful:
            seg_params, seg_state = self.segmentation_module.init(k1)
        else:
            seg_params, seg_state = self.segmentation_module.init(k1), None
        params = {"seg": seg_params}
        if self.prior_module is not None:
            params["prior"] = self.prior_module.init(k2)
        return (params, seg_state) if self.seg_stateful else params

    # ---- pieces ----------------------------------------------------------
    def process_segmentation_output(self, segm):
        """Sigmoid + optional inversion. Spec: `wrapper_module.py:246-260`."""
        if self.use_segmentation_sigmoid:
            segm = jax.nn.sigmoid(segm)
        if self.use_segmentation_output_inversion:
            segm = 1.0 - segm
        return segm

    def process_prior_output(self, prior, use_sigmoid: Optional[bool] = None):
        if use_sigmoid is None:
            use_sigmoid = self.use_prior_sigmoid
        return jax.nn.sigmoid(prior) if use_sigmoid else prior

    def get_prior_input(self, _input, grid=None, clean_grid=None):
        """Extract the prior's coordinate input.

        Spec: `wrapper_module.py:80-127` ``get_prior_args``:
        - 'xy_c_preattached': xy channels of the pixel matrix,
        - 'param_grid': the PER-IMAGE (possibly deformed/augmented) grid —
          the reference's args[0],
        - 'param_clean_grid': the clean coordinate grid — args[1].
        """
        if self.prior_arg_mode == "none":
            return None
        if self.prior_arg_mode == "xy_c_preattached":
            return _input[..., 0:2]
        if self.prior_arg_mode == "param_grid":
            if grid is None:
                raise ValueError("prior_arg_mode param_grid requires grid")
            return grid
        if self.prior_arg_mode == "param_clean_grid":
            chosen = clean_grid if clean_grid is not None else grid
            if chosen is None:
                raise ValueError(
                    "prior_arg_mode param_clean_grid requires clean_grid"
                )
            return chosen
        raise ValueError(f"Unknown prior_arg_mode {self.prior_arg_mode}")

    # ---- PriorMode extract/apply (explicit API) ---------------------------
    def extract_prior(self, params):
        """The per-image 'prior state' under ``prior_mode``:
        PARTIAL -> the prior subtree, FULL -> the whole wrapper tree,
        NONE -> None. Spec:
        `abstract_combined_segmentation_module.py:76-108` extract_prior.
        """
        mode = PriorMode(self.prior_mode)
        if mode == PriorMode.PARTIAL:
            return params.get("prior") if self.prior_module else None
        if mode == PriorMode.FULL:
            return params
        return None

    def apply_prior(self, params, prior_state):
        """Write a prior state back into the wrapper params (the functional
        counterpart of the reference's in-place load_state_dict,
        `abstract_combined_segmentation_module.py:108-129`)."""
        if prior_state is None:
            return params
        mode = PriorMode(self.prior_mode)
        if mode == PriorMode.PARTIAL:
            return dict(params, prior=prior_state)
        if mode == PriorMode.FULL:
            return prior_state
        return params

    def _grad_gate(self, segm, prior):
        mode = GradientMode(self.gradient_mode)
        if mode in (GradientMode.NONE, GradientMode.PRIOR):
            segm = jax.lax.stop_gradient(segm)
        if prior is not None and mode in (
            GradientMode.NONE, GradientMode.SEGMENTATION
        ):
            prior = jax.lax.stop_gradient(prior)
        return segm, prior

    def enforce_convexity(self, params):
        if self.prior_module is None or "prior" not in params:
            return params
        return dict(
            params,
            prior=self.prior_module.enforce_convexity(params["prior"]),
        )

    # ---- forward ---------------------------------------------------------
    def _seg_apply(self, params, *args, targets=None, **kwargs):
        """segmentation_arg_mode 'forward': pass inputs through, plus the
        targets kwarg when ``segmentation_module_gets_targets``
        (spec: `wrapper_module.py:142-155`)."""
        if self.segmentation_arg_mode != "forward":
            raise NotImplementedError(
                f"segmentation_arg_mode {self.segmentation_arg_mode} is "
                "unknown."
            )
        if self.segmentation_module_gets_targets:
            kwargs["targets"] = targets
        return self.segmentation_module.apply(params, *args, **kwargs)

    def apply(
        self,
        params,
        _input,
        features=None,
        grid=None,
        clean_grid=None,
        seg_state=None,
        targets=None,
        evaluate_prior: bool = True,
        train: bool = False,
    ):
        """Pixel mode: ``_input`` (N, C) -> (N, 2).
        Image mode: ``_input`` NHWC image, ``features`` NHWC, ``grid`` /
        ``clean_grid`` (N_pts, C) coordinate points (per-image deformed vs
        clean — prior_arg_mode picks) -> (B, H, W, 2*out_chn).
        Stateful seg modules additionally return new_seg_state.
        """
        if self.input_mode == "pixel":
            segm = self._seg_apply(params["seg"], _input, targets=targets)
            segm = self.process_segmentation_output(segm)
            if self.prior_module is None or not evaluate_prior:
                return segm
            prior_in = self.get_prior_input(_input, grid, clean_grid)
            prior = self.prior_module.apply(params["prior"], prior_in)
            prior = self.process_prior_output(prior)
            segm, prior = self._grad_gate(segm, prior)
            return jnp.concatenate([segm, prior], axis=-1)

        if self.input_mode == "image":
            if self.seg_stateful:
                segm, new_state = self.segmentation_module.apply(
                    params["seg"], seg_state, _input, features, train=train
                )
            else:
                segm = self._seg_apply(
                    params["seg"], _input, features, targets=targets
                )
                new_state = None
            segm = self.process_segmentation_output(segm)
            if self.prior_module is None or not evaluate_prior:
                return (segm, new_state) if self.seg_stateful else segm
            prior_in = self.get_prior_input(None, grid, clean_grid)
            prior_pts = self.prior_module.apply(params["prior"], prior_in)
            prior_pts = self.process_prior_output(prior_pts)
            segm, prior_pts = self._grad_gate(segm, prior_pts)
            b, h, w, c = segm.shape
            prior_img = prior_pts.reshape(b, h, w, c)
            out = jnp.concatenate([segm, prior_img], axis=-1)
            return (out, new_state) if self.seg_stateful else out

        raise ValueError(f"Unknown input_mode {self.input_mode}")

    def split_output(self, output) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Split combined output back into (seg, prior).

        Spec: `wrapper_module.py:276-319` ``split_model_output``.
        """
        if self.prior_module is None:
            return output, None
        half = output.shape[-1] // 2
        return output[..., :half], output[..., half:]
