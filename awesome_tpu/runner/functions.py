"""Evaluation / plotting / saving toolbox.

Behavior port of the reference's `awesome/run/functions.py` (2.6k LoC of
eval+plot helpers). The pieces models and analytics actually consume:

- :func:`get_result` — no-grad full-image inference with a selected
  per-image prior slice (spec `:2111` incl. PriorManager swap — here a
  stacked-tree index),
- :func:`split_model_result` — seg/prior split + optional CRF (`:2432`),
- :func:`get_prior_result` — dense prior eval on an arbitrary-resolution
  grid, batched/chunked (`:2154`),
- :func:`save_result` — masks + overlay PNGs into a run dir (`:2490`),
- mask<->channel converters (`:1314,1469`),
- :func:`plot_mask` / :func:`plot_as_image` matplotlib figures used by the
  how-to flow, and a GIF writer (`awesome/util/gif_writer_images.py:10`).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


# --- inference helpers ---------------------------------------------------


def get_result(
    wrapper,
    stacked_params,
    pixels,
    index: int,
    evaluate_prior: bool = True,
):
    """Forward one image's pixels through its OWN model slice."""
    from awesome_tpu.core import tree as T

    params = T.tree_select(stacked_params, index)
    return wrapper.apply(params, pixels, evaluate_prior=evaluate_prior)


def split_model_result(
    wrapper,
    output,
    image: Optional[np.ndarray] = None,
    use_crf: bool = False,
    crf_options=None,
    grid_shape: Optional[Tuple[int, int]] = None,
):
    """Split into (seg, prior[, crf]) maps; optional dense-CRF refinement
    of the segmentation. Spec: `run/functions.py:2432` + `run/crf.py:45`."""
    seg, prior = wrapper.split_output(output)
    result = {"seg": np.asarray(seg), "prior": None, "crf": None}
    if prior is not None:
        result["prior"] = np.asarray(prior)
    if use_crf:
        if image is None or grid_shape is None:
            raise ValueError("CRF needs the image and grid_shape")
        from awesome_tpu.ops.crf import dense_crf

        seg_img = np.asarray(seg).reshape(grid_shape)
        refined = dense_crf(image, seg_img[..., None], options=crf_options)
        result["crf"] = refined[..., 0].reshape(np.asarray(seg).shape)
    return result


def get_prior_result(
    prior_module,
    prior_params,
    grid_shape: Tuple[int, int],
    super_resolution: float = 1.0,
    chunk: int = 1 << 16,
):
    """Dense prior evaluation on a (super-resolution) grid, chunked to
    bound memory. Returns (H', W') sigmoid probabilities."""
    import jax
    import jax.numpy as jnp

    from awesome_tpu.core import grids as G

    h = int(grid_shape[0] * super_resolution)
    w = int(grid_shape[1] * super_resolution)
    pts = G.flatten_grid(G.pixel_grid((h, w)))
    outs = []
    for i in range(0, pts.shape[0], chunk):
        out = prior_module.apply(prior_params, pts[i:i + chunk])
        outs.append(jax.nn.sigmoid(out))
    return np.asarray(jnp.concatenate(outs, axis=0)).reshape(h, w)


# --- mask <-> channel converters ----------------------------------------


def masks_to_channels(masks: Sequence[np.ndarray]) -> np.ndarray:
    """Stack binary masks (each (H, W)) into (H, W, N)."""
    return np.stack([np.asarray(m, np.float32) for m in masks], axis=-1)


def channels_to_masks(channels: np.ndarray,
                      threshold: float = 0.5) -> List[np.ndarray]:
    return [channels[..., i] > threshold for i in range(channels.shape[-1])]


def labels_to_onehot(labels: np.ndarray,
                     num_classes: Optional[int] = None) -> np.ndarray:
    n = num_classes or int(labels.max()) + 1
    return (labels[..., None] == np.arange(n)).astype(np.float32)


def onehot_to_labels(onehot: np.ndarray) -> np.ndarray:
    return onehot.argmax(axis=-1)


# --- plotting ------------------------------------------------------------


def plot_as_image(img: np.ndarray, variable_name: str = "", path=None):
    """Figure showing an image. Spec: how-to notebooks' plot_as_image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.imshow(np.clip(img, 0, 1))
    ax.set_title(variable_name)
    ax.axis("off")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_mask(
    img: np.ndarray,
    mask: np.ndarray,
    color=(1.0, 0.5, 0.0),
    alpha: float = 0.4,
    lined_contours: bool = True,
    variable_name: str = "",
    path=None,
):
    """Overlay a binary mask on an image (filled + contour)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.imshow(np.clip(img, 0, 1))
    m = np.asarray(mask, bool)
    overlay = np.zeros(m.shape + (4,))
    overlay[m] = (*color, alpha)
    ax.imshow(overlay)
    if lined_contours:
        ax.contour(m.astype(float), levels=[0.5], colors=[color])
    ax.set_title(variable_name)
    ax.axis("off")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def save_result(
    out_dir: str,
    index: int,
    image: np.ndarray,
    seg_mask: np.ndarray,
    prior_mask: Optional[np.ndarray] = None,
    unaries: Optional[np.ndarray] = None,
) -> Dict[str, str]:
    """Persist masks (PNG) + overlay plots for one image.

    Spec: `run/functions.py:2490` save_result (tiffs+overlays -> PNGs).
    """
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    def save_mask(name, m):
        p = os.path.join(out_dir, f"{name}_{index}.png")
        Image.fromarray(
            (np.asarray(m, np.float32) * 255).astype(np.uint8)
        ).save(p)
        paths[name] = p

    save_mask("mask", seg_mask)
    if prior_mask is not None:
        save_mask("prior_mask", prior_mask)
    if unaries is not None:
        save_mask("unaries", unaries)
    p = os.path.join(out_dir, f"overlay_{index}.png")
    plot_mask(image, seg_mask, path=p)
    paths["overlay"] = p
    return paths


def write_gif(
    frames: Sequence[np.ndarray], path: str, duration_ms: int = 100
) -> str:
    """Animated GIF from (H, W, 3) float frames.

    Spec: `awesome/util/gif_writer_images.py:10`.
    """
    from PIL import Image

    imgs = [
        Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8))
        for f in frames
    ]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:], duration=duration_ms,
        loop=0,
    )
    return path
