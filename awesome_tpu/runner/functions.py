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


# --- figure-save decorator -------------------------------------------------


def saveable(fn):
    """Decorate a figure-producing function with ``path=`` / ``show=``
    kwargs that save/close the figure.

    Spec: `awesome/util/matplotlib.py` ``saveable()`` (the reference wraps
    every plot helper with it so handles can route figures to run dirs).
    """
    import functools

    @functools.wraps(fn)
    def wrapper(*args, path: Optional[str] = None, show: bool = False,
                **kwargs):
        fig = fn(*args, **kwargs)
        if fig is None:
            return None
        if path is not None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            fig.savefig(path, bbox_inches="tight")
        if not show:
            import matplotlib.pyplot as plt

            plt.close(fig)
        return fig

    return wrapper


# --- SAM-mask utilities ----------------------------------------------------
# Spec: `awesome/run/functions.py:1050-1120` — utilities over
# segment-anything outputs (lists of boolean masks + scores). The model
# itself is an external dependency; these are the pure array transforms.


def sam_masks_to_label_mask(
    masks: Sequence[np.ndarray],
    scores: Optional[Sequence[float]] = None,
    base_value: int = 0,
) -> np.ndarray:
    """Paint a stack of (possibly overlapping) boolean masks into one
    integer label map: bigger masks first so smaller (higher-detail) masks
    overwrite them; ids follow the (score-sorted) paint order."""
    if not len(masks):
        raise ValueError("need at least one mask")
    order = list(range(len(masks)))
    if scores is not None:
        order.sort(key=lambda i: -float(scores[i]))
    order.sort(key=lambda i: -int(np.asarray(masks[i]).sum()))
    label = np.full(np.asarray(masks[0]).shape, base_value, np.int32)
    for new_id, i in enumerate(order, start=1):
        label[np.asarray(masks[i], bool)] = new_id
    return label


def filter_sam_masks(
    masks: Sequence[np.ndarray],
    scores: Sequence[float],
    min_score: float = 0.8,
    min_area: int = 0,
    max_area: Optional[int] = None,
) -> Tuple[List[np.ndarray], List[float]]:
    """Quality/area filtering of SAM mask proposals."""
    out_m, out_s = [], []
    for m, s in zip(masks, scores):
        area = int(np.asarray(m).sum())
        if s < min_score or area < min_area:
            continue
        if max_area is not None and area > max_area:
            continue
        out_m.append(np.asarray(m, bool))
        out_s.append(float(s))
    return out_m, out_s


# --- 3D space-time plots ----------------------------------------------------


@saveable
def plot_space_time_tube(
    volume_fg: np.ndarray,
    max_points: int = 20000,
    elev: float = 20.0,
    azim: float = -60.0,
):
    """Scatter the foreground voxels of a (T, H, W) space-time mask — the
    'temporal connectedness tube' figure.

    Spec: `awesome/run/functions.py:2197...` 3D space-time tube plots (the
    reference draws the spatio-temporal prior's level set over frames).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    vol = np.asarray(volume_fg, bool)
    t, y, x = np.nonzero(vol)
    if len(t) > max_points:
        sel = np.linspace(0, len(t) - 1, max_points).astype(int)
        t, y, x = t[sel], y[sel], x[sel]
    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(x, t, y, s=1, c=t, cmap="viridis", alpha=0.5)
    ax.set_xlabel("x")
    ax.set_ylabel("t (frame)")
    ax.set_zlabel("y")
    ax.view_init(elev=elev, azim=azim)
    return fig
