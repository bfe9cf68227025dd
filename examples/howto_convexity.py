#!/usr/bin/env python
"""How-To: Convexity — the sequential-fit (post-processing) demo.

Script equivalent of the reference's executable documentation
(`notebooks/how_to/convexity.ipynb`): take a rough thresholding of an
image, then fit a *provably convex* segmentation to it with an
input-convex coordinate network. Occlusions get filled in because the
representable masks are exactly the convex ones.

Defaults to the reference's own shipped how-to image
(`notebooks/how_to/data/cocktail-tomatoes.jpg`, the photo the notebook's
cells 2-11 run on) when present, else a synthetic occluded-tomato scene;
pass --image for any other photo. Writes overlay PNGs next to the
script.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


REFERENCE_IMG = "/root/reference/notebooks/how_to/data/cocktail-tomatoes.jpg"


def load_or_make_image(path, down_scale=2):
    if path is None and os.path.exists(REFERENCE_IMG):
        # the reference's own shipped how-to image (convexity.ipynb cell 2);
        # the red-direction threshold below is the notebook's cell 5 and
        # targets exactly this photo's tomato.
        path = REFERENCE_IMG
    if path:
        from PIL import Image

        img = Image.open(path)
        w, h = img.size
        img = img.resize((w // down_scale, h // down_scale))
        return (np.asarray(img, np.float64) / 255.0)[..., :3].astype(
            np.float32
        )
    # synthetic "tomato behind a leaf": red disk, green occluding stripe
    h = w = 96
    rng = np.random.default_rng(7)
    img = rng.uniform(0.05, 0.25, (h, w, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    disk = ((yy - 48) ** 2 + (xx - 48) ** 2) <= 30**2
    img[disk] = (0.85, 0.15, 0.1)
    leaf = (np.abs((yy - 48) * 0.5 + (xx - 48) - 15) < 7) & disk
    img[leaf] = (0.1, 0.5, 0.12)
    return np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1).astype(
        np.float32
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", type=str, default=None)
    p.add_argument("--epochs", type=int, default=2000)
    p.add_argument("--out", type=str, default="howto_convexity_out")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from awesome_tpu.core import grids as G
    from awesome_tpu.fit import FitConfig, fit_prior
    from awesome_tpu.nn.icnn import ConvexNextNet
    from awesome_tpu.runner.functions import plot_mask

    img = load_or_make_image(args.image)
    h, w = img.shape[:2]

    # 1. a rough initial segmentation: color thresholding (reference cell 5)
    likelihood = img[..., 0] - img[..., 1] - img[..., 2] - 0.5
    likelihood = 1.0 / (1.0 + np.exp(-(1 - likelihood)))
    likelihood = (likelihood - likelihood.min()) / max(
        likelihood.max() - likelihood.min(), 1e-9
    )
    unaries = (likelihood < 0.5).astype(np.float32)  # fg = 0 convention

    # 2. the convexity prior: an ICNN queried on the coordinate grid
    points = G.flatten_grid(G.pixel_grid((h, w)))
    target = jnp.asarray(1.0 - unaries).reshape(-1, 1)
    model = ConvexNextNet(n_hidden=130, n_hidden_layers=1)
    params = model.init(jax.random.PRNGKey(0))

    # 3. fit — one compiled program (reference cell 9's Python loop)
    cfg = FitConfig(num_steps=args.epochs, lr=2e-3, optimizer="adam",
                    fg_weight=0.4, plateau_patience=10**6)
    fitted, aux = fit_prior(model, params, points, target, cfg)
    print(f"loss {float(aux['loss_hist'][0]):.4f} -> "
          f"{float(aux['loss_hist'][-1]):.5f}")

    # 4. voila — a provably convex mask (query at any resolution)
    prob = jax.nn.sigmoid(model.apply(fitted, points)).reshape(h, w)
    mask = np.asarray(prob) < 0.5
    os.makedirs(args.out, exist_ok=True)
    plot_mask(img, 1 - unaries, variable_name="rough thresholding",
              path=os.path.join(args.out, "input_mask.png"))
    plot_mask(img, mask, variable_name="convex prior output",
              path=os.path.join(args.out, "convex_mask.png"))
    print(f"wrote {args.out}/input_mask.png and convex_mask.png")


if __name__ == "__main__":
    main()
