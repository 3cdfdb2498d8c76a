"""Adaptive-patching visualization tool.

Capability parity with reference `utils/visualize_adaptive.py`: load an
image, run the edge-driven quadtree, render the leaf rectangles over the
image (+ the reconstructed deserialized image) to a PNG for human inspection.

Usage: python -m ucf_vit_tpu.tools.visualize_adaptive <image> <out.png>
           [--fixed-length 196] [--patch-size 16] [--tile-size 256]
"""

from __future__ import annotations

import argparse

import numpy as np


def visualize(image_path: str, out_path: str, fixed_length: int = 196,
              patch_size: int = 16, tile_size: int = 256):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.patches as mpatches
    import matplotlib.pyplot as plt
    import cv2 as cv
    from PIL import Image

    from ucf_vit_tpu.data.transform import Patchify

    img = np.array(Image.open(image_path).convert("RGB"))
    img = cv.resize(img, dsize=(tile_size, tile_size))

    patchify = Patchify(
        fixed_length=fixed_length, patch_size=patch_size, num_channels=3,
        dataset="imagenet", return_edges=True, rng=np.random.default_rng(0),
    )
    seq_img, seq_size, seq_pos, qdt, edges = patchify(img)

    recon = qdt.deserialize(
        np.moveaxis(seq_img, 0, 1).reshape(fixed_length, -1), patch_size, 3
    )

    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(img)
    for rect, _ in qdt.nodes:
        axes[0].add_patch(
            mpatches.Rectangle(
                (rect.x1, rect.y1), rect.x2 - rect.x1, rect.y2 - rect.y1,
                linewidth=0.5, edgecolor="w", facecolor="none",
            )
        )
    axes[0].set_title(f"quadtree ({qdt.count_patches()} leaves)")
    axes[1].imshow(edges, cmap="gray")
    axes[1].set_title("edge map")
    axes[2].imshow(np.clip(recon / 255.0, 0, 1))
    axes[2].set_title("serialize->deserialize round trip")
    for ax in axes:
        ax.axis("off")
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {out_path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("image")
    p.add_argument("out")
    p.add_argument("--fixed-length", type=int, default=196)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--tile-size", type=int, default=256)
    a = p.parse_args(argv)
    visualize(a.image, a.out, a.fixed_length, a.patch_size, a.tile_size)


if __name__ == "__main__":
    main()
