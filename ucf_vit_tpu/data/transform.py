"""Adaptive patching transforms (host-side, CPU — the right placement for
TPU too: trees are data-dependent control flow, the serialized output is
shape-static and feeds the device).

Capability parity with reference `src/UCF_VIT/dataloaders/transform.py`:
- Patchify (2D): random Gaussian smoothing factor from {0,1,3,5} and random
  Canny low threshold in [50,100) (high = low+50) — a data augmentation;
  smoothing factor 0 -> uniform-random edge map. FixedQuadTree over the
  edges, serialize to [C?, L, p^2] + sizes + centers.
- Patchify3D: per-slice Sobel + Canny combined into a thresholded edge
  volume (including the reference's channel-max combination rules),
  FixedOctTree, serialize to [C?, L, p^3].

RNG is an explicit np.random.Generator (reference uses the global `random`
module), so pipelines are seedable per-rank.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    import cv2 as cv
except ImportError:  # pragma: no cover
    cv = None

from ucf_vit_tpu.data.octree import FixedOctTree
from ucf_vit_tpu.data.quadtree import FixedQuadTree


class Patchify:
    """2D edge-driven quadtree patchify. Input img: [H, W, C]."""

    def __init__(
        self,
        sths: Sequence[int] = (0, 1, 3, 5),
        fixed_length: int = 196,
        cannys: Sequence[int] = (50, 100),
        patch_size: int = 16,
        num_channels: int = 3,
        dataset: str = "imagenet",
        return_edges: bool = False,
        rng: Optional[np.random.Generator] = None,
    ) -> None:
        self.sths = list(sths)
        self.fixed_length = fixed_length
        self.cannys = list(range(cannys[0], cannys[1]))
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.dataset = dataset
        self.return_edges = return_edges
        self.rng = rng or np.random.default_rng()

    def __call__(self, img: np.ndarray):
        smooth = int(self.rng.choice(self.sths))
        c = int(self.rng.choice(self.cannys))
        natural = self.dataset in ("imagenet", "catsdogs")
        if smooth == 0:
            lo, hi = (0.0, 1.0) if natural else (float(np.min(img)), float(np.max(img)))
            edges = self.rng.uniform(low=lo, high=hi, size=(img.shape[0], img.shape[1]))
        else:
            grey = cv.GaussianBlur(img, (smooth, smooth), 0)
            if natural:
                edges = cv.Canny(grey.astype(np.uint8), c, c + 50)
            else:
                edges = cv.Canny((grey * 255).astype(np.uint8), c, c + 50)

        qdt = FixedQuadTree(domain=edges, fixed_length=self.fixed_length)
        seq_img, seq_size, seq_pos = qdt.serialize(
            img, size=(self.patch_size, self.patch_size, self.num_channels)
        )
        seq_size = np.asarray(seq_size)
        seq_img = np.asarray(seq_img, dtype=np.float32)
        if self.num_channels > 1:
            # [L, p, p, C] -> [C, L, p*p]
            seq_img = np.moveaxis(seq_img, -1, 0).reshape(
                self.num_channels, -1, self.patch_size * self.patch_size
            )
        else:
            seq_img = seq_img.reshape(-1, self.patch_size * self.patch_size)
        seq_pos = np.asarray(seq_pos)
        if self.return_edges:
            return seq_img, seq_size, seq_pos, qdt, edges
        return seq_img, seq_size, seq_pos, qdt


class Patchify3D:
    """3D edge-driven octree patchify. Input img: [D, H, W, C]."""

    def __init__(
        self,
        sths: Sequence[int] = (0, 1, 3, 5),
        fixed_length: int = 196,
        cannys: Sequence[int] = (50, 100),
        patch_size: int = 16,
        num_channels: int = 3,
        dataset: str = "basic_ct",
        return_edges: bool = False,
        rng: Optional[np.random.Generator] = None,
    ) -> None:
        self.sths = list(sths)
        self.fixed_length = fixed_length
        self.cannys = list(range(cannys[0], cannys[1]))
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.dataset = dataset
        self.return_edges = return_edges
        self.rng = rng or np.random.default_rng()

    def _edge_volume(self, img: np.ndarray, smooth: int, canny_lo: int):
        """Per-slice Sobel + Canny combination. Parity:
        `transform.py:70-116` including the cross-channel max rules."""
        from scipy.ndimage import gaussian_filter

        grey = None
        if smooth > 0 and img.dtype == np.float32:
            try:  # native separable gaussian, scipy-bit-exact (~7x faster)
                from ucf_vit_tpu.native import gaussian3d_native

                grey = gaussian3d_native(img, float(smooth))
            except Exception:
                grey = None
        if grey is None:
            grey = gaussian_filter(img, sigma=(smooth, smooth, smooth, 0))
        nslices = grey.shape[0]
        edges_combined = np.zeros(grey.shape[:3], dtype=bool)
        edges_counter = np.zeros(grey.shape[:3], dtype=np.uint8)
        slice_sobel = []  # (sobelx, sobely) per slice; arctan2 deferred
        grey_u8 = (grey * 255).astype(np.uint8)  # Canny input, whole volume

        for i in range(nslices):
            sobelx = sobely = g_mag = None
            for j in range(self.num_channels):
                sx = cv.Sobel(grey[i, :, :, j], cv.CV_64F, 1, 0, ksize=5)
                sy = cv.Sobel(grey[i, :, :, j], cv.CV_64F, 0, 1, ksize=5)
                if j == 0:
                    sobelx, sobely = sx, sy
                    if self.num_channels > 1:  # g_mag only feeds the j>0
                        g_mag = np.sqrt(sx**2 + sy**2)  # channel-max rule
                else:
                    if np.mean(np.sqrt(sx**2 + sy**2)) > np.mean(g_mag):
                        sobelx = sx
                    if np.mean(sy) > np.mean(sobely):
                        sobely = sy
            slice_sobel.append((sobelx, sobely))

            canny_edges = None
            for j in range(self.num_channels):
                canny = cv.Canny(
                    np.ascontiguousarray(grey_u8[i, :, :, j]),
                    canny_lo, canny_lo + 50,
                )
                canny_edges = canny if j == 0 else canny_edges + canny
                edges_counter[i] += (canny > 0).astype(np.uint8)
            edges_combined[i] = canny_edges > 0

        # arctan2 only where an edge was detected (identical result: edge_dir
        # is zero off-edges either way; the full-volume grad_dir the reference
        # materializes is read only through this mask — dtype matches grey so
        # the float32 cast happens at the same single point as before)
        edge_dir = np.zeros(grey.shape[:3], dtype=grey.dtype)
        for i in range(nslices):
            m = edges_combined[i]
            if m.any():
                sobelx, sobely = slice_sobel[i]
                edge_dir[i][m] = np.arctan2(sobely[m], sobelx[m])
        rng_span = edge_dir.max() - edge_dir.min()
        if rng_span == 0:
            normalized = np.zeros_like(edge_dir)
        else:
            normalized = (edge_dir - edge_dir.min()) / rng_span
        norm_factor = int(255 / self.num_channels)
        binary = (normalized > 0.5).astype(np.uint8) * (edges_counter * norm_factor)
        return binary, norm_factor

    def __call__(self, img: np.ndarray):
        smooth = int(self.rng.choice(self.sths))
        c = int(self.rng.choice(self.cannys))
        edges, norm_factor = self._edge_volume(img, smooth, c)

        octree = FixedOctTree(
            domain=edges, fixed_length=self.fixed_length, norm_factor=norm_factor
        )
        p = self.patch_size
        seq_img, seq_size, seq_pos = octree.serialize(
            img, size=(p, p, p, self.num_channels)
        )
        seq_size = np.asarray(seq_size)
        seq_img = np.asarray(seq_img, dtype=np.float32)
        if self.num_channels > 1:
            seq_img = np.moveaxis(seq_img, -1, 0).reshape(
                self.num_channels, -1, p * p * p
            )
        else:
            seq_img = seq_img.reshape(-1, p * p * p)
        seq_pos = np.asarray(seq_pos)
        if self.return_edges:
            return seq_img, seq_size, seq_pos, octree, edges
        return seq_img, seq_size, seq_pos, octree


# Reference-name alias (`transform.py:57` class Patchify_3D)
Patchify_3D = Patchify3D
