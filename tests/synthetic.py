"""Synthetic analytic test imagery.

A band-limited sum of sinusoids can be evaluated at any real coordinate, so
warped "current" frames have exact ground truth with zero resampling error.
"""

import numpy as np


class Texture:
    """Smooth, corner-rich analytic texture: value(x, y) in [0, 255]."""

    def __init__(self, seed=0, n_waves=24, min_period=6.0, max_period=60.0):
        rng = np.random.default_rng(seed)
        periods = rng.uniform(min_period, max_period, size=n_waves)
        angles = rng.uniform(0, 2 * np.pi, size=n_waves)
        self.fx = np.cos(angles) / periods
        self.fy = np.sin(angles) / periods
        self.phase = rng.uniform(0, 2 * np.pi, size=n_waves)
        self.amp = rng.uniform(0.5, 1.0, size=n_waves)

    def eval(self, x, y):
        x = np.asarray(x, np.float64)[..., None]
        y = np.asarray(y, np.float64)[..., None]
        v = np.sum(self.amp * np.sin(
            2 * np.pi * (self.fx * x + self.fy * y) + self.phase), axis=-1)
        scale = np.sum(self.amp)
        return (v / scale * 0.5 + 0.5) * 255.0

    def render(self, h, w, warp=None):
        """Render [h, w] image; ``warp(x, y) -> (xs, ys)`` samples the
        texture at warped source coordinates."""
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        if warp is not None:
            xx, yy = warp(xx, yy)
        return self.eval(xx, yy).astype(np.float32)


def translated_pair(h=240, w=320, shift=(2.3, -1.7), seed=0):
    """(ref, cur) where cur is ref translated by ``shift`` (dx, dy):
    a feature at p in ref appears at p + shift in cur."""
    tex = Texture(seed)
    ref = tex.render(h, w)
    dx, dy = shift
    cur = tex.render(h, w, warp=lambda x, y: (x - dx, y - dy))
    return ref, cur


def se2_pair(h=240, w=320, theta=0.03, shift=(1.5, -0.8), seed=0):
    """(ref, cur, R, t) with cur(q) = ref(R^-1 (q - t)): a feature at p in
    ref appears at R p + t in cur. t keeps the image center displacement at
    ``shift``."""
    tex = Texture(seed)
    ref = tex.render(h, w)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    center = np.array([w / 2.0, h / 2.0])
    t = center + np.asarray(shift) - rot @ center
    rinv = rot.T

    def warp(x, y):
        xs = rinv[0, 0] * (x - t[0]) + rinv[0, 1] * (y - t[1])
        ys = rinv[1, 0] * (x - t[0]) + rinv[1, 1] * (y - t[1])
        return xs, ys

    cur = tex.render(h, w, warp=warp)
    return ref, cur, rot, t


def grid_features(h, w, margin=30, step=40):
    """Feature grid with slight subpixel offsets."""
    xs = np.arange(margin, w - margin, step, dtype=np.float64) + 0.37
    ys = np.arange(margin, h - margin, step, dtype=np.float64) + 0.61
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(
        np.float32)
