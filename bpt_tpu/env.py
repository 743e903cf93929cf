"""HDRI equirect environment: lookup, sun estimation, importance-sampling CDF.

References: Get_HDR_Color (equirect lat-long lookup,
/root/reference/js/HDRIEnvironmentPathTracing_FragmentShader.js:351-360) and
the host-side brightest-texel sun-direction scan in loadHDR
(/root/reference/js/HDRI_Environment_Path_Tracing.js:764-827).

The importance-sampling CDF is new relative to the reference (which only ever
NEEs toward its estimated sun); it exists for the BASELINE.json requirement
"HDRI environment importance sampling".
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

ONE_OVER_TWO_PI = 0.15915494309
ONE_OVER_PI = 0.31830988618379067


def get_hdr_color(hdr_image: jnp.ndarray, ray_dir: jnp.ndarray, exposure) -> jnp.ndarray:
    """Bilinear equirect lookup:
    uv = (atan(x, z)/2pi + 0.5, acos(-y)/pi), scaled by uHDRExposure.
    """
    h, w = hdr_image.shape[0], hdr_image.shape[1]
    u = jnp.arctan2(ray_dir[..., 0], ray_dir[..., 2]) * ONE_OVER_TWO_PI + 0.5
    v = jnp.arccos(jnp.clip(-ray_dir[..., 1], -1.0, 1.0)) * ONE_OVER_PI
    # GLSL texture() bilinear filtering with repeat-x / clamp-y.
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = hdr_image[y0i, x0i]
    c01 = hdr_image[y0i, x1i]
    c10 = hdr_image[y1i, x0i]
    c11 = hdr_image[y1i, x1i]
    color = (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy
    return color * exposure


def sun_direction_from_hdr(hdr_image: np.ndarray) -> np.ndarray:
    """Brightest-texel heuristic -> sun direction (host-side, numpy).

    Mirrors loadHDR's scan (HDRI_Environment_Path_Tracing.js:776-815):
    brightest (r+g+b) texel -> (u, v) -> spherical -> direction, with x and z
    negated for the LH coordinate system.
    """
    img = np.asarray(hdr_image)
    h, w = img.shape[0], img.shape[1]
    lum = img[..., :3].sum(axis=-1)
    idx = int(np.argmax(lum))
    ty, tx = divmod(idx, w)
    u = (tx + 0.5) / w
    v = (ty + 0.5) / h
    # Invert get_hdr_color's mapping: u = atan2(x, z)/2pi + 0.5, v = acos(-y)/pi,
    # so the returned direction points exactly at the brightest texel.
    theta = v * np.pi
    phi = (u - 0.5) * 2.0 * np.pi
    d = np.array(
        [np.sin(theta) * np.sin(phi), -np.cos(theta), np.sin(theta) * np.cos(phi)],
        np.float32,
    )
    return d / np.linalg.norm(d)


class EnvCDF(NamedTuple):
    """Row/column luminance CDFs for equirect importance sampling."""

    row_cdf: jnp.ndarray  # (H,)
    col_cdf: jnp.ndarray  # (H, W)
    pdf: jnp.ndarray  # (H, W) solid-angle pdf


def build_env_cdf(hdr_image: np.ndarray) -> EnvCDF:
    """Luminance x sin(theta) marginal/conditional CDFs (host-side)."""
    img = np.asarray(hdr_image, np.float64)
    h, w = img.shape[0], img.shape[1]
    lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    sin_theta = np.sin((np.arange(h) + 0.5) / h * np.pi)[:, None]
    weight = lum * sin_theta + 1e-12
    row_sum = weight.sum(axis=1)
    row_cdf = np.cumsum(row_sum) / row_sum.sum()
    col_cdf = np.cumsum(weight, axis=1) / weight.sum(axis=1, keepdims=True)
    # Solid-angle pdf: p(u,v) * (H*W) / (2 pi^2 sin theta)
    p_img = weight / weight.sum()
    pdf = p_img * (h * w) / (2.0 * np.pi * np.pi * np.maximum(sin_theta, 1e-9))
    return EnvCDF(
        row_cdf=jnp.asarray(row_cdf, jnp.float32),
        col_cdf=jnp.asarray(col_cdf, jnp.float32),
        pdf=jnp.asarray(pdf, jnp.float32),
    )


def sample_env_cdf(cdf: EnvCDF, u1, u2):
    """Inverse-CDF sample: (u1, u2) in [0,1)^2 -> (direction, pdf).

    Directions follow get_hdr_color's equirect convention so that
    get_hdr_color(img, dir) looks up (approximately) the sampled texel.
    """
    h = cdf.row_cdf.shape[0]
    w = cdf.col_cdf.shape[1]
    u1 = jnp.asarray(u1)
    u2 = jnp.asarray(u2)
    row = jnp.clip(jnp.searchsorted(cdf.row_cdf, u1), 0, h - 1)
    # Per-lane lower_bound over the row's conditional CDF via an explicit
    # binary search of single-texel gathers: materializing cdf.col_cdf[row]
    # would be a (lanes, W) array — ~8.6 GB for a 1024^2 frame against a
    # 2048-wide HDR.  ceil(log2 W) gathers of (lanes,) instead.
    lo = jnp.zeros(u2.shape, jnp.int32)
    hi = jnp.full(u2.shape, w, jnp.int32)
    n_steps = max(1, int(np.ceil(np.log2(max(w, 2)))))
    for _ in range(n_steps):
        mid = (lo + hi) // 2
        v = cdf.col_cdf[row, jnp.clip(mid, 0, w - 1)]
        go_hi = v < u2  # first index with cdf >= u2
        lo = jnp.where(go_hi, mid + 1, lo)
        hi = jnp.where(go_hi, hi, mid)
    col = jnp.clip(lo, 0, w - 1)
    v = (row.astype(jnp.float32) + 0.5) / h
    u = (col.astype(jnp.float32) + 0.5) / w
    theta = v * jnp.pi  # acos(-y)
    phi = (u - 0.5) * 2.0 * jnp.pi  # atan2(x, z)
    sin_t = jnp.sin(theta)
    direction = jnp.stack([sin_t * jnp.sin(phi), -jnp.cos(theta), sin_t * jnp.cos(phi)], axis=-1)
    pdf = cdf.pdf[row, col]
    return direction, pdf
