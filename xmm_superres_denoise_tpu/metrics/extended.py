"""Extended image-quality metrics (piq-equivalent), implemented in jnp.

The reference's extended metric suite wraps piq
(`/root/reference/xmm_superres_denoise/metrics/metrics.py:42-101`): GMSD,
MS-GMSD, HaarPSI, MDSI, FSIM, VIF-p, evaluated on single-channel [0,1]
images at test time (`xmm_metric_collection.py:41-61`). piq is not available
here; these are from-scratch implementations of the published algorithms with
piq's constants so scores are comparable.

Implemented: GMSD, MS-GMSD, HaarPSI, MDSI, VIF-p, and FSIM (phase
congruency via a precomputed log-Gabor filter bank + on-device FFTs).

All are per-image functions on NHWC batches returning (N,) scores, wired into
`collection.MetricBank` via `register_extended_metrics()`.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _conv2d_same(x: Array, kernels: np.ndarray | Array) -> Array:
    """Correlate NHWC single-channel x with a stack of 2-D kernels -> NHWK."""
    k = jnp.asarray(kernels, jnp.float32)  # (K, kh, kw)
    kh, kw = k.shape[-2], k.shape[-1]
    filt = k.transpose(1, 2, 0)[:, :, None, :]  # HWIO with I=1, O=K
    dn = jax.lax.conv_dimension_numbers(x.shape, filt.shape, ("NHWC", "HWIO", "NHWC"))
    # torch F.conv2d is cross-correlation; lax conv is too (no kernel flip).
    return jax.lax.conv_general_dilated(
        x,
        filt,
        (1, 1),
        [(kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2)],
        dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )


def _avg_pool2(x: Array) -> Array:
    """2x2/stride-2 average pool with piq's bottom/right zero pad for odd dims.

    H and W are padded INDEPENDENTLY (piq semantics): a mixed-parity input
    like (5, 4) pads only the odd dimension — padding both would break the
    reshape."""
    n, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        h, w = x.shape[1], x.shape[2]
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


_PREWITT = np.array(
    [[[-1.0, 0.0, 1.0], [-1.0, 0.0, 1.0], [-1.0, 0.0, 1.0]]], dtype=np.float32
) / 3.0
_PREWITT_XY = np.concatenate([_PREWITT, _PREWITT.transpose(0, 2, 1)], axis=0)


def _gradient_magnitude(x: Array, kernels: np.ndarray) -> Array:
    g = _conv2d_same(x, kernels)  # NHWK
    return jnp.sqrt(jnp.sum(jnp.square(g), axis=-1, keepdims=True) + 1e-12)


def _gmsd_score(x: Array, y: Array, t: float) -> Array:
    gx = _gradient_magnitude(x, _PREWITT_XY)
    gy = _gradient_magnitude(y, _PREWITT_XY)
    gms = (2.0 * gx * gy + t) / (jnp.square(gx) + jnp.square(gy) + t)
    mean = jnp.mean(gms.reshape(gms.shape[0], -1), axis=-1, keepdims=True)
    dev = jnp.mean(
        jnp.square(gms.reshape(gms.shape[0], -1) - mean), axis=-1
    )
    return jnp.sqrt(dev)


def gmsd_per_image(preds: Array, target: Array, data_range: float = 1.0) -> Array:
    """Gradient Magnitude Similarity Deviation (piq.gmsd semantics):
    [0,1] inputs, initial 2x2 average pool, Prewitt gradients,
    t = 170/255^2, population-std pooling."""
    x = _avg_pool2(preds / data_range)
    y = _avg_pool2(target / data_range)
    return _gmsd_score(x, y, t=170.0 / (255.0**2))


_MS_GMSD_WEIGHTS = np.array([0.096, 0.596, 0.289, 0.019], dtype=np.float32)


def ms_gmsd_per_image(preds: Array, target: Array, data_range: float = 1.0) -> Array:
    """Multi-Scale GMSD (piq.multi_scale_gmsd, chromatic=False): 255-scale,
    t=170, 4 scales pooled between, sqrt of weighted sum of squared scores."""
    x = preds / data_range * 255.0
    y = target / data_range * 255.0
    scores = []
    for scale in range(len(_MS_GMSD_WEIGHTS)):
        if scale > 0:
            x = _avg_pool2(x)
            y = _avg_pool2(y)
        scores.append(_gmsd_score(x, y, t=170.0))
    stack = jnp.stack(scores, axis=-1)  # (N, scales)
    return jnp.sqrt(jnp.sum(_MS_GMSD_WEIGHTS * jnp.square(stack), axis=-1))


# --------------------------------------------------------------------------- #
# HaarPSI (Reisenhofer et al. 2018), piq.haarpsi semantics, grayscale path.
# --------------------------------------------------------------------------- #


def _haar_filters(n_scales: int = 3):
    """2-D Haar wavelet filters g_j (horizontal) for scales j=1..n."""
    filters = []
    for j in range(1, n_scales + 1):
        size = 2**j
        f = np.zeros((size, size), dtype=np.float32)
        f[: size // 2, :] = -1.0
        f[size // 2 :, :] = 1.0
        f /= size**2
        filters.append(f)
    return filters


def haarpsi_per_image(
    preds: Array,
    target: Array,
    data_range: float = 1.0,
    c: float = 30.0,
    alpha: float = 4.2,
) -> Array:
    """Haar wavelet Perceptual Similarity Index (grayscale).

    piq semantics: 255-scale, initial 2x2 average pool, 3 Haar scales; local
    similarity from scales 1-2, weights from scale-3 magnitude; logit/sigmoid
    pooling with alpha=4.2, c=30.
    """
    x = _avg_pool2(preds / data_range * 255.0)
    y = _avg_pool2(target / data_range * 255.0)

    filters = _haar_filters(3)
    # horizontal & vertical responses per scale
    def responses(img):
        out = []
        for f in filters:
            h = _conv2d_same(img, f[None])  # horizontal
            v = _conv2d_same(img, f.T[None])
            out.append((jnp.abs(h), jnp.abs(v)))
        return out

    rx = responses(x)
    ry = responses(y)

    sims = []
    weights = []
    for ori in range(2):  # horizontal / vertical
        mag_x = [rx[s][ori] for s in range(3)]
        mag_y = [ry[s][ori] for s in range(3)]
        local_sim = sum(
            (2.0 * mag_x[s] * mag_y[s] + c) / (mag_x[s] ** 2 + mag_y[s] ** 2 + c)
            for s in range(2)
        ) / 2.0
        w = jnp.maximum(mag_x[2], mag_y[2])
        sims.append(local_sim)
        weights.append(w)

    sim = jnp.concatenate(sims, axis=-1)
    w = jnp.concatenate(weights, axis=-1)
    num = jnp.sum((jax.nn.sigmoid(alpha * sim)).reshape(sim.shape[0], -1) * w.reshape(w.shape[0], -1), axis=-1)
    den = jnp.sum(w.reshape(w.shape[0], -1), axis=-1)
    score = num / jnp.maximum(den, 1e-12)
    # inverse sigmoid + square (piq: (logit(.)/alpha)**2)
    return jnp.square(jnp.log(score / (1.0 - score)) / alpha)


# --------------------------------------------------------------------------- #
# MDSI (Nafchi et al. 2016), piq.mdsi semantics, grayscale path.
# --------------------------------------------------------------------------- #


def mdsi_per_image(
    preds: Array,
    target: Array,
    data_range: float = 1.0,
    c1: float = 140.0,
    c2: float = 55.0,
    c3: float = 550.0,
    alpha: float = 0.6,
    rho: float = 1.0,
    q: float = 0.25,
    o: float = 0.25,
) -> Array:
    """Mean Deviation Similarity Index (gradient + "chromaticity" terms).

    Grayscale inputs: the luminance path is exact; the chromaticity similarity
    degenerates to a constant for single-channel data (H/M channels equal), so
    the score is driven by gradient similarity — appropriate for X-ray images.
    piq combination: 'sum' scheme GS' = alpha*GS + (1-alpha)*CS, deviation
    pooling with q/o/rho exponents.
    """
    x = preds / data_range * 255.0
    y = target / data_range * 255.0

    # piq downsamples with avg pool by factor based on min side /256? piq mdsi:
    # kernel_size = max(1, round(min(h, w) / 256)); avg_pool if > 1.
    h, w = x.shape[1], x.shape[2]
    k = max(1, round(min(h, w) / 256))
    if k > 1:
        n = x.shape[0]
        hp = (h // k) * k
        wp = (w // k) * k
        x = x[:, :hp, :wp, :].reshape(n, hp // k, k, wp // k, k, 1).mean(axis=(2, 4))
        y = y[:, :hp, :wp, :].reshape(n, hp // k, k, wp // k, k, 1).mean(axis=(2, 4))

    gx = _gradient_magnitude(x, _PREWITT_XY)
    gy = _gradient_magnitude(y, _PREWITT_XY)
    gf = _gradient_magnitude((x + y) / 2.0, _PREWITT_XY)

    gs_xy = (2.0 * gx * gy + c1) / (jnp.square(gx) + jnp.square(gy) + c1)
    gs_xf = (2.0 * gx * gf + c2) / (jnp.square(gx) + jnp.square(gf) + c2)
    gs_yf = (2.0 * gy * gf + c2) / (jnp.square(gy) + jnp.square(gf) + c2)
    gs = gs_xy + gs_xf - gs_yf

    cs = jnp.ones_like(gs)  # single-channel: chromaticity similarity saturates

    gcs = alpha * gs + (1.0 - alpha) * cs
    flat = gcs.reshape(gcs.shape[0], -1)
    flat_q = jnp.power(jnp.abs(flat), q) * jnp.sign(flat)
    mean_q = jnp.mean(flat_q, axis=-1, keepdims=True)
    score = jnp.power(
        jnp.mean(jnp.power(jnp.abs(flat_q - mean_q), rho), axis=-1), o / rho
    )
    return score


# --------------------------------------------------------------------------- #
# VIF-p (pixel-domain Visual Information Fidelity), torchmetrics semantics.
# --------------------------------------------------------------------------- #


def vif_p_per_image(
    preds: Array, target: Array, sigma_n_sq: float = 2.0
) -> Array:
    """Pixel-domain VIF (torchmetrics VisualInformationFidelity semantics):
    4 scales, gaussian windows of size 2^(4-k+1)+1, sigma N/5, valid conv,
    2x downsampling between scales."""
    eps = 1e-10
    num = jnp.zeros((preds.shape[0],))
    den = jnp.zeros((preds.shape[0],))
    x, y = preds * 255.0, target * 255.0  # torchmetrics scales? (works on raw)
    for scale in range(1, 5):
        n = 2 ** (4 - scale + 1) + 1
        sd = n / 5.0
        half = n // 2
        g1 = np.exp(-((np.arange(n) - half) ** 2) / (2 * sd * sd))
        g = np.outer(g1, g1)
        g = (g / g.sum()).astype(np.float32)

        if scale > 1:
            # filter then downsample by 2 (valid)
            x = _conv2d_valid(x, g)[:, ::2, ::2, :]
            y = _conv2d_valid(y, g)[:, ::2, ::2, :]

        mu_x = _conv2d_valid(x, g)
        mu_y = _conv2d_valid(y, g)
        mu_x_sq, mu_y_sq, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
        sigma_x_sq = jnp.maximum(_conv2d_valid(x * x, g) - mu_x_sq, 0.0)
        sigma_y_sq = jnp.maximum(_conv2d_valid(y * y, g) - mu_y_sq, 0.0)
        sigma_xy = _conv2d_valid(x * y, g) - mu_xy

        gcoef = sigma_xy / (sigma_x_sq + eps)
        sv_sq = sigma_y_sq - gcoef * sigma_xy

        gcoef = jnp.where(sigma_x_sq < eps, 0.0, gcoef)
        sv_sq = jnp.where(sigma_x_sq < eps, sigma_y_sq, sv_sq)
        sigma_x_sq = jnp.where(sigma_x_sq < eps, 0.0, sigma_x_sq)
        gcoef = jnp.where(sigma_y_sq < eps, 0.0, gcoef)
        sv_sq = jnp.where(sigma_y_sq < eps, 0.0, sv_sq)
        sv_sq = jnp.where(gcoef < 0.0, sigma_y_sq, sv_sq)
        gcoef = jnp.maximum(gcoef, 0.0)
        sv_sq = jnp.maximum(sv_sq, eps)

        num_map = jnp.log2(1.0 + gcoef * gcoef * sigma_x_sq / (sv_sq + sigma_n_sq))
        den_map = jnp.log2(1.0 + sigma_x_sq / sigma_n_sq)
        num = num + jnp.sum(num_map.reshape(num_map.shape[0], -1), axis=-1)
        den = den + jnp.sum(den_map.reshape(den_map.shape[0], -1), axis=-1)
    return num / jnp.maximum(den, eps)


def _conv2d_valid(x: Array, kernel2d: np.ndarray | Array) -> Array:
    k = jnp.asarray(kernel2d, jnp.float32)
    filt = k[:, :, None, None]  # HWIO
    dn = jax.lax.conv_dimension_numbers(x.shape, filt.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, filt, (1, 1), "VALID", dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )


# --------------------------------------------------------------------------- #
# FSIM (Zhang et al. 2011): phase congruency + gradient similarity.
# --------------------------------------------------------------------------- #


@lru_cache(maxsize=None)
def _log_gabor_bank(
    h: int,
    w: int,
    scales: int = 4,
    orientations: int = 4,
    min_length: int = 6,
    mult: float = 2.0,
    sigma_f: float = 0.55,
    delta_theta: float = 1.2,
) -> np.ndarray:
    """Frequency-domain log-Gabor filters, shape (orients, scales, h, w).

    Kovesi's construction with piq.fsim's constants: radial log-Gabor at
    wavelengths min_length * mult^s with a 15th-order Butterworth lowpass at
    0.45, angular Gaussian of sigma pi/orientations/delta_theta.
    """
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    r = np.sqrt(fx**2 + fy**2)
    theta = np.arctan2(-fy, fx)
    r[0, 0] = 1.0  # avoid log(0); the DC entry is zeroed below

    lowpass = 1.0 / (1.0 + (r / 0.45) ** (2 * 15))
    radials = []
    for s in range(scales):
        wavelength = min_length * mult**s
        f0 = 1.0 / wavelength
        rad = np.exp(-(np.log(r / f0) ** 2) / (2 * np.log(sigma_f) ** 2))
        rad *= lowpass
        rad[0, 0] = 0.0
        radials.append(rad)

    sin_t, cos_t = np.sin(theta), np.cos(theta)
    theta_sigma = np.pi / orientations / delta_theta
    bank = np.empty((orientations, scales, h, w), np.float32)
    for o in range(orientations):
        angle = o * np.pi / orientations
        ds = sin_t * np.cos(angle) - cos_t * np.sin(angle)
        dc = cos_t * np.cos(angle) + sin_t * np.sin(angle)
        dtheta = np.abs(np.arctan2(ds, dc))
        spread = np.exp(-(dtheta**2) / (2 * theta_sigma**2))
        for s in range(scales):
            bank[o, s] = (radials[s] * spread).astype(np.float32)
    return bank


def _phase_congruency(
    x: Array,
    scales: int = 4,
    orientations: int = 4,
    min_length: int = 6,
    mult: float = 2.0,
    k: float = 2.0,
) -> Array:
    """Kovesi PC2 phase-congruency map for NHWC single-channel x -> (N,H,W)."""
    eps = 1e-8
    n, h, w, _ = x.shape
    bank = jnp.asarray(_log_gabor_bank(h, w, scales, orientations, min_length, mult))
    fx = jnp.fft.fft2(x[..., 0].astype(jnp.float32))  # (N, H, W)

    pc_sum = jnp.zeros((n, h, w))
    for o in range(orientations):
        eo = jnp.fft.ifft2(fx[:, None] * bank[o][None])  # (N, scales, H, W)
        even, odd = eo.real, eo.imag
        an = jnp.abs(eo)
        sum_e = jnp.sum(even, axis=1)
        sum_o = jnp.sum(odd, axis=1)
        sum_an = jnp.sum(an, axis=1)

        # Full Kovesi PC2 energy (piq semantics): project each scale onto
        # the mean phase and subtract the |A sin(phi - phibar)| deviation —
        # sqrt(sumE^2 + sumO^2) alone omits the deviation term and
        # overestimates congruency (verified against metrics/fsim_oracle.py).
        x_energy = jnp.sqrt(sum_e**2 + sum_o**2) + eps
        mean_e = sum_e / x_energy
        mean_o = sum_o / x_energy
        energy = jnp.sum(
            even * mean_e[:, None] + odd * mean_o[:, None]
            - jnp.abs(even * mean_o[:, None] - odd * mean_e[:, None]),
            axis=1,
        )

        # Rayleigh noise threshold from the smallest-scale response
        abs_eo0 = an[:, 0].reshape(n, -1)
        tau = jnp.median(abs_eo0, axis=-1) / jnp.sqrt(jnp.log(4.0))
        total_tau = tau * (1.0 - (1.0 / mult) ** scales) / (1.0 - 1.0 / mult)
        noise_mean = total_tau * jnp.sqrt(jnp.pi / 2.0)
        noise_sigma = total_tau * jnp.sqrt((4.0 - jnp.pi) / 2.0)
        T = (noise_mean + k * noise_sigma)[:, None, None]

        pc_sum = pc_sum + jnp.maximum(energy - T, 0.0) / (sum_an + eps)
    return pc_sum


_SCHARR = np.array(
    [[[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]]], np.float32
) / 16.0
_SCHARR_XY = np.concatenate([_SCHARR, _SCHARR.transpose(0, 2, 1)], axis=0)


def fsim_per_image(
    preds: Array,
    target: Array,
    data_range: float = 1.0,
    t1: float = 0.85,
    t2: float = 160.0,
) -> Array:
    """Feature Similarity Index (piq.fsim semantics, chromatic=False).

    255-scale, content-adaptive average-pool downsampling, phase-congruency
    similarity x Scharr-gradient similarity, PC-max weighted pooling.
    Identity inputs score exactly 1; absolute values may deviate slightly
    from piq's (different PC numerics), relative ordering is preserved.
    """
    x = preds / data_range * 255.0
    y = target / data_range * 255.0

    h, w = x.shape[1], x.shape[2]
    kk = max(1, round(min(h, w) / 256))
    if kk > 1:
        n = x.shape[0]
        hp, wp = (h // kk) * kk, (w // kk) * kk
        x = x[:, :hp, :wp, :].reshape(n, hp // kk, kk, wp // kk, kk, 1).mean(axis=(2, 4))
        y = y[:, :hp, :wp, :].reshape(n, hp // kk, kk, wp // kk, kk, 1).mean(axis=(2, 4))

    pc_x = _phase_congruency(x)
    pc_y = _phase_congruency(y)

    gx = _gradient_magnitude(x, _SCHARR_XY)[..., 0]
    gy = _gradient_magnitude(y, _SCHARR_XY)[..., 0]

    s_pc = (2.0 * pc_x * pc_y + t1) / (pc_x**2 + pc_y**2 + t1)
    s_g = (2.0 * gx * gy + t2) / (gx**2 + gy**2 + t2)
    s_l = s_pc * s_g
    pc_m = jnp.maximum(pc_x, pc_y)

    num = jnp.sum((s_l * pc_m).reshape(s_l.shape[0], -1), axis=-1)
    den = jnp.sum(pc_m.reshape(pc_m.shape[0], -1), axis=-1)
    return num / jnp.maximum(den, 1e-12)


# --------------------------------------------------------------------------- #
# Registration with the accumulating MetricBank
# --------------------------------------------------------------------------- #

EXT_METRIC_NAMES = ("vif_p", "fsim", "gmsd", "ms_gmsd", "haarpsi", "msdi")
# key "msdi" (sic) follows the reference's collection key (xmm_metric_collection.py:53).


def register_extended_metrics() -> None:
    """Add per-image extended metrics to collection.MetricBank's update table
    with the reference's batch-mean accumulation (metrics.py:42-101)."""
    from . import collection as _c

    def _make(fn):
        def upd(p: Array, t: Array, w: Array, axis_name=None):
            per_img = fn(p, t)
            # one GLOBAL batch-mean per update regardless of device count
            # (collection.batch_mean_delta handles the shard_map psums)
            return _c.batch_mean_delta(per_img, w, axis_name), jnp.sum(w)

        return upd

    _c._UPDATES.setdefault("fsim", _make(fsim_per_image))
    _c._UPDATES.setdefault("gmsd", _make(gmsd_per_image))
    _c._UPDATES.setdefault("ms_gmsd", _make(ms_gmsd_per_image))
    _c._UPDATES.setdefault("haarpsi", _make(haarpsi_per_image))
    _c._UPDATES.setdefault("msdi", _make(mdsi_per_image))
    _c._UPDATES.setdefault("vif_p", _make(vif_p_per_image))


register_extended_metrics()
