"""RawBoost waveform augmentation, fully on-device in JAX.

Re-derivation of the three RawBoost primitives (reference: RawBoost.py;
dispatch table at data_utils_SSL.py:141-203):

1. LnL convolutive noise — sum over signal powers x^(i+1), each passed
   through a random multi-band FIR notch filter
2. ISD impulsive signal-dependent noise — random sample subset gets
   multiplicative perturbation
3. SSI stationary colored additive noise — notch-filtered white noise at
   a random SNR

and the composed algorithms 1-8 (series / parallel combinations).

TPU design: the reference runs these per-example on dataloader-worker CPUs
with scipy (`firwin`/`lfilter`/`freqz`) and unseeded numpy RNG — the
augmentation was the reason for num_workers=8.  Here everything is
expressed with static shapes so one jit covers the whole batch via vmap:

- ``firwin`` band-stop design is computed masked in a fixed
  ``max_taps`` buffer (filter length is a traced integer)
- filter cascades are fixed-size ``jnp.convolve`` truncations
- ``freqz`` peak-gain normalization is an FFT (512 points over [0, pi),
  exactly scipy's default grid)
- group-delay trimming is a dynamic_slice at the traced half-length
- the ISD random subset uses rank-of-uniform masking (exact
  sampling-without-replacement semantics)
- randomness is keyed per (example, epoch) jax.random keys — deterministic
  and resumable, unlike the reference (SURVEY.md §7 hard part 6)

Numerical parity: deterministic sub-parts (firwin taps, cascade, freqz
normalization, group-delay trim) match scipy to float tolerance
(tests/test_rawboost.py); the composed ops are equivalence-tested
statistically since RNG draw order differs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sls_tpu.config import RawBoostConfig


def _sinc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sinc(x)  # normalized sinc, matches np.sinc used by scipy


def firwin_bandstop(
    num_taps: jnp.ndarray, f1: jnp.ndarray, f2: jnp.ndarray, fs: float,
    max_taps: int,
) -> jnp.ndarray:
    """Hamming-windowed band-stop FIR design (scipy.signal.firwin with
    cutoff [f1, f2], pass_zero=True), in a fixed ``max_taps`` buffer.

    num_taps is a traced ODD integer <= max_taps; taps beyond it are zero.
    """
    n = jnp.arange(max_taps, dtype=jnp.float32)
    valid = n < num_taps
    m = n - (num_taps - 1) / 2.0  # symmetric time index

    f1n = 2.0 * f1 / fs  # normalized to Nyquist=1
    f2n = 2.0 * f2 / fs

    # passbands [0, f1n] and [f2n, 1]:  h = f1n sinc(f1n m) + sinc(m) - f2n sinc(f2n m)
    h = f1n * _sinc(f1n * m) + _sinc(m) - f2n * _sinc(f2n * m)

    # Hamming window over the valid support
    win = 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * n / (num_taps - 1))
    h = jnp.where(valid, h * win, 0.0)

    # pass_zero scaling: unit DC response
    return h / jnp.sum(h)


def _convolve_trunc(a: jnp.ndarray, b: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Full convolution truncated to ``out_len`` (supports are known to
    fit, so truncation is exact)."""
    return jnp.convolve(a, b)[:out_len]


def _freqz_peak(b: jnp.ndarray) -> jnp.ndarray:
    """max |H(w)| over scipy.signal.freqz's default 512-point grid
    w_k = pi k / 512, computed as a 2x-padded rFFT."""
    n_fft = 2 * 512
    spec = jnp.fft.fft(b, n=max(n_fft, 2 * b.shape[0]))
    # grid matches freqz exactly only when len(b) <= 512; cascades here
    # are bounded by construction (max_total <= 512)
    return jnp.max(jnp.abs(spec[:512]))


def gen_notch_coeffs(
    key: jax.Array, cfg: RawBoostConfig, fs: float,
    max_taps: int, max_total: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cascade of nBands random band-stop filters with random gain
    (reference: RawBoost.py:22-42).  Returns (taps buffer [max_total],
    traced cascade length)."""
    b = jnp.zeros(max_total, jnp.float32).at[0].set(1.0)
    length = jnp.asarray(1, jnp.int32)

    keys = jax.random.split(key, cfg.nBands * 3 + 1)
    for i in range(cfg.nBands):
        k_fc, k_bw, k_c = keys[3 * i], keys[3 * i + 1], keys[3 * i + 2]
        fc = jax.random.uniform(k_fc, (), minval=float(cfg.minF), maxval=float(cfg.maxF))
        bw = jax.random.uniform(k_bw, (), minval=float(cfg.minBW), maxval=float(cfg.maxBW))
        c = jnp.floor(
            jax.random.uniform(
                k_c, (), minval=float(cfg.minCoeff), maxval=float(cfg.maxCoeff)
            )
        ).astype(jnp.int32)
        c = jnp.where(c % 2 == 0, c + 1, c)  # force odd

        f1 = jnp.maximum(fc - bw / 2.0, 1.0 / 1000.0)
        f2 = jnp.minimum(fc + bw / 2.0, fs / 2.0 - 1.0 / 1000.0)

        taps = firwin_bandstop(c, f1, f2, fs, max_taps)
        b = _convolve_trunc(taps, b, max_total)
        length = length + c - 1

    gain_db = jax.random.uniform(
        keys[-1], (), minval=float(cfg.minG), maxval=float(cfg.maxG)
    )
    b = (10.0 ** (gain_db / 20.0)) * b / _freqz_peak(b)
    return b, length


def filter_fir(x: jnp.ndarray, b: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase-ish FIR application with group-delay trim
    (reference: RawBoost.py:45-50): y = conv(x, b) shifted by (L+1)//2."""
    full = jnp.convolve(x, b)  # [S + max_total - 1]
    start = (length + 1) // 2
    return jax.lax.dynamic_slice(full, (start,), (x.shape[0],))


def norm_wav(x: jnp.ndarray, always: bool) -> jnp.ndarray:
    """Peak normalization (reference: RawBoost.py:14-19): always, or only
    when the peak exceeds 1."""
    peak = jnp.max(jnp.abs(x))
    if always:
        return x / peak
    return jnp.where(peak > 1.0, x / peak, x)


def _filter_sizes(cfg: RawBoostConfig) -> Tuple[int, int]:
    max_taps = cfg.maxCoeff + 2  # odd-adjust can add 1
    max_total = cfg.nBands * (max_taps - 1) + 1
    if max_total > 512:
        raise ValueError(
            "filter cascade exceeds the 512-tap freqz grid; reduce "
            "nBands*maxCoeff"
        )
    return max_taps, max_total


def lnl_convolutive_noise(
    key: jax.Array, x: jnp.ndarray, cfg: RawBoostConfig, fs: float = 16000.0
) -> jnp.ndarray:
    """Algorithm 1 (reference: RawBoost.py:53-63): notch-filtered power
    series with a linearity-bias gain drop for terms i >= 1."""
    max_taps, max_total = _filter_sizes(cfg)
    keys = jax.random.split(key, cfg.N_f)
    y = jnp.zeros_like(x)
    for i in range(cfg.N_f):
        if i >= 1:
            band_cfg = dataclasses_replace_gain(
                cfg, cfg.minG - cfg.minBiasLinNonLin, cfg.maxG - cfg.maxBiasLinNonLin
            )
        else:
            band_cfg = cfg
        b, length = gen_notch_coeffs(keys[i], band_cfg, fs, max_taps, max_total)
        y = y + filter_fir(jnp.power(x, i + 1), b, length)
    y = y - jnp.mean(y)
    return norm_wav(y, always=False)


def dataclasses_replace_gain(cfg: RawBoostConfig, min_g: int, max_g: int):
    import dataclasses

    return dataclasses.replace(cfg, minG=min_g, maxG=max_g)


def isd_additive_noise(
    key: jax.Array, x: jnp.ndarray, cfg: RawBoostConfig
) -> jnp.ndarray:
    """Algorithm 2 (reference: RawBoost.py:67-78): multiplicative impulse
    noise on a uniformly-random sample subset of size len*U(0,P)/100."""
    k_beta, k_perm, k_u1, k_u2 = jax.random.split(key, 4)
    s = x.shape[0]
    beta = jax.random.uniform(k_beta, (), minval=0.0, maxval=float(cfg.P))
    n = (s * beta / 100.0).astype(jnp.int32)

    # rank-of-uniform: exact uniform subset without replacement
    z = jax.random.uniform(k_perm, (s,))
    rank = jnp.argsort(jnp.argsort(z))
    mask = (rank < n).astype(x.dtype)

    u1 = jax.random.uniform(k_u1, (s,))
    u2 = jax.random.uniform(k_u2, (s,))
    f_r = (2.0 * u1 - 1.0) * (2.0 * u2 - 1.0)
    y = x + mask * (float(cfg.g_sd) * x * f_r)
    return norm_wav(y, always=False)


def ssi_additive_noise(
    key: jax.Array, x: jnp.ndarray, cfg: RawBoostConfig, fs: float = 16000.0
) -> jnp.ndarray:
    """Algorithm 3 (reference: RawBoost.py:83-91): colored (notch-filtered)
    Gaussian noise added at SNR ~ U(SNRmin, SNRmax) dB."""
    max_taps, max_total = _filter_sizes(cfg)
    k_noise, k_coeff, k_snr = jax.random.split(key, 3)
    noise = jax.random.normal(k_noise, x.shape)
    b, length = gen_notch_coeffs(k_coeff, cfg, fs, max_taps, max_total)
    noise = filter_fir(noise, b, length)
    noise = norm_wav(noise, always=True)
    snr = jax.random.uniform(
        k_snr, (), minval=float(cfg.SNRmin), maxval=float(cfg.SNRmax)
    )
    noise = (
        noise
        / jnp.linalg.norm(noise)
        * jnp.linalg.norm(x)
        / (10.0 ** (0.05 * snr))
    )
    return x + noise


def apply_rawboost(
    key: jax.Array, x: jnp.ndarray, cfg: RawBoostConfig, fs: float = 16000.0
) -> jnp.ndarray:
    """Dispatch the composed algorithm for one waveform
    (reference: data_utils_SSL.py:141-203)."""
    algo = cfg.algo
    if algo == 1:
        return lnl_convolutive_noise(key, x, cfg, fs)
    if algo == 2:
        return isd_additive_noise(key, x, cfg)
    if algo == 3:
        return ssi_additive_noise(key, x, cfg, fs)
    k1, k2, k3 = jax.random.split(key, 3)
    if algo == 4:  # 1+2+3 series
        y = lnl_convolutive_noise(k1, x, cfg, fs)
        y = isd_additive_noise(k2, y, cfg)
        return ssi_additive_noise(k3, y, cfg, fs)
    if algo == 5:  # 1+2 series
        y = lnl_convolutive_noise(k1, x, cfg, fs)
        return isd_additive_noise(k2, y, cfg)
    if algo == 6:  # 1+3 series
        y = lnl_convolutive_noise(k1, x, cfg, fs)
        return ssi_additive_noise(k2, y, cfg, fs)
    if algo == 7:  # 2+3 series
        y = isd_additive_noise(k1, x, cfg)
        return ssi_additive_noise(k2, y, cfg, fs)
    if algo == 8:  # 1 || 2 parallel
        y = lnl_convolutive_noise(k1, x, cfg, fs) + isd_additive_noise(k2, x, cfg)
        return norm_wav(y, always=False)
    return x  # algo 0 / other: no augmentation


@functools.partial(jax.jit, static_argnames=("cfg", "fs"))
def rawboost_batch(
    key: jax.Array, wavs: jnp.ndarray, cfg: RawBoostConfig, fs: float = 16000.0
) -> jnp.ndarray:
    """Vectorized augmentation: one key per example, whole batch in one
    compiled program.  wavs: [B, S] -> [B, S]."""
    keys = jax.random.split(key, wavs.shape[0])
    return jax.vmap(lambda k, w: apply_rawboost(k, w, cfg, fs))(keys, wavs)
