"""Ground-truth F0 precache.

The reference shells out to pyworld's C++ Harvest/DIO+StoneMask on a host
thread pool (train/dataprep/pitch_extractor.py:19-121).  TPU-native
re-design: a batched YIN pitch tracker in pure jnp — framing, FFT
autocorrelation, cumulative-mean-normalised difference, thresholded lag
pick with parabolic interpolation.  YIN frames are independent of their
file, so the whole dataset flattens into one (file, frame) stream that is
processed in FIXED-size device chunks: exactly ONE compiled shape
regardless of how many distinct audio lengths the corpus has, and every
chunk is a full [4096, frame_len] batch on the MXU.  Output format is
identical: one [frames] float32 array per segment in pitch.safetensors,
0 where unvoiced.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

F0_FLOOR = 50.0
F0_CEIL = 600.0
YIN_WINDOW = 1024          # integration window W
YIN_THRESHOLD = 0.15


def _yin_frame_pitch(frames: jax.Array, sample_rate: int) -> jax.Array:
    """frames [N, W + tau_max] -> f0 [N] (0 = unvoiced)."""
    tau_max = int(sample_rate / F0_FLOOR)
    tau_min = max(2, int(sample_rate / F0_CEIL))
    w = YIN_WINDOW
    x = frames.astype(jnp.float32)

    # difference function d(tau) = e(0) + e(tau) - 2 * sum_{j<W} x_j x_{j+tau}
    # cross-correlation restricted to the W-sample integration window:
    # corr(tau) = irfft(conj(FFT(x[:W])) * FFT(x))[tau]
    n_fft = 1
    while n_fft < x.shape[-1] * 2:
        n_fft *= 2
    head = jnp.where(
        jnp.arange(x.shape[-1])[None, :] < w, x, 0.0
    )
    spec_head = jnp.fft.rfft(head, n_fft)
    spec_full = jnp.fft.rfft(x, n_fft)
    corr = jnp.fft.irfft(jnp.conj(spec_head) * spec_full, n_fft)[
        ..., : tau_max + 1
    ]
    csum = jnp.cumsum(x * x, axis=-1)
    e0 = csum[..., w - 1]
    # e(tau) = sum_{j=tau}^{tau+w-1} x_j^2
    idx = jnp.arange(tau_max + 1)
    e_tau = (
        csum[..., idx + w - 1] - jnp.where(idx > 0, csum[..., idx - 1], 0.0)
    )
    d = e0[..., None] + e_tau - 2.0 * corr

    # cumulative mean normalised difference
    cum = jnp.cumsum(d[..., 1:], axis=-1)
    taus = jnp.arange(1, tau_max + 1, dtype=jnp.float32)
    cmnd = d[..., 1:] * taus / jnp.maximum(cum, 1e-9)
    cmnd = jnp.concatenate([jnp.ones_like(d[..., :1]), cmnd], axis=-1)

    # absolute-threshold pick: first tau in range with cmnd < threshold,
    # then descend to the following local minimum (YIN step 4); fall back
    # to the global argmin in range when nothing crosses the threshold
    in_range = (idx >= tau_min) & (idx <= tau_max)
    below = (cmnd < YIN_THRESHOLD) & in_range
    first_below = jnp.argmax(below, axis=-1)
    has_below = jnp.any(below, axis=-1)
    rising = jnp.concatenate(
        [
            cmnd[..., 1:] > cmnd[..., :-1],
            jnp.ones_like(cmnd[..., :1], bool),
        ],
        axis=-1,
    )
    stop = rising & (idx[None, :] >= first_below[..., None])
    local_min = jnp.argmax(stop, axis=-1)
    masked = jnp.where(in_range, cmnd, jnp.inf)
    tau_best = jnp.where(has_below, local_min, jnp.argmin(masked, axis=-1))

    # parabolic interpolation around tau_best
    def gather(c, t):
        return jnp.take_along_axis(c, t[..., None], axis=-1)[..., 0]

    t0 = jnp.clip(tau_best, tau_min + 1, tau_max - 1)
    cm1 = gather(cmnd, t0 - 1)
    c0 = gather(cmnd, t0)
    cp1 = gather(cmnd, t0 + 1)
    denom = cm1 + cp1 - 2.0 * c0
    delta = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (cm1 - cp1) / denom, 0.0
    )
    tau_ref = t0.astype(jnp.float32) + jnp.clip(delta, -1.0, 1.0)

    voiced = gather(cmnd, t0) < YIN_THRESHOLD * 2.0
    # energy gate: silence has a degenerate (all-zero) difference function
    voiced = voiced & (e0 > 1e-4)
    f0 = jnp.where(voiced, sample_rate / jnp.maximum(tau_ref, 1.0), 0.0)
    return jnp.where((f0 >= F0_FLOOR) & (f0 <= F0_CEIL), f0, 0.0)


def _stonemask_refine(
    frames: jax.Array, f0: jax.Array, sample_rate: int,
    harmonics: int = 3, delta: int = 64, iters: int = 2,
) -> jax.Array:
    """Instantaneous-frequency refinement of YIN candidates — the role of
    WORLD's StoneMask pass (reference
    train/dataprep/pitch_extractor.py:106-121, pyworld.stonemask).

    For each voiced frame and harmonic k: correlate two Hann-windowed
    signal windows Δ samples apart against e^{-i2πk f0 n/sr}; the phase
    increment of c2·conj(c1) unwrapped around k·f0 gives the harmonic's
    instantaneous frequency, and the refined f0 is the amplitude-weighted
    mean of IF_k/k, clipped to ±100 cents of the candidate.  Two
    iterations, all [N, L] elementwise VPU work.
    """
    L = 512  # ~3 periods at 140 Hz (WORLD window scale) tracks vibrato
    # center the two windows on the frame's hop point (frames are padded
    # by frame_len//2, so the hop point sits mid-frame)
    start = (frames.shape[1] - L - delta) // 2
    x1 = frames[:, start:start + L].astype(jnp.float32)
    x2 = frames[:, start + delta:start + delta + L].astype(jnp.float32)
    hann = 0.5 - 0.5 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(L) / (L - 1)
    )
    n = jnp.arange(L, dtype=jnp.float32)
    voiced = f0 > 0
    fc = jnp.where(voiced, f0, 100.0)  # dummy freq for unvoiced lanes

    def one_iter(fc):
        num = jnp.zeros_like(fc)
        den = jnp.zeros_like(fc)
        for k in range(1, harmonics + 1):
            phase = (2.0 * jnp.pi * k / sample_rate) * fc[:, None] * n[None]
            c = jnp.cos(phase) * hann
            s = jnp.sin(phase) * hann
            re1 = jnp.sum(x1 * c, axis=-1)
            im1 = -jnp.sum(x1 * s, axis=-1)
            re2 = jnp.sum(x2 * c, axis=-1)
            im2 = -jnp.sum(x2 * s, axis=-1)
            # angle(c2 * conj(c1)) = phase advance over Δ samples
            cross_re = re2 * re1 + im2 * im1
            cross_im = im2 * re1 - re2 * im1
            dphi = jnp.arctan2(cross_im, cross_re)
            # unwrap around the candidate harmonic k*fc
            expected = 2.0 * jnp.pi * k * fc * delta / sample_rate
            wrapped = jnp.mod(dphi - expected + jnp.pi, 2 * jnp.pi) - jnp.pi
            if_k = k * fc + wrapped * sample_rate / (2.0 * jnp.pi * delta)
            amp = jnp.sqrt(re1 * re1 + im1 * im1) + 1e-12
            num = num + amp * (if_k / k)
            den = den + amp
        ref = num / den
        # clip to ±100 cents of the incoming candidate
        lo, hi = fc * (2.0 ** (-100 / 1200)), fc * (2.0 ** (100 / 1200))
        return jnp.clip(ref, lo, hi)

    for _ in range(iters):
        fc = one_iter(fc)
    out = jnp.where(voiced, fc, 0.0)
    return jnp.where((out >= F0_FLOOR) & (out <= F0_CEIL), out, 0.0)


CHUNK_FRAMES = 4096  # fixed device batch -> exactly one compiled shape


def _file_frames(wave: np.ndarray, sample_rate: int, hop_length: int):
    """[T] audio -> [n_frames, frame_len] analysis windows on the hop grid
    (zero-copy strided view)."""
    tau_max = int(sample_rate / F0_FLOOR)
    frame_len = YIN_WINDOW + tau_max
    n_frames = wave.shape[0] // hop_length + 1
    pad = frame_len // 2
    padded = np.pad(wave, (pad, pad + frame_len))
    windows = np.lib.stride_tricks.sliding_window_view(padded, frame_len)
    return windows[: n_frames * hop_length : hop_length], n_frames


def _median3(f0: np.ndarray) -> np.ndarray:
    if f0.shape[0] >= 3:
        stacked = np.stack([f0[:-2], f0[1:-1], f0[2:]])
        f0 = f0.copy()
        f0[1:-1] = np.median(stacked, axis=0)
    return f0.astype(np.float32)


def extract_pitch_batch(
    waves, sample_rate: int, hop_length: int, refine: bool = True
) -> list:
    """List of [T] audio -> list of [T//hop + 1] f0 tracks.

    Flattens every file's frames into one stream and runs the YIN kernel
    in fixed CHUNK_FRAMES-size device batches (the last chunk zero-pads),
    so compile count is 1 and device batches stay full regardless of the
    corpus's length distribution."""
    per_file = [
        _file_frames(np.asarray(w, np.float32), sample_rate, hop_length)
        for w in waves
    ]
    counts = [n for _, n in per_file]
    total = sum(counts)
    if total == 0:
        return [np.zeros(0, np.float32) for _ in waves]
    frame_len = per_file[0][0].shape[1]
    out = np.empty(total, np.float32)
    stream_pos = 0
    buf = np.zeros((CHUNK_FRAMES, frame_len), np.float32)
    fill = 0
    for frames, n in per_file:
        taken = 0
        while taken < n:
            step = min(CHUNK_FRAMES - fill, n - taken)
            buf[fill : fill + step] = frames[taken : taken + step]
            fill += step
            taken += step
            if fill == CHUNK_FRAMES:
                out[stream_pos : stream_pos + fill] = np.asarray(
                    _yin_jit(jnp.asarray(buf), sample_rate, refine)
                )
                stream_pos += fill
                fill = 0
    if fill:
        buf[fill:] = 0.0
        out[stream_pos : stream_pos + fill] = np.asarray(
            _yin_jit(jnp.asarray(buf), sample_rate, refine)
        )[:fill]
    results = []
    pos = 0
    for n in counts:
        results.append(_median3(out[pos : pos + n]))
        pos += n
    return results


def extract_pitch(
    wave: np.ndarray, sample_rate: int, hop_length: int
) -> np.ndarray:
    """[T] audio -> [T//hop + 1] f0 (single-file wrapper)."""
    return extract_pitch_batch([wave], sample_rate, hop_length)[0]


_yin_cache = {}


def _yin_jit(frames, sample_rate, refine: bool = True):
    key = (frames.shape, sample_rate, refine)
    if key not in _yin_cache:
        if refine:
            _yin_cache[key] = jax.jit(
                lambda f: _stonemask_refine(
                    f, _yin_frame_pitch(f, sample_rate), sample_rate
                )
            )
        else:
            _yin_cache[key] = jax.jit(
                lambda f: _yin_frame_pitch(f, sample_rate)
            )
    return _yin_cache[key](frames)


def calculate_pitch(
    config, model_config, method: str = "yin",
    rmvpe_weights: str | None = None,
) -> None:
    """Precache F0 for train+val splits into pitch.safetensors
    (reference cli `stylish-train pitch`; methods 'yin' on-device or
    'rmvpe' with converted weights on disk)."""
    from safetensors.numpy import save_file

    from ..data.audio import read_wav
    from ..data.dataset import get_data_path_list

    rmvpe = None
    if method == "rmvpe":
        from ..ops.resample import resample as jresample
        from .rmvpe import RMVPEInference

        import jax.numpy as jnp

        rmvpe = RMVPEInference(rmvpe_weights)

    root = Path(config.dataset.path)
    wavdir = root / config.dataset.wav_path
    out: Dict[str, np.ndarray] = {}
    from concurrent.futures import ThreadPoolExecutor

    sr, hop = model_config.sample_rate, model_config.hop_length
    GROUP = 64  # files per device megabatch (bounds host RAM)
    with ThreadPoolExecutor(8) as pool:
        for split in (config.dataset.val_data, config.dataset.train_data):
            lines = get_data_path_list(root / split)
            names = [
                f[0]
                for f in (line.strip().split("|") for line in lines)
                if len(f) == 4
            ]
            done = 0
            for g in range(0, len(names), GROUP):
                group = names[g : g + GROUP]
                waves = list(
                    pool.map(lambda n: read_wav(wavdir / n, sr), group)
                )
                if rmvpe is not None:
                    for name, wave in zip(group, waves):
                        wave16 = np.asarray(
                            jresample(jnp.asarray(wave[None]), sr, 16000)
                        )[0]
                        f0 = rmvpe(wave16)
                        n_frames = wave.shape[0] // hop + 1
                        # linear-interp to the mel frame grid (reference
                        # pitch_extractor.py:140-145)
                        xp = np.linspace(0, 1, f0.shape[0])
                        xq = np.linspace(0, 1, n_frames)
                        out[name] = np.interp(xq, xp, f0).astype(np.float32)
                else:
                    for name, f0 in zip(
                        group, extract_pitch_batch(waves, sr, hop)
                    ):
                        out[name] = f0
                done += len(group)
                if done % 512 < GROUP:
                    logger.info("%s: %d/%d", split, done, len(names))
    save_file(out, str(root / config.dataset.pitch_path))
    logger.info("wrote %s (%d segments)", config.dataset.pitch_path, len(out))
