"""Pallas TPU kernel: fused MFCC/fbank frame chain.

Fuses the per-frame feature pipeline (reference: ``ExtractWindow`` +
``MfccComputer::Compute``, ``kaldi-master/src/feat/feature-window.cc:90-185``
and ``feature-mfcc.cc:28-66``) into ONE kernel per frame tile:

    remove-DC -> raw energy -> preemphasis -> povey window ->
    real DFT (two MXU matmuls against cos/sin tables) -> power spectrum ->
    mel filterbank (MXU) -> log -> DCT (MXU) -> lifter

so the windowed frames, the 512-point spectrum, and the power/mel
intermediates never round-trip through HBM.  The FFT is expressed as a dense
``[WS_pad, NB]`` DFT matmul — at window sizes 256/512 the MXU does this
faster than any radix kernel could, and it is exact.

Framing (the strided wave gather) and optional dithering stay outside the
kernel: dithering outside keeps bit-parity with the ``jax.random.normal``
reference path, and frames are the kernel's input stream anyway.

The kernel emits ``[T, 128]`` tiles: cepstra in columns ``0..num_ceps-1``,
the raw log-energy in column ``num_ceps``.  The thin wrapper applies
``use_energy`` / ``htk_compat`` assembly (a [T, 13]-sized shuffle) in XLA.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MfccOptions
from .features import (FLT_EPS, dct_matrix, extract_frames, feature_window,
                       lifter_coeffs, mel_bank_matrix)

TILE_F = 128  # frames per grid cell
OUT_W = 128  # output tile width (ceps + energy column, padded)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dft_tables(ws_pad: int, num_fft_bins: int):
    """Real-DFT cos/sin matrices [ws_pad, num_fft_bins] (bins 0..N/2-1)."""
    n = np.arange(ws_pad)[:, None]
    k = np.arange(num_fft_bins)[None, :]
    ang = -2.0 * math.pi * n * k / ws_pad
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _mfcc_kernel(frames_ref, win_ref, cos_ref, mel_ref, dct_ref,
                 lift_ref, out_ref, *, ws, remove_dc, preemph, raw_energy,
                 mel_floor, num_ceps, fbank_only, fbank_cols):
    f = frames_ref[:].astype(jnp.float32)  # [TILE_F, WS_pad]
    wsp = f.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
    mask = (col < ws).astype(jnp.float32)
    if remove_dc:
        mean = jnp.sum(f * mask, axis=1, keepdims=True) * (1.0 / ws)
        f = (f - mean) * mask
    energy = jnp.log(
        jnp.maximum(jnp.sum(f * f * mask, axis=1, keepdims=True), FLT_EPS))
    if preemph != 0.0:
        shifted = pltpu.roll(f, 1, 1)
        f = f - preemph * jnp.where(col == 0, f, shifted)
    f = f * win_ref[0, :][None, :]  # window is 0 on pad cols
    if not raw_energy:
        energy = jnp.log(
            jnp.maximum(jnp.sum(f * f, axis=1, keepdims=True), FLT_EPS))
    # ONE [ws_pad, 2*NB] matmul against cos||sin (two half-width matmuls
    # leave the MXU under-fed at NB=256)
    cs = jnp.dot(f, cos_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    nb_fft = cs.shape[1] // 2
    re, im = cs[:, :nb_fft], cs[:, nb_fft:]
    power = re * re + im * im  # [TILE_F, NB_fft]
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    logmel = jnp.log(jnp.maximum(mel, mel_floor))
    ocol = jax.lax.broadcasted_iota(jnp.int32, (f.shape[0], OUT_W), 1)
    if fbank_only:
        out = jnp.where(ocol < fbank_cols, logmel[:, :OUT_W], 0.0)
        out_ref[:] = jnp.where(ocol == fbank_cols, energy, out)
    else:
        ceps = jnp.dot(logmel, dct_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
        ceps = ceps * lift_ref[0, :][None, :]
        out = jnp.where(ocol < num_ceps, ceps[:, :OUT_W], 0.0)
        out_ref[:] = jnp.where(ocol == num_ceps, energy, out)


class MfccPallas:
    """Fused-kernel MFCC extractor with the same options/tables as
    ``features.MfccExtractor`` (``fbank=True`` gives log-mel fbank rows)."""

    def __init__(self, opts: MfccOptions = MfccOptions(), fbank: bool = False,
                 interpret: bool = False, tile_f: int = TILE_F):
        fo = opts.frame_opts
        self.opts = opts
        self.fbank = fbank
        self.interpret = interpret
        self.tile_f = tile_f
        nb = opts.mel_opts.num_bins
        if not fbank and opts.num_ceps + 1 > OUT_W:
            raise ValueError("num_ceps too large for the fused kernel")
        if fbank and nb + 1 > OUT_W:
            raise ValueError("num_bins too large for the fused kernel")
        ws = fo.window_size
        padded = fo.padded_window_size
        self.ws = ws
        self.ws_pad = max(_round_up(ws, 128), padded)
        nfft = padded // 2
        cos_t, sin_t = _dft_tables(padded, nfft)
        if self.ws_pad > padded:
            raise ValueError("window_size > padded_window_size unsupported")
        win = np.zeros(self.ws_pad, np.float32)
        win[:ws] = feature_window(fo)
        self.window = jnp.asarray(win.reshape(1, -1))
        # cos||sin side by side: ONE MXU matmul per tile computes both parts
        self.cos_t = jnp.asarray(np.concatenate([cos_t, sin_t], axis=1))
        nb_pad = _round_up(nb, 128)
        mel = mel_bank_matrix(nb, fo, opts.mel_opts.low_freq,
                              opts.mel_opts.high_freq).T  # [nfft, nb]
        self.mel_t = jnp.asarray(np.pad(mel, ((0, 0), (0, nb_pad - nb))))
        dct = dct_matrix(opts.num_ceps, nb).T  # [nb, nc]
        dct_p = np.zeros((nb_pad, OUT_W), np.float32)
        dct_p[:nb, : opts.num_ceps] = dct
        self.dct_t = jnp.asarray(dct_p)
        lift = np.zeros(OUT_W, np.float32)
        lift[: opts.num_ceps] = lifter_coeffs(opts.num_ceps,
                                              opts.cepstral_lifter)
        self.lift = jnp.asarray(lift.reshape(1, -1))
        self.num_fft_bins = nfft
        self.nb_pad = nb_pad

    @property
    def dim(self) -> int:
        if self.fbank:
            nb = self.opts.mel_opts.num_bins
            return nb + (1 if self.opts.use_energy else 0)
        return self.opts.num_ceps

    @functools.partial(jax.jit, static_argnums=(0,))
    def _run(self, frames):
        """[NF, ws_pad] fully-preprocessed-input frames -> [NF, OUT_W]."""
        opts = self.opts
        nf = frames.shape[0]
        nf_pad = _round_up(max(nf, 1), self.tile_f)
        frames = jnp.pad(frames, ((0, nf_pad - nf), (0, 0)))
        kern = functools.partial(
            _mfcc_kernel, ws=self.ws,
            remove_dc=opts.frame_opts.remove_dc_offset,
            preemph=opts.frame_opts.preemph_coeff,
            raw_energy=opts.raw_energy,
            mel_floor=1.0 if opts.mel_opts.htk_mode else FLT_EPS,
            num_ceps=opts.num_ceps, fbank_only=self.fbank,
            fbank_cols=opts.mel_opts.num_bins)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nf_pad, OUT_W), jnp.float32),
            grid=(nf_pad // self.tile_f,),
            in_specs=[
                pl.BlockSpec((self.tile_f, self.ws_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, self.ws_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.ws_pad, 2 * self.num_fft_bins),
                             lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((self.num_fft_bins, self.nb_pad),
                             lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((self.nb_pad, OUT_W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, OUT_W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((self.tile_f, OUT_W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * nf_pad * self.ws_pad * self.num_fft_bins * 2
                + 2 * nf_pad * self.num_fft_bins * self.nb_pad
                + 2 * nf_pad * self.nb_pad * OUT_W,
                bytes_accessed=4 * nf_pad * (self.ws_pad + OUT_W),
                transcendentals=nf_pad * (self.nb_pad + 1),
            ),
            interpret=self.interpret,
        )(frames, self.window, self.cos_t, self.mel_t,
          self.dct_t, self.lift)
        return out[:nf]

    def _assemble(self, out):
        """use_energy / htk_compat assembly on the [NF, OUT_W] kernel tiles."""
        opts = self.opts
        nc = self.opts.mel_opts.num_bins if self.fbank else opts.num_ceps
        feats = out[:, :nc]
        energy = out[:, nc]
        if opts.use_energy:
            if opts.energy_floor > 0.0:
                energy = jnp.maximum(energy, math.log(opts.energy_floor))
            if self.fbank:
                # fbank prepends energy (FbankExtractor: dim = num_bins + 1)
                feats = jnp.concatenate([energy[:, None], feats], axis=1)
            else:
                feats = jnp.concatenate([energy[:, None], feats[:, 1:]],
                                        axis=1)
        if opts.htk_compat and not self.fbank:
            first = feats[:, 0] * (1.0 if opts.use_energy else math.sqrt(2.0))
            feats = jnp.concatenate([feats[:, 1:], first[:, None]], axis=1)
        return feats

    def frames_to_feats(self, frames: jnp.ndarray,
                        dither_key: Optional[jax.Array] = None) -> jnp.ndarray:
        """``[NF, window_size] -> [NF, dim]``; dither applied outside the
        kernel (exact parity with the jnp path's ``jax.random.normal``)."""
        fo = self.opts.frame_opts
        if fo.dither != 0.0 and dither_key is not None:
            frames = frames + fo.dither * jax.random.normal(
                dither_key, frames.shape)
        frames = jnp.pad(frames, ((0, 0), (0, self.ws_pad - frames.shape[1])))
        return self._assemble(self._run(frames))

    def __call__(self, wave: np.ndarray,
                 dither_key: Optional[jax.Array] = None) -> np.ndarray:
        fo = self.opts.frame_opts
        nf = fo.num_frames(len(wave))
        if nf == 0:
            return np.zeros((0, self.dim), np.float32)
        frames = extract_frames(jnp.asarray(wave, jnp.float32), nf, fo)
        return np.asarray(self.frames_to_feats(frames, dither_key))

    def batched(self, waves: jnp.ndarray, num_samples: jnp.ndarray,
                max_frames: int, dither_keys: Optional[jax.Array] = None):
        """``[B, S], [B] -> ([B, max_frames, dim], [B])`` like
        ``MfccExtractor.batched`` — one fused kernel over all B*T frames."""
        fo = self.opts.frame_opts
        b = waves.shape[0]

        def frames_of(wave):
            return extract_frames(wave, max_frames, fo)

        frames = jax.vmap(frames_of)(waves)
        key = None
        if dither_keys is not None and fo.dither != 0.0:
            if dither_keys.ndim > 1:
                # per-utterance keys: fold each utterance's noise into its
                # own frame rows BEFORE flattening — bit-parity with the
                # XLA path's vmap-keyed dither (features.py).  Note the
                # keys themselves are derived per bucket position by the
                # caller (steps/make_feats.py), so bucket composition still
                # influences the noise; parity, not composition-invariance.
                frames = frames + fo.dither * jax.vmap(
                    lambda k, f: jax.random.normal(k, f.shape))(
                        dither_keys, frames)
            else:
                key = dither_keys
        frames = frames.reshape(b * max_frames, -1)
        feats = self.frames_to_feats(frames, key)
        feats = feats.reshape(b, max_frames, -1)
        counts = jnp.where(
            num_samples >= fo.window_size,
            1 + (num_samples - fo.window_size) // fo.window_shift, 0)
        return feats, counts
