"""Native C++ batch loader: build, decode parity vs the python WAV path."""
import numpy as np
import pytest

from audiolm_pytorch_tpu.data import native_loader
from audiolm_pytorch_tpu.utils.audio_io import load_audio, save_audio


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    folder = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([1600, 3200, 800]):
        wav = rng.uniform(-0.8, 0.8, n).astype(np.float32)
        p = folder / f"f{i}.wav"
        save_audio(p, wav, 16000)
        paths.append(p)
    # stereo file
    st = rng.uniform(-0.5, 0.5, (2, 1200)).astype(np.float32)
    p = folder / "stereo.wav"
    save_audio(p, st, 22050)
    paths.append(p)
    return paths


def test_native_builds():
    assert native_loader.native_available(), "g++ build of audioload.cpp failed"


def test_probe(wav_files):
    length, rate, ch = native_loader.probe(wav_files[0])
    assert (length, rate, ch) == (1600, 16000, 1)
    length, rate, ch = native_loader.probe(wav_files[3])
    assert (length, rate, ch) == (1200, 22050, 2)


def test_load_batch_matches_python_decoder(wav_files):
    out, lengths, rates = native_loader.load_batch(wav_files, 2000, seed=1)
    assert out.shape == (4, 2000)
    assert list(rates) == [16000, 16000, 16000, 22050]
    # short files are zero-padded and match the python decoder exactly
    ref, sr = load_audio(wav_files[0])
    np.testing.assert_allclose(out[0, :1600], ref.mean(0), atol=2e-4)
    assert np.all(out[0, 1600:] == 0) and lengths[0] == 1600
    # long file is cropped to max_length
    assert lengths[1] == 2000
    # stereo downmix parity
    ref3, _ = load_audio(wav_files[3])
    np.testing.assert_allclose(out[3, :1200], ref3.mean(0), atol=2e-4)


def test_load_batch_deterministic_crops(wav_files):
    a, _, _ = native_loader.load_batch(wav_files, 1000, seed=7)
    b, _, _ = native_loader.load_batch(wav_files, 1000, seed=7)
    np.testing.assert_array_equal(a, b)
    c, _, _ = native_loader.load_batch(wav_files, 1000, seed=8)
    assert not np.array_equal(a[1], c[1])  # different crop of the long file
