"""mp3 / webm decode through the FFmpeg-backed native library (VERDICT r2
next-step 8; reference globs + decodes these via torchaudio's FFmpeg wrapping,
reference data.py:49-52, 72). Fixtures are generated hermetically with the
same library's encode helper (lame mp3 / opus webm)."""
from pathlib import Path

import numpy as np
import pytest

from audiolm_pytorch_tpu.data import native_loader
from audiolm_pytorch_tpu.utils.audio_io import load_audio, save_audio

pytestmark = pytest.mark.skipif(not native_loader.ff_available(),
                                reason="FFmpeg dev libraries not available")

SR = 16000


def tone(sr=SR, seconds=1.0, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def dominant_freq(x, sr):
    n = min(len(x), 8192)
    seg = x[len(x) // 4: len(x) // 4 + n]
    f = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    return np.argmax(f) * sr / len(seg)


def test_mp3_roundtrip(tmp_path):
    x = tone()
    native_loader.ff_encode(tmp_path / "tone.mp3", x, SR)
    wav, rate = load_audio(tmp_path / "tone.mp3")
    assert rate == SR and wav.shape[0] == 1
    assert abs(wav.shape[1] - len(x)) < 4000  # encoder delay/padding
    assert abs(dominant_freq(wav[0], rate) - 440.0) < 5.0
    assert 0.2 < np.abs(wav).max() < 1.0


def test_webm_opus_roundtrip(tmp_path):
    sr = 48000  # opus operates at 48 kHz
    x = tone(sr=sr, freq=440.0)
    native_loader.ff_encode(tmp_path / "tone.webm", x, sr)
    wav, rate = load_audio(tmp_path / "tone.webm")
    assert rate == sr
    assert abs(dominant_freq(wav[0], rate) - 440.0) < 5.0


def test_real_world_mp3_if_present():
    """Decode a Layer III file we did not encode ourselves (not a lame
    self-roundtrip)."""
    p = Path("/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3")
    if not p.exists():
        pytest.skip("no third-party mp3 on this machine")
    wav, rate = load_audio(p)
    assert rate > 8000 and wav.shape[1] > rate  # >1 s of audio
    assert np.abs(wav).max() > 0.1


def test_dataset_globs_and_trains_over_mixed_formats(tmp_path):
    """A folder of wav+flac+mp3+webm must glob by default and train
    (reference: data.py:49-52)."""
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import jax
    from flac_writer import write_flac
    from audiolm_pytorch_tpu import SoundStreamTrainer
    from audiolm_pytorch_tpu.data.dataset import SoundDataset
    from test_soundstream import tiny_soundstream

    folder = tmp_path / "mixed"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        w = (0.4 * np.sin(2 * np.pi * rng.uniform(200, 600)
                          * np.arange(2048) / SR)).astype(np.float32)
        save_audio(folder / f"a{i}.wav", w, SR)
        ints = np.clip(np.round(w * 32767), -32768, 32767).astype(np.int64)
        write_flac(folder / f"b{i}.flac", ints, SR, subframe="fixed",
                   blocksize=1024)
        native_loader.ff_encode(folder / f"c{i}.mp3", w, SR)
        native_loader.ff_encode(folder / f"d{i}.webm",
                                np.repeat(w, 3), SR * 3)  # 48k for opus

    ds = SoundDataset(folder, target_sample_hz=SR, max_length=1024)
    assert len(ds) == 8  # all four formats globbed
    suffixes = {Path(f).suffix for f in ds.files}
    assert suffixes == {".wav", ".flac", ".mp3", ".webm"}

    trainer = SoundStreamTrainer(
        tiny_soundstream(), dataset=ds, batch_size=4, grad_accum_every=1,
        num_train_steps=1, save_results_every=100, save_model_every=100,
        results_folder=str(tmp_path / "results"), warmup_steps=1,
        apply_grad_penalty_every=100, data_parallel=False)
    logs = trainer.train_step()
    assert np.isfinite(logs["loss"]) and np.isfinite(logs["discr_loss"])
