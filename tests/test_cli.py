"""CLI: info / tokenize / decode round trip on a saved tiny codec."""
import numpy as np

from audiolm_pytorch_tpu.cli import main as cli_main
from audiolm_pytorch_tpu.utils.audio_io import load_audio, save_audio
from tests.test_soundstream import tiny_soundstream


def test_cli_tokenize_decode_info(tmp_path, capsys):
    ss = tiny_soundstream()
    ckpt = tmp_path / "codec.npz"
    ss.save(ckpt)

    wav = 0.3 * np.sin(2 * np.pi * 330 * np.arange(1024) / 16000).astype(np.float32)
    wav_path = tmp_path / "in.wav"
    save_audio(wav_path, wav, 16000)

    cli_main(["info", str(ckpt)])
    out = capsys.readouterr().out
    assert "SoundStream" in out

    codes_path = tmp_path / "codes.npz"
    cli_main(["tokenize", "--codec", str(ckpt), "--audio", str(wav_path),
              "--output", str(codes_path)])
    assert codes_path.exists()

    out_path = tmp_path / "out.wav"
    cli_main(["decode", "--codec", str(ckpt), "--codes", str(codes_path),
              "--output", str(out_path)])
    decoded, sr = load_audio(out_path)
    assert sr == 16000 and decoded.shape[-1] == 1024
