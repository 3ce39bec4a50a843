"""CLI surface tests (the reference's inference tooling contract:
utils/vocoder/inference.py — generated wavs, --vc sweep, GT copies next to
generations, --debug serial path, -n limit)."""

import json

import numpy as np
import pytest

import jax

from parrot_tts_tpu.core.checkpoint import CheckpointManager, save_config_json
from parrot_tts_tpu.core.config import (VocoderModelConfig, to_json,
                                        vocoder_config_from_json)
from parrot_tts_tpu.data.audio_io import write_wav
from parrot_tts_tpu.data.manifest import write_manifest
from parrot_tts_tpu.models.vocoder import generator as gen


def tiny_vcfg(n_spk=2):
    return VocoderModelConfig(
        resblock="1", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_embeddings=20,
        embedding_dim=8, model_in_dim=16, multispkr="_", num_speakers=n_spk)


def test_vocoder_config_json_roundtrip():
    cfg = tiny_vcfg()
    assert vocoder_config_from_json(to_json(cfg)) == cfg


@pytest.fixture
def vocoder_run(tmp_path, rng):
    """A checkpointed tiny vocoder + a 3-utterance manifest with real GT
    wavs on disk."""
    cfg = tiny_vcfg()
    params = gen.init_code_generator(jax.random.key(0), cfg)
    ckpt_dir = tmp_path / "run" / "ckpt"
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(1, {"gen_params": jax.device_get(params)}, wait=True)
    # hand the CLI the exact topology via the saved config.json
    save_config_json(ckpt_dir, to_json(cfg))

    hop = cfg.total_upsample
    entries = []
    for spk in ("en_f", "en_m"):
        for i in range(2 if spk == "en_f" else 1):
            n_codes = int(rng.integers(12, 30))
            wav = (rng.standard_normal(n_codes * hop) * 0.1).astype(np.float32)
            wav_path = tmp_path / "wavs" / f"{spk}_utt{i}.wav"
            write_wav(wav_path, wav, 16_000)
            entries.append({
                "audio": str(wav_path),
                "hubert": " ".join(map(str, rng.integers(
                    0, cfg.num_embeddings, size=n_codes))),
                "duration": str(n_codes * hop / 16_000),
            })
    manifest = tmp_path / "hubert.txt"
    write_manifest(manifest, entries)
    return ckpt_dir, manifest, entries


def test_synthesize_cli_gt_copy_and_limit(vocoder_run, tmp_path, capsys):
    from parrot_tts_tpu.cli import main

    ckpt_dir, manifest, entries = vocoder_run
    out_dir = tmp_path / "gen"
    main(["synthesize", "--manifest", str(manifest),
          "--ckpt-dir", str(ckpt_dir), "--out-dir", str(out_dir),
          "--copy-gt", "-n", "2"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["wavs"] == 2 and stats["gt"] == 2
    gen_wavs = sorted(out_dir.glob("*_gen.wav"))
    gt_wavs = sorted(out_dir.glob("*_gt.wav"))
    assert len(gen_wavs) == 2 and len(gt_wavs) == 2
    # GT copies are peak-normalized (reference inference.py:174)
    from parrot_tts_tpu.data.audio_io import read_wav

    data, sr = read_wav(gt_wavs[0])
    assert sr == 16_000
    peak = np.abs(data.astype(np.float32) / 32768.0).max()
    assert 0.95 <= peak <= 1.0


def test_synthesize_cli_quant_int8(vocoder_run, tmp_path, capsys):
    """--quant int8 serving path end-to-end through the CLI: produces wavs
    close to the float path (int8 error bounded by the dynamic scales)."""
    from parrot_tts_tpu.cli import main
    from parrot_tts_tpu.data.audio_io import read_wav

    ckpt_dir, manifest, entries = vocoder_run
    out_f = tmp_path / "gen_f32"
    out_q = tmp_path / "gen_int8"
    main(["synthesize", "--manifest", str(manifest),
          "--ckpt-dir", str(ckpt_dir), "--out-dir", str(out_f)])
    main(["synthesize", "--manifest", str(manifest),
          "--ckpt-dir", str(ckpt_dir), "--out-dir", str(out_q),
          "--quant", "int8"])
    capsys.readouterr()
    f_files = sorted(p.name for p in out_f.glob("*_gen.wav"))
    q_files = sorted(p.name for p in out_q.glob("*_gen.wav"))
    assert f_files == q_files and len(f_files) == len(entries)
    for name in f_files:
        wf, _ = read_wav(out_f / name)
        wq, _ = read_wav(out_q / name)
        wf = wf.astype(np.float32) / 32768.0
        wq = wq.astype(np.float32) / 32768.0
        snr = 10 * np.log10(float((wf ** 2).mean())
                            / max(float(((wf - wq) ** 2).mean()), 1e-12))
        assert snr > 15.0, f"{name}: int8 CLI SNR {snr:.1f} dB"


def test_synthesize_cli_debug_serial_matches_batched(vocoder_run, tmp_path,
                                                     capsys):
    from parrot_tts_tpu.cli import main
    from parrot_tts_tpu.data.audio_io import read_wav

    ckpt_dir, manifest, entries = vocoder_run
    out_b = tmp_path / "gen_batched"
    out_d = tmp_path / "gen_debug"
    main(["synthesize", "--manifest", str(manifest),
          "--ckpt-dir", str(ckpt_dir), "--out-dir", str(out_b)])
    main(["synthesize", "--manifest", str(manifest),
          "--ckpt-dir", str(ckpt_dir), "--out-dir", str(out_d), "--debug"])
    capsys.readouterr()
    b_files = sorted(p.name for p in out_b.glob("*_gen.wav"))
    d_files = sorted(p.name for p in out_d.glob("*_gen.wav"))
    assert b_files == d_files and len(b_files) == len(entries)
    for name in b_files:
        wb, _ = read_wav(out_b / name)
        wd, _ = read_wav(out_d / name)
        np.testing.assert_allclose(wb, wd, atol=2)  # int16 LSBs


def test_synthesize_cli_f0_conditioned(tmp_path, rng, capsys):
    """An f0=True checkpoint synthesizes from the CLI: tracks are extracted
    from each manifest utterance's source audio (reference CodeDataset
    resynthesis semantics) and ride the --vc sweep per speaker."""
    import dataclasses

    from parrot_tts_tpu.cli import main

    cfg = dataclasses.replace(tiny_vcfg(), model_in_dim=17, f0=True)
    params = gen.init_code_generator(jax.random.key(0), cfg)
    ckpt_dir = tmp_path / "run" / "ckpt"
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(1, {"gen_params": jax.device_get(params)}, wait=True)
    save_config_json(ckpt_dir, to_json(cfg))

    hop = cfg.total_upsample
    entries = []
    t = np.arange(40 * hop) / 16_000
    for i, (spk, f) in enumerate((("en_f", 180.0), ("en_m", 120.0))):
        n_codes = 20 + 10 * i
        wav = (0.5 * np.sin(2 * np.pi * f * t[: n_codes * hop])
               ).astype(np.float32)
        wav_path = tmp_path / "wavs" / f"{spk}_utt{i}.wav"
        write_wav(wav_path, wav, 16_000)
        entries.append({
            "audio": str(wav_path),
            "hubert": " ".join(map(str, rng.integers(
                0, cfg.num_embeddings, size=n_codes))),
        })
    manifest = tmp_path / "hubert.txt"
    write_manifest(manifest, entries)

    out_dir = tmp_path / "gen"
    main(["synthesize", "--manifest", str(manifest),
          "--ckpt-dir", str(ckpt_dir), "--out-dir", str(out_dir), "--vc"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["wavs"] == 2 * cfg.num_speakers
    for p in out_dir.glob("*_gen.wav"):
        from parrot_tts_tpu.data.audio_io import read_wav

        data, sr = read_wav(p)
        assert data.size > 0 and np.isfinite(
            data.astype(np.float32)).all()
