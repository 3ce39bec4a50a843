"""Data layer: manifests, TTE bucketed loader, vocoder segment dataset,
adjust_duration parity, audio IO, reference config loaders."""

import json
from pathlib import Path

import numpy as np
import pytest

from parrot_tts_tpu.data import audio_io
from parrot_tts_tpu.data.manifest import (
    parse_manifest_line,
    parse_speaker,
    read_manifest,
    write_manifest,
)
from parrot_tts_tpu.pipeline.prepare_tte import adjust_duration

from tests import reference_oracle


def test_manifest_roundtrip(tmp_path):
    entries = [
        {"audio": "/data/en_f_utt1.wav", "hubert": "1 2 3",
         "duration": "1.5", "speaker": "en_f"},
        {"audio": "/data/hi_m_utt2.wav", "hubert": "7 8",
         "duration": "0.5", "speaker": "hi_m"},
    ]
    p = tmp_path / "m.txt"
    write_manifest(p, entries)
    assert read_manifest(p) == entries


def test_manifest_handles_apostrophes():
    # the reference's json quote-replace parse breaks on this; ours must not
    line = "{'audio': \"/data/o'brien_1.wav\", 'hubert': '1 2'}"
    d = parse_manifest_line(line)
    assert d["audio"] == "/data/o'brien_1.wav"


def test_parse_speaker():
    assert parse_speaker("/x/en_f_00001.wav", "_") == "en_f"
    assert parse_speaker("/x/whatever.wav", "single") == "A"


def test_adjust_duration_cases():
    assert adjust_duration(10, [5, 5]) == [5, 5]
    assert adjust_duration(12, [5, 5]) == [5, 7]          # diff=-2: grow last
    assert adjust_duration(9, [5, 5]) == [5, 4]           # diff=1: shrink last
    assert adjust_duration(8, [5, 5]) == [5, 3]           # diff=2: shrink last
    assert adjust_duration(8, [9, 1]) == [7, 1]           # last too small
    assert adjust_duration(2, [2, 2]) == [1, 1]           # split across both
    assert adjust_duration(5, [5, 5]) is None             # |diff| > 2
    assert adjust_duration(1, [1, 2]) is None             # diff=2 unsplittable


@pytest.mark.skipif(not reference_oracle.available(),
                    reason="reference mount not present")
def test_adjust_duration_matches_reference(rng):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_tte_pre", "/root/reference/utils/TTE/preprocessor.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    for _ in range(200):
        n = int(rng.integers(1, 6))
        durs = [int(x) for x in rng.integers(1, 6, size=n)]
        total = sum(durs) + int(rng.integers(-3, 4))
        want = ref.adjust_duration(total, list(durs))
        got = adjust_duration(total, list(durs))
        assert got == (list(want) if want is not None else None), \
            (total, durs)


def test_wav_roundtrip(tmp_path, rng):
    wav = np.clip((rng.standard_normal(1600) * 0.3), -1, 1).astype(np.float32)
    p = tmp_path / "a.wav"
    audio_io.write_wav(p, wav, 16000)
    data, sr = audio_io.read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(data / 32767.0, wav, atol=1e-4)
    assert abs(audio_io.duration_seconds(p) - 0.1) < 1e-6


def test_load_normalized_peak(tmp_path, rng):
    wav = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    p = tmp_path / "b.wav"
    audio_io.write_wav(p, wav, 16000)
    audio, sr = audio_io.load_normalized(p)
    assert abs(np.abs(audio).max() - 0.95) < 1e-3


def test_tte_bucketed_loader(tmp_path, rng):
    from parrot_tts_tpu.data.tte_data import BucketedLoader, TTEDataset
    from parrot_tts_tpu.text.tokenizer import save_symbols

    align = tmp_path / "aligner"
    align.mkdir()
    save_symbols(align / "symbols.json", [" ", "a", "b", "c"])
    root = tmp_path / "tte"
    root.mkdir()
    (root / "speakers.json").write_text(json.dumps({"en_f": 0, "en_m": 1}))
    entries = []
    for i in range(7):
        n_char = int(rng.integers(3, 10))
        chars = " ".join(rng.choice(["a", "b", "c", "sil"], size=n_char))
        durs = rng.integers(1, 4, size=n_char)
        total = int(durs.sum())
        entries.append({
            "audio": f"/x/en_f_{i:03d}.wav",
            "characters": chars,
            "hubert": " ".join(map(str, rng.integers(0, 20, size=total))),
            "duration": " ".join(map(str, durs)),
            "speaker": "en_f" if i % 2 else "en_m",
        })
    write_manifest(root / "train.txt", entries)

    ds = TTEDataset(root, align, "train", hubert_codes=20)
    loader = BucketedLoader(ds, batch_size=4, src_buckets=(8, 16),
                            tgt_buckets=(16, 32), drop_last=False)
    seen = 0
    for batch in loader.batches(0):
        b, s = batch["phones"].shape
        assert b == 4 and s in (8, 16)
        assert batch["codes"].shape[1] in (16, 32)
        # mask semantics: phones pad = pad_idx, codes pad = 20
        assert (batch["phones"][~batch["src_mask"]] == ds.src_pad_idx).all()
        assert (batch["codes"][~batch["tgt_mask"]] == 20).all()
        # durations sum == tgt_mask count per sample
        np.testing.assert_array_equal(batch["duration"].sum(1),
                                      batch["tgt_mask"].sum(1))
        seen += 1
    assert seen >= 2  # multiple buckets exercised

    # static-shape filler rows (repeats of sample 0) carry weight 0.0 so
    # partial batches don't double-count gradients; real rows carry 1.0
    any_partial = False
    for batch in loader.batches(0):
        w = batch["sample_weight"]
        assert w.shape == (4,) and w.dtype == np.float32
        n_real = int(w.sum())
        if n_real < 4:
            any_partial = True
            # filler rows are literal repeats of row 0
            for j in range(n_real, 4):
                np.testing.assert_array_equal(batch["phones"][j],
                                              batch["phones"][0])
                assert w[j] == 0.0
    assert any_partial  # 7 samples / batch 4 must produce a partial batch


def test_tte_loss_sample_weight_drops_filler(rng):
    """Weighted loss over a padded batch == loss over the unpadded batch."""
    import jax.numpy as jnp

    from parrot_tts_tpu.models.tte.loss import tte_loss

    b, s, t, v = 3, 6, 10, 12
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    log_dur = rng.standard_normal((b, s)).astype(np.float32)
    codes = rng.integers(0, v, size=(b, t)).astype(np.int32)
    codes[:, t - 2:] = v  # some pad
    durs = rng.integers(1, 5, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), bool)
    mask[:, s - 1] = False

    # padded batch: row 2 repeats row 0 with weight 0
    logits_p = np.concatenate([logits, logits[:1]], 0)
    log_dur_p = np.concatenate([log_dur, log_dur[:1]], 0)
    codes_p = np.concatenate([codes, codes[:1]], 0)
    durs_p = np.concatenate([durs, durs[:1]], 0)
    mask_p = np.concatenate([mask, mask[:1]], 0)
    w = np.asarray([1.0, 1.0, 1.0, 0.0], np.float32)

    want = tte_loss(jnp.asarray(logits), jnp.asarray(log_dur),
                    jnp.asarray(codes), jnp.asarray(durs),
                    jnp.asarray(mask), num_codes=v)
    got = tte_loss(jnp.asarray(logits_p), jnp.asarray(log_dur_p),
                   jnp.asarray(codes_p), jnp.asarray(durs_p),
                   jnp.asarray(mask_p), num_codes=v,
                   sample_weight=jnp.asarray(w))
    for a, c in zip(want, got):
        np.testing.assert_allclose(float(c), float(a), rtol=2e-6)


def test_vocoder_dataset_segment(tmp_path, rng):
    from parrot_tts_tpu.data.vocoder_data import VocoderDataset

    hop, seg = 16, 256
    entries = []
    for i, n in enumerate([2000, 100]):  # second is shorter than segment
        wav = (rng.standard_normal(n) * 0.3).astype(np.float32)
        p = tmp_path / f"en_f_{i:03d}.wav"
        audio_io.write_wav(p, wav, 16000)
        codes = rng.integers(0, 50, size=n // hop)
        entries.append({"audio": str(p),
                        "hubert": " ".join(map(str, codes))})
    write_manifest(tmp_path / "train.txt", entries)

    ds = VocoderDataset(tmp_path / "train.txt", segment_size=seg,
                        code_hop_size=hop, multispkr="_")
    g = np.random.default_rng(0)
    for i in range(2):
        item = ds.load_item(i, g)
        assert item["audio"].shape == (seg,)
        assert item["code"].shape == (seg // hop,)
        assert np.abs(item["audio"]).max() <= 0.95 + 1e-5


def test_vocoder_loader_global_batch_semantics(tmp_path, rng):
    """VocoderLoader takes the GLOBAL batch (BucketedLoader semantics): it
    rejects non-divisible process counts, and the per-host slices of each
    global batch tile it exactly."""
    from parrot_tts_tpu.data.vocoder_data import VocoderDataset, VocoderLoader

    hop, seg = 16, 256
    entries = []
    for i in range(8):
        wav = (rng.standard_normal(2000) * 0.3).astype(np.float32)
        p = tmp_path / f"en_f_{i:03d}.wav"
        audio_io.write_wav(p, wav, 16000)
        codes = rng.integers(0, 50, size=2000 // hop)
        entries.append({"audio": str(p),
                        "hubert": " ".join(map(str, codes))})
    write_manifest(tmp_path / "train.txt", entries)
    ds = VocoderDataset(tmp_path / "train.txt", segment_size=seg,
                        code_hop_size=hop, multispkr="_")

    with pytest.raises(ValueError, match="divisible"):
        VocoderLoader(ds, 4, process_count=3)

    whole = list(VocoderLoader(ds, 4, seed=5).batches(epoch=0))
    parts = [list(VocoderLoader(ds, 4, seed=5, process_index=pi,
                                process_count=2).batches(epoch=0))
             for pi in range(2)]
    assert len(whole) == 2 and all(len(p) == 2 for p in parts)
    for b, (p0, p1) in zip(whole, zip(*parts)):
        assert p0["audio"].shape == (2, seg) == p1["audio"].shape
        # hosts tile the identical global schedule (codes identify items;
        # crops differ per host RNG stream, so compare codes not audio)
        np.testing.assert_array_equal(
            np.concatenate([p0["spkr"], p1["spkr"]]), b["spkr"])
        assert (p0["filenames"] + p1["filenames"]) == b["filenames"]


@pytest.mark.skipif(not reference_oracle.available(),
                    reason="reference mount not present")
def test_reference_config_loaders():
    from parrot_tts_tpu.core.config import (
        TTEModelConfig,
        TTETrainConfig,
        VocoderModelConfig,
        VocoderTrainConfig,
        load_reference_tte_yaml,
        load_reference_vocoder_json,
    )

    y = load_reference_tte_yaml("/root/reference/utils/TTE/TTE_config.yaml")
    m = TTEModelConfig.from_reference_yaml(y, vocab_size=50, n_speaker=10)
    assert m.d_model == 256 and m.max_len == 3500
    assert m.conv_kernel_sizes == (9, 1) and m.hubert_codes == 1000
    t = TTETrainConfig.from_reference_yaml(y)
    assert t.warmup_steps == 2000 and t.batch_size == 6 and t.grad_acc_steps == 4

    h = load_reference_vocoder_json("/root/reference/utils/vocoder/config.json")
    vm = VocoderModelConfig.from_reference_json(h)
    assert vm.upsample_rates == (5, 4, 4, 2, 2)
    assert vm.total_upsample == 320 and vm.model_in_dim == 256
    vt = VocoderTrainConfig.from_reference_json(h)
    assert vt.segment_size == 8960 and vt.adam_b1 == 0.8


def test_collate_beam_durations_shorter_than_tokens():
    """extract-durations --method beam can emit fewer durations than tokens
    (the best path may never visit trailing tokens); collate zero-pads the
    tail like the reference's pad_sequence instead of raising (ADVICE r4)."""
    from parrot_tts_tpu.data.tte_data import TTESample, collate

    s = TTESample(
        id="x", speaker=0,
        phones=np.arange(6, dtype=np.int32),
        codes=np.arange(9, dtype=np.int32),
        duration=np.array([2, 3, 4], np.int32),  # 3 durations for 6 tokens
    )
    batch = collate([s], src_len=8, tgt_len=12, src_pad_idx=0,
                    code_pad_idx=20)
    np.testing.assert_array_equal(
        batch["duration"][0], np.array([2, 3, 4, 0, 0, 0, 0, 0], np.int32))


def test_vocoder_loader_with_f0(tmp_path, rng):
    """with_f0=True attaches a (B, 1, Tc) code-rate pitch track — the
    functional form of the reference's dormant f0 path (dataset.py:25-41)."""
    from parrot_tts_tpu.data.vocoder_data import VocoderDataset, VocoderLoader

    hop, seg, sr = 320, 3200, 16000
    entries = []
    t = np.arange(12800) / sr
    for i, f in enumerate([140.0, 260.0]):
        wav = (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        p = tmp_path / f"en_f_{i:03d}.wav"
        audio_io.write_wav(p, wav, sr)
        codes = rng.integers(0, 50, size=len(wav) // hop)
        entries.append({"audio": str(p),
                        "hubert": " ".join(map(str, codes))})
    write_manifest(tmp_path / "train.txt", entries)
    ds = VocoderDataset(tmp_path / "train.txt", segment_size=seg,
                        code_hop_size=hop, multispkr="_")

    (batch,) = VocoderLoader(ds, 2, seed=3, with_f0=True).batches(epoch=0)
    assert batch["f0"].shape == (2, 1, seg // hop)
    assert batch["f0"].dtype == np.float32
    # each clip is a pure tone: voiced code frames should sit near its f0
    expect = {f"en_f_{i:03d}.wav": f for i, f in enumerate([140.0, 260.0])}
    for bi, fname in enumerate(batch["filenames"]):
        f = expect[fname.rsplit("/", 1)[-1]]
        v = batch["f0"][bi, 0]
        v = v[v > 0]
        assert v.size > 0 and abs(np.median(v) - f) / f < 0.05
