"""HuBERT unit-extraction parity tests.

Oracle: `transformers.HubertModel` (torch CPU) — architecturally identical to
the fairseq mHuBERT base the reference loads
(`/root/reference/utils/hubert_extraction/hubert_api.py:16-31`); fairseq
`extract_features(output_layer=N)` == HF `hidden_states[N]`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import HubertConfig
from parrot_tts_tpu.models.hubert import model as hub
from parrot_tts_tpu.models.hubert.convert import (
    config_from_state_dict,
    load_kmeans_centers,
    params_from_state_dict,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


TINY = dict(
    conv_dim=(24, 24, 24), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
    d_model=32, n_layer=3, n_head=4, ffn_dim=64,
    pos_conv_kernel=16, pos_conv_groups=2,
)


def _tiny_hf(feat_extract_norm="group", conv_bias=False, seed=0):
    torch.manual_seed(seed)
    hf_cfg = transformers.HubertConfig(
        vocab_size=10,
        conv_dim=list(TINY["conv_dim"]), conv_kernel=list(TINY["conv_kernel"]),
        conv_stride=list(TINY["conv_stride"]), conv_bias=conv_bias,
        feat_extract_norm=feat_extract_norm,
        hidden_size=TINY["d_model"], num_hidden_layers=TINY["n_layer"],
        num_attention_heads=TINY["n_head"],
        intermediate_size=TINY["ffn_dim"],
        num_conv_pos_embeddings=TINY["pos_conv_kernel"],
        num_conv_pos_embedding_groups=TINY["pos_conv_groups"],
        do_stable_layer_norm=False, hidden_act="gelu",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, apply_spec_augment=False,
    )
    m = transformers.HubertModel(hf_cfg).eval()
    return m


def _our_cfg(feat_extract_norm="group", conv_bias=False, **kw):
    base = dict(TINY)
    base.update(conv_bias=conv_bias, feat_extract_norm=feat_extract_norm,
                output_layer=TINY["n_layer"], max_chunk=100_000)
    base.update(kw)
    return HubertConfig(**base)


def _hf_layer_feats(m, wav_np, layer):
    with torch.no_grad():
        out = m(torch.from_numpy(wav_np[None, :]),
                output_hidden_states=True)
    return out.hidden_states[layer][0].numpy()


@pytest.mark.parametrize("norm_mode,conv_bias",
                         [("group", False), ("layer", True)])
def test_hubert_matches_transformers(rng, norm_mode, conv_bias):
    m = _tiny_hf(norm_mode, conv_bias)
    cfg = _our_cfg(norm_mode, conv_bias)
    params = params_from_state_dict(m.state_dict(), cfg)

    n = 2000
    wav = rng.standard_normal(n).astype(np.float32) * 0.1
    for layer in (1, cfg.n_layer):
        ref = _hf_layer_feats(m, wav, layer)
        ours, n_frames = hub.apply_hubert(
            params, jnp.asarray(wav[None, :]), jnp.asarray([n]), cfg,
            output_layer=layer)
        nf = int(n_frames[0])
        assert nf == ref.shape[0]
        np.testing.assert_allclose(np.asarray(ours[0, :nf]), ref,
                                   rtol=1e-4, atol=1e-4)


def test_padded_bucket_extraction_matches_exact_length(rng):
    """Masked batched extraction == per-utterance exact-shape extraction
    (group norm + pos conv + attention masking are exact, not approximate)."""
    cfg = _our_cfg("group")
    params = hub.init_hubert(jax.random.key(0), cfg)

    lens = [1603, 2000, 2777]
    bucket = 3200
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lens]
    batch = np.zeros((len(wavs), bucket), np.float32)
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
    feats_b, n_frames = hub.apply_hubert(
        params, jnp.asarray(batch), jnp.asarray(lens, np.int32), cfg)
    for i, w in enumerate(wavs):
        feats_1, nf_1 = hub.apply_hubert(
            params, jnp.asarray(w[None, :]), jnp.asarray([len(w)]), cfg)
        nf = int(n_frames[i])
        assert nf == int(nf_1[0]) == hub.feat_extract_output_length(cfg, len(w))
        np.testing.assert_allclose(
            np.asarray(feats_b[i, :nf]), np.asarray(feats_1[0, :nf]),
            rtol=2e-5, atol=2e-5)


def test_wav_layer_norm_matches_torch(rng):
    import torch.nn.functional as F

    n, bucket = 1234, 2048
    wav = rng.standard_normal(n).astype(np.float32)
    ref = F.layer_norm(torch.from_numpy(wav), wav.shape).numpy()
    padded = np.zeros((1, bucket), np.float32)
    padded[0, :n] = wav
    ours = hub.masked_wav_layer_norm(jnp.asarray(padded),
                                     jnp.asarray([n], np.int32))
    np.testing.assert_allclose(np.asarray(ours[0, :n]), ref,
                               rtol=1e-5, atol=1e-5)


def test_kmeans_predict_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn")
    from sklearn.cluster import KMeans

    x = rng.standard_normal((500, 16)).astype(np.float32)
    km = KMeans(n_clusters=20, n_init=2, random_state=0).fit(x)
    ref = km.predict(x)
    ours = np.asarray(hub.kmeans_predict(jnp.asarray(x),
                                         jnp.asarray(km.cluster_centers_,
                                                     jnp.float32)))
    assert (ours == ref).mean() > 0.999  # fp-tie tolerance


def test_kmeans_loader_roundtrip(tmp_path, rng):
    centers = rng.standard_normal((7, 5)).astype(np.float32)
    np.save(tmp_path / "c.npy", centers)
    np.testing.assert_array_equal(load_kmeans_centers(tmp_path / "c.npy"),
                                  centers)
    joblib = pytest.importorskip("joblib")
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=3, n_init=1, random_state=0).fit(
        rng.standard_normal((30, 5)))
    joblib.dump(km, tmp_path / "km.bin")
    got = load_kmeans_centers(tmp_path / "km.bin")
    np.testing.assert_allclose(got, km.cluster_centers_.astype(np.float32))


def test_config_inferred_from_state_dict():
    m = _tiny_hf("group", False)
    cfg = config_from_state_dict(m.state_dict())
    assert cfg.conv_dim == TINY["conv_dim"]
    assert cfg.conv_kernel == TINY["conv_kernel"]
    assert cfg.d_model == TINY["d_model"]
    assert cfg.n_layer == TINY["n_layer"]
    assert cfg.ffn_dim == TINY["ffn_dim"]
    assert cfg.pos_conv_kernel == TINY["pos_conv_kernel"]
    assert cfg.pos_conv_groups == TINY["pos_conv_groups"]
    assert cfg.feat_extract_norm == "group"
    assert not cfg.conv_bias


def test_fairseq_key_scheme_converts():
    """fairseq-style names (self_attn, fc1/fc2, post_extract_proj,
    pos_conv.0) map onto the same pytree as HF names."""
    m = _tiny_hf("group", False)
    sd = m.state_dict()
    fs = {}
    for k, v in sd.items():
        k2 = (k.replace(".attention.", ".self_attn.")
               .replace(".feed_forward.intermediate_dense.", ".fc1.")
               .replace(".feed_forward.output_dense.", ".fc2.")
               .replace("feature_projection.projection.", "post_extract_proj.")
               .replace("feature_projection.layer_norm.", "layer_norm.")
               .replace("encoder.pos_conv_embed.conv.", "encoder.pos_conv.0."))
        if ".layer_norm." in k2 and ".layers." in k2 and "final" not in k2:
            k2 = k2.replace(".layer_norm.", ".self_attn_layer_norm.")
        if k2.startswith("feature_extractor.conv_layers."):
            parts = k2.split(".")
            parts[3] = {"conv": "0", "layer_norm": "2"}[parts[3]]
            k2 = ".".join(parts)
        fs[k2] = v
    cfg = _our_cfg("group")
    p_hf = params_from_state_dict(sd, cfg)
    p_fs = params_from_state_dict(fs, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(p_hf),
                    jax.tree_util.tree_leaves(p_fs)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unit_extractor_end_to_end(tmp_path, rng):
    """extract-units over a tiny corpus: manifest format byte-compatible with
    the reference's hubert.txt (dict lines, space-joined codes, duration)."""
    from parrot_tts_tpu.data.audio_io import write_wav
    from parrot_tts_tpu.data.manifest import read_manifest
    from parrot_tts_tpu.infer.unit_extractor import UnitExtractor
    from parrot_tts_tpu.pipeline.extract_units import extract_units_corpus

    m = _tiny_hf("group", False)
    cfg = _our_cfg("group")
    params = params_from_state_dict(m.state_dict(), cfg)
    centers = rng.standard_normal((12, cfg.d_model)).astype(np.float32)

    sr = cfg.sample_rate
    lens = [1800, 2400, 5000]
    for spk, n in zip(("en_f", "en_f", "hi_m"), lens):
        d = tmp_path / spk / "wavs"
        d.mkdir(parents=True, exist_ok=True)
        wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
        write_wav(d / f"{spk}_{n}.wav", wav, sr)

    extractor = UnitExtractor(params, cfg, centers,
                              buckets=(2000, 4000, 6000), batch_size=2)
    entries = extract_units_corpus(extractor, tmp_path, tmp_path / "out")
    assert len(entries) == 3
    got = read_manifest(tmp_path / "out" / "hubert.txt")
    for e in got:
        codes = [int(c) for c in e["hubert"].split()]
        n_samples = int(round(e["duration"] * sr))
        assert len(codes) == hub.feat_extract_output_length(cfg, n_samples)
        assert all(0 <= c < 12 for c in codes)

    # batched-bucketed codes == the reference's one-at-a-time HF pipeline
    e0 = got[0]
    wav, _ = __import__("parrot_tts_tpu.data.audio_io",
                        fromlist=["read_wav"]).read_wav(e0["audio"])
    feats = _hf_layer_feats(m, wav.astype(np.float32), cfg.output_layer)
    d2 = ((feats[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    ref_codes = d2.argmin(-1)
    assert [int(c) for c in e0["hubert"].split()] == list(ref_codes)


def test_codes_for_wavs_defer_readback_matches_streaming(rng):
    """defer_readback=True (one bulk drain per corpus shard) returns the
    same codes in the same order as the streaming pipeline."""
    from parrot_tts_tpu.infer.unit_extractor import UnitExtractor

    m = _tiny_hf("group", False)
    cfg = _our_cfg("group")
    params = params_from_state_dict(m.state_dict(), cfg)
    centers = rng.standard_normal((12, cfg.d_model)).astype(np.float32)
    ex = UnitExtractor(params, cfg, centers,
                       buckets=(2000, 4000, 6000), batch_size=2)
    wavs = [(rng.standard_normal(n) * 0.1).astype(np.float32)
            for n in (1800, 2400, 5000, 1500, 3900)]
    base = ex.codes_for_wavs(wavs)
    for upload_thread in (True, False):
        got = ex.codes_for_wavs(wavs, upload_thread=upload_thread,
                                defer_readback=True)
        assert len(got) == len(base)
        for a, b in zip(got, base):
            np.testing.assert_array_equal(a, b)
