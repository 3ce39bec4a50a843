"""Mesh/sharding layer over the 8-device CPU mesh, and multi-host loader
schedule consistency."""

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from parrot_tts_tpu.core import mesh as meshlib


def test_create_mesh_dp():
    mesh = meshlib.create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}


def test_create_mesh_dp_mp():
    mesh = meshlib.create_mesh(model_parallel_size=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_shard_batch_places_batch_axis(rng):
    mesh = meshlib.create_mesh()
    batch = {"x": rng.standard_normal((16, 5)).astype(np.float32),
             "y": rng.integers(0, 3, size=(16,))}
    out = meshlib.shard_batch(mesh, batch)
    assert out["x"].sharding.spec == P("data", None)
    # each device holds 2 rows
    assert out["x"].addressable_shards[0].data.shape == (2, 5)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


def test_local_batch_size():
    mesh = meshlib.create_mesh()
    assert meshlib.local_batch_size(16, mesh) == 2
    try:
        meshlib.local_batch_size(10, mesh)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_tensor_parallel_forward_matches_replicated(rng):
    """Model-axis TP rules: params actually partition, and the TP forward
    equals the replicated forward (XLA derives the collectives)."""
    from parrot_tts_tpu.core.config import (TTEModelConfig,
                                            TransformerStackConfig)
    from parrot_tts_tpu.models.tte import parrot
    from parrot_tts_tpu.parallel import partition_specs, shard_params_tp

    cfg = TTEModelConfig(
        d_model=16, conv_n_filter=32, conv_kernel_sizes=(9, 1), max_len=64,
        encoder=TransformerStackConfig(n_layer=2, n_head=2),
        decoder=TransformerStackConfig(n_layer=2, n_head=2),
        dur_n_filter=8, dur_kernel_size=3, hubert_codes=24, n_speaker=4,
        vocab_size=12, pad_idx=0)
    params = parrot.init_parrot(jax.random.key(0), cfg)
    specs = partition_specs(params)
    # the rules hit the big tensors...
    assert specs["head"]["w"] == P(None, "model")
    assert specs["encoder_layers"][0]["attn"]["qkv"] == P(None, "model")
    assert specs["encoder_layers"][1]["conv1"]["w"] == P(None, None, "model")
    # ...and default-replicate the rest
    assert specs["tok_emb"] == P()
    assert specs["encoder_layers"][0]["attn_norm"]["scale"] == P()

    b, s, t = 4, 8, 16
    durs = rng.integers(1, 3, size=(b, s)).astype(np.int32)
    batch = {
        "phones": rng.integers(2, cfg.vocab_size, size=(b, s)).astype(np.int32),
        "duration": durs,
        "src_mask": np.ones((b, s), bool),
        "tgt_mask": np.arange(t)[None, :] < durs.sum(axis=1)[:, None],
        "speaker": rng.integers(0, cfg.n_speaker, size=(b,)).astype(np.int32),
    }

    def fwd(p, bt):
        logits, _, log_dur = parrot.apply_parrot(
            p, bt, cfg, out_len=t, inference=False, deterministic=True)
        return logits, log_dur

    ref_logits, ref_dur = jax.jit(fwd)(params, batch)

    mesh = meshlib.create_mesh(model_parallel_size=2)
    tp_params = shard_params_tp(mesh, params)
    head_shard = tp_params["head"]["w"].addressable_shards[0].data
    assert head_shard.shape == (cfg.d_model, cfg.hubert_codes // 2)
    tp_batch = meshlib.shard_batch(mesh, batch)
    tp_logits, tp_dur = jax.jit(fwd)(tp_params, tp_batch)
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tp_dur), np.asarray(ref_dur),
                               atol=2e-5, rtol=1e-5)


def test_multihost_loader_slices_consistent(tmp_path, rng):
    """All 'hosts' derive the same schedule; their slices tile the global
    batch."""
    import json

    from parrot_tts_tpu.data.manifest import write_manifest
    from parrot_tts_tpu.data.tte_data import BucketedLoader, TTEDataset
    from parrot_tts_tpu.text.tokenizer import save_symbols

    align = tmp_path / "aligner"
    align.mkdir()
    save_symbols(align / "symbols.json", [" ", "a", "b"])
    root = tmp_path / "tte"
    root.mkdir()
    (root / "speakers.json").write_text(json.dumps({"en_f": 0}))
    entries = []
    for i in range(9):
        n = int(rng.integers(3, 8))
        durs = rng.integers(1, 3, size=n)
        entries.append({
            "audio": f"/x/en_f_{i}.wav",
            "characters": " ".join(rng.choice(["a", "b", "sil"], size=n)),
            "hubert": " ".join(map(str, rng.integers(0, 9, size=durs.sum()))),
            "duration": " ".join(map(str, durs)),
            "speaker": "en_f",
        })
    write_manifest(root / "train.txt", entries)
    ds = TTEDataset(root, align, "train", hubert_codes=9)

    def host_batches(pi, pc):
        loader = BucketedLoader(ds, 4, (8,), (16,), seed=7,
                                process_index=pi, process_count=pc)
        return list(loader.batches(epoch=3))

    h0, h1 = host_batches(0, 2), host_batches(1, 2)
    full = host_batches(0, 1)
    assert len(h0) == len(h1) == len(full)
    for b0, b1, bf in zip(h0, h1, full):
        assert b0["phones"].shape == (2, 8)
        combined = np.concatenate([b0["phones"], b1["phones"]], axis=0)
        np.testing.assert_array_equal(combined, bf["phones"])
