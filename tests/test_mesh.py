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
