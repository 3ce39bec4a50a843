"""Orbax checkpoint layer: save/restore roundtrips for all three train
states, latest-step scan (the reference's g_???????? glob analog)."""

import numpy as np

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.checkpoint import (
    CheckpointManager,
    load_params,
    save_params,
)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_manager_roundtrip(tmp_path):
    from parrot_tts_tpu.core.config import (TTEModelConfig, TTETrainConfig,
                                            TransformerStackConfig)
    from parrot_tts_tpu.train import tte as tte_train

    cfg = TTEModelConfig(
        d_model=8, conv_n_filter=16, conv_kernel_sizes=(3, 1), max_len=32,
        encoder=TransformerStackConfig(n_layer=1, n_head=2),
        decoder=TransformerStackConfig(n_layer=1, n_head=2),
        dur_n_filter=4, dur_kernel_size=3, hubert_codes=10, n_speaker=2,
        vocab_size=6)
    state = tte_train.init_state(jax.random.key(0), cfg, TTETrainConfig())

    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(100, jax.device_get(state), wait=True)
    mgr.save(200, jax.device_get(state), wait=True)
    assert mgr.latest_step() == 200

    restored = mgr.restore(step=100, template=jax.device_get(state))
    _tree_equal(restored.params, state.params)
    mgr.close()


def test_manager_metadata_roundtrip(tmp_path):
    """Val-loss metadata rides along with the save and is surfaced by
    restore(with_metadata=True) (reference embeds step+val_loss in the
    Lightning ckpt name, train.py:144-151)."""
    state = {"w": jnp.arange(4.0)}
    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(7, jax.device_get(state),
             metadata={"step": 7, "val_total_loss": 1.25}, wait=True)
    restored, meta = mgr.restore(template=jax.device_get(state),
                                 with_metadata=True)
    _tree_equal(restored, state)
    assert meta == {"step": 7, "val_total_loss": 1.25}
    # saves without metadata surface None, not an error
    mgr.save(8, jax.device_get(state), wait=True)
    _, meta2 = mgr.restore(step=8, template=jax.device_get(state),
                           with_metadata=True)
    assert meta2 is None
    mgr.close()


def test_csv_logger_appends(tmp_path):
    """Steady-state logging appends; widening the field set rewrites once
    with the new header (core/metrics.py CsvLogger)."""
    from parrot_tts_tpu.core.metrics import CsvLogger

    lg = CsvLogger(tmp_path)
    lg.log(1, loss=1.0)
    lg.log(2, loss=0.5)
    sizes = [lg.path.stat().st_size]
    lg.log(3, loss=0.25)
    sizes.append(lg.path.stat().st_size)
    assert sizes[1] > sizes[0]  # grew by appending
    lg.log(4, loss=0.2, extra=9.0)  # widen -> rewrite with both columns
    import csv as csvmod

    rows = list(csvmod.DictReader(open(lg.path)))
    assert len(rows) == 4
    assert rows[0]["loss"] == "1.0" and rows[3]["extra"] == "9.0"


def test_plain_params_roundtrip(tmp_path):
    params = {"a": jnp.arange(6.0).reshape(2, 3),
              "nested": [{"w": jnp.ones((4,))}, {"w": jnp.zeros((2,))}]}
    save_params(tmp_path / "p", jax.device_get(params))
    out = load_params(tmp_path / "p", jax.device_get(params))
    _tree_equal(out, params)


def test_vocoder_state_roundtrip(tmp_path):
    from parrot_tts_tpu.core.config import (VocoderModelConfig,
                                            VocoderTrainConfig)
    from parrot_tts_tpu.train import vocoder as voc_train

    mcfg = VocoderModelConfig(
        resblock="1", upsample_rates=(4,), upsample_kernel_sizes=(8,),
        upsample_initial_channel=8, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1,),), num_embeddings=10, embedding_dim=4,
        model_in_dim=8, multispkr="_", num_speakers=2)
    state = voc_train.init_state(jax.random.key(0), mcfg,
                                 VocoderTrainConfig(), steps_per_epoch=5)
    mgr = CheckpointManager(tmp_path / "v")
    mgr.save(1, jax.device_get(state), wait=True)
    restored = mgr.restore(template=jax.device_get(state))
    _tree_equal(restored.gen_params, state.gen_params)
    _tree_equal(restored.msd_params, state.msd_params)
    mgr.close()
