"""Aligner parity (conv+BiLSTM CTC model vs reference torch oracle), CTC loss
vs torch.nn.CTCLoss, and duration extraction vs the reference's dijkstra."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import AlignerModelConfig
from parrot_tts_tpu.models.aligner import model as amodel
from parrot_tts_tpu.ops import ctc as ctc_ops
from parrot_tts_tpu.ops import monotonic_align as ma

from tests import reference_oracle

reference_oracle.add_reference_paths()


def test_lstm_matches_torch(rng):
    b, t, din, h = 2, 9, 6, 8
    x = rng.standard_normal((b, t, din)).astype(np.float32)
    torch.manual_seed(0)
    ref = torch.nn.LSTM(din, h, batch_first=True, bidirectional=True)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))

    sd = ref.state_dict()
    fw = {"w_ih": jnp.asarray(sd["weight_ih_l0"].numpy().T),
          "w_hh": jnp.asarray(sd["weight_hh_l0"].numpy().T),
          "b": jnp.asarray((sd["bias_ih_l0"] + sd["bias_hh_l0"]).numpy())}
    bw = {"w_ih": jnp.asarray(sd["weight_ih_l0_reverse"].numpy().T),
          "w_hh": jnp.asarray(sd["weight_hh_l0_reverse"].numpy().T),
          "b": jnp.asarray((sd["bias_ih_l0_reverse"]
                            + sd["bias_hh_l0_reverse"]).numpy())}
    got = np.concatenate([
        np.asarray(amodel.lstm(jnp.asarray(x), fw)),
        np.asarray(amodel.lstm(jnp.asarray(x), bw, reverse=True))], axis=-1)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5, rtol=1e-4)


@pytest.mark.skipif(not reference_oracle.available(),
                    reason="reference mount not present")
def test_aligner_forward_matches_reference(rng):
    from model import Aligner  # /root/reference/utils/aligner/model.py

    torch.manual_seed(1)
    ref = Aligner(n_mels=10, num_symbols=7, lstm_dim=12, conv_dim=8).eval()
    params, state = amodel.params_from_torch(ref.state_dict())

    x = rng.standard_normal((2, 15, 10)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got, _ = amodel.apply_aligner(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_batch_norm_train_updates_running_stats(rng):
    cfg = AlignerModelConfig(n_mels=4, conv_dim=6, lstm_dim=5, num_symbols=8)
    params, state = amodel.init_aligner(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((2, 12, 4)).astype(np.float32))
    _, new_state = amodel.apply_aligner(params, state, x, train=True)
    assert not np.allclose(np.asarray(new_state["bns"][0].mean),
                           np.asarray(state["bns"][0].mean))


def test_ctc_loss_matches_torch(rng):
    b, t, v, l = 3, 20, 9, 6
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = rng.integers(1, v, size=(b, l)).astype(np.int32)
    logit_lens = np.asarray([20, 17, 15], np.int32)
    label_lens = np.asarray([6, 4, 5], np.int32)

    want = torch.nn.CTCLoss(blank=0)(
        torch.from_numpy(logits).log_softmax(-1).transpose(0, 1),
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(logit_lens.astype(np.int64)),
        torch.from_numpy(label_lens.astype(np.int64)))

    got = ctc_ops.ctc_loss_torch_mean(
        jnp.asarray(logits), jnp.asarray(logit_lens), jnp.asarray(labels),
        jnp.asarray(label_lens))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


@pytest.mark.skipif(not reference_oracle.available(),
                    reason="reference mount not present")
@pytest.mark.parametrize("use_native", [True, False])
def test_duration_extraction_matches_reference_dijkstra(rng, use_native):
    from duration_extraction import extract_durations_with_dijkstra

    for _ in range(5):
        m, n, v = int(rng.integers(20, 60)), int(rng.integers(5, 15)), 20
        post = rng.random((m, v)).astype(np.float32)
        post = post / post.sum(axis=1, keepdims=True)
        tokens = rng.integers(0, v, size=n)

        want = extract_durations_with_dijkstra(tokens, post)
        got = ma.extract_durations(tokens, post, use_native=use_native)
        assert got.sum() == m
        np.testing.assert_array_equal(got, want)


def test_native_and_numpy_agree(rng):
    m, n, v = 40, 8, 15
    post = rng.random((m, v)).astype(np.float32)
    tokens = rng.integers(0, v, size=n)
    a = ma.extract_durations(tokens, post, use_native=True)
    b = ma.extract_durations(tokens, post, use_native=False)
    np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not reference_oracle.available(),
                    reason="reference mount not present")
def test_beam_extraction_matches_reference(rng):
    from duration_extraction import extract_durations_beam as ref_beam

    for trial in range(8):
        m, n, v = int(rng.integers(15, 50)), int(rng.integers(4, 12)), 20
        post = rng.random((m, v)).astype(np.float32)
        post = post / post.sum(axis=1, keepdims=True)
        tokens = rng.integers(0, v, size=n)

        want_durs, want_seqs = ref_beam(tokens, post, 10)
        got_durs, (got_paths, got_scores) = ma.extract_durations_beam(
            tokens, post, 10)
        assert len(got_durs) == len(want_durs)
        for w, g in zip(want_durs, got_durs):
            np.testing.assert_array_equal(g, w)
        for (w_seq, w_score), g_path, g_score in zip(
                want_seqs, got_paths, got_scores):
            np.testing.assert_array_equal(g_path, np.asarray(w_seq))
            assert (np.isinf(w_score) and np.isinf(g_score)) or \
                abs(float(w_score) - float(g_score)) < 1e-5


def test_beam_short_sequence_edge(rng):
    # M < N: path can never reach the last tokens; bincount is shorter than
    # len(tokens) (reference behavior, duration_extraction.py:106-108)
    m, n, v = 4, 9, 12
    post = rng.random((m, v)).astype(np.float32)
    tokens = rng.integers(0, v, size=n)
    durs, (paths, scores) = ma.extract_durations_beam(tokens, post, 10)
    assert durs[0].sum() == m
    assert len(durs[0]) <= m  # at most one advance per row after the first
    assert np.isfinite(scores[0])
